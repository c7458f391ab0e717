"""Identity-H CID→Unicode fallback tables (SURVEY.md §2 F11).

Semantic parity with the reference's CIDTables cascade
(``PdfToText.php:7685–7925``): a CID-keyed font (``/Encoding
/Identity-H``) with no usable /ToUnicode CMap exposes raw glyph ids as
character codes, so text recovery needs an external CID→Unicode table.
The reference ships per-font-variant ``.cid`` override files plus a
default ``IDENTITY-H.cid`` and resolves them most-specific-first
(``__get_cid_file``, 7794–7840); unmapped CIDs decode to ``''`` and
CIDs 0/1 act as accent-prefix markers consulting an ``alt`` sub-table
(7860–7901).

We reproduce the *mechanism* — variant-cascade lookup → default table
→ drop — with public data only (the reference's ``.cid`` files are NOT
copied): the default table is the Microsoft-core-TrueType standard
glyph order, where glyph 3 is space and the printable Latin block is
contiguous, i.e. ``gid = codepoint − 29`` for U+0020..U+007E. This is
the same public layout the ``/gNN → chr(NN + 29)`` glyph-name quirk
relies on (:mod:`pdftotext_spark.core.glyphs`), and it matches the
subset-embedded fonts produced by Word/PrimoPDF-class generators.
Documented divergence: the reference's default file marks gids 6/7
(``#``/``$``) unknown for its sample fonts; the clean offset rule maps
them.

Per-font overrides register at runtime via :func:`register_cid_map`
(the analog of dropping an ``IDENTITY-H-<variant>.cid`` file next to
the reference library).
"""

from __future__ import annotations

from dataclasses import dataclass, field

GID_OFFSET = 29  # MS-core-font standard order: gid 3 = U+0020


@dataclass(frozen=True)
class CIDMap:
    """One CID→Unicode table: ``plain`` direct mappings plus optional
    ``alt`` accent tables keyed by a prefix CID (reference ALT_CID
    semantics: the prefix emits nothing and re-routes the *next* CID
    through its sub-table)."""

    plain: dict[int, str]
    alt: dict[int, dict[int, str]] = field(default_factory=dict)

    def lookup(self, code: int) -> str:
        return self.plain.get(code, "")


def default_identity_h() -> CIDMap:
    """gid = codepoint − 29 over the printable ASCII block."""
    return CIDMap(
        plain={cp - GID_OFFSET: chr(cp) for cp in range(0x20, 0x7F)}
    )


_DEFAULT = default_identity_h()
_REGISTRY: dict[str, CIDMap] = {}


def register_cid_map(
    variant: str,
    plain: dict[int, str],
    alt: dict[int, dict[int, str]] | None = None,
) -> None:
    """Register a per-font-variant override table (e.g. for
    ``ABCDEE+Arial`` register variant ``ABCDEE+Arial``, ``ABCDEE`` or
    any cascade prefix)."""
    _REGISTRY[variant.upper()] = CIDMap(plain=dict(plain), alt=dict(alt or {}))


def clear_registry() -> None:
    _REGISTRY.clear()


def variant_candidates(font_variant: str) -> list[str]:
    """Most-specific-first candidate names, mirroring the reference's
    filename cascade (``PdfToText.php:7794–7840``): for
    ``ABCD+Italic-Arial`` try ``ABCD+Italic-Arial``, ``ABCD+Italic``,
    ``ABCD`` — i.e. progressively drop trailing ``-``/``+`` segments."""
    import re

    if not font_variant:
        return []
    parts = re.split(r"([+-])", font_variant)
    # parts = [seg, sep, seg, sep, seg...]; rebuild prefixes
    out = []
    for end in range(len(parts), 0, -2):
        cand = "".join(parts[:end])
        if cand:
            out.append(cand)
    return out


def build_override_map(
    tables: tuple | list,
) -> dict[str, CIDMap]:
    """Materialize ``ExtractOptions.cid_tables`` entries
    ``(variant, plain, alt)`` into a per-call override dict. Scoped to
    the calling document — never touches the module registry, so
    driver-supplied tables cannot leak between payloads sharing a
    reused executor worker."""
    return {
        variant.upper(): CIDMap(plain=dict(plain), alt=dict(alt or {}))
        for variant, plain, alt in tables
    }


def lookup_cid_map(
    font_variant: str | None,
    overrides: dict[str, CIDMap] | None = None,
    ordering: str | None = None,
) -> CIDMap:
    """Resolve the table for a font: first per-call ``overrides``
    cascade candidate on the /BaseFont name, then the process
    registry, then the font's /CIDSystemInfo ``ordering`` table (e.g.
    Adobe-Japan1, :mod:`pdftotext_spark.core.cjk_cid`), else the
    default MS-standard-order table."""
    if font_variant:
        for cand in variant_candidates(font_variant):
            key = cand.upper()
            if overrides:
                hit = overrides.get(key)
                if hit is not None:
                    return hit
            hit = _REGISTRY.get(key)
            if hit is not None:
                return hit
    if ordering:
        from pdftotext_spark.core.cjk_cid import lookup_ordering_map

        hit = lookup_ordering_map(ordering)
        if hit is not None:
            return hit
    return _DEFAULT
