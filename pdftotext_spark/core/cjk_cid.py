"""Adobe-Japan1 CID→Unicode ordering table (SURVEY.md §2 F11, CJK).

A CJK subset-embedded Identity-H font with no usable /ToUnicode names
glyphs by CID in its character collection's *registered ordering* —
for Japanese fonts, Adobe-Japan1.  The reference covers Identity-H
fallback only through its Latin ``.cid`` drop-in files
(``PdfToText.php:7794–7840``; its CIDTables/ directory ships no CJK
data), so CJK text silently degrades there.  We go further and derive
the Japan1 ordering from **public data only**:

* **JIS X 0208 → Unicode** comes from Python's stdlib ``euc_jp``
  codec (the authoritative kuten layout: row 1 punctuation, row 3
  full-width alphanumerics, row 4 hiragana, row 5 katakana, rows 6–7
  Greek/Cyrillic, rows 16–47 level-1 kanji, rows 48–84 level-2 kanji).
* **JIS → CID** comes from the range bases of Adobe's public ``H`` /
  ``UniJIS-UCS2-H`` CMaps (Adobe CMap resources, BSD-licensed):
  CIDs are assigned contiguously across the *assigned* JIS positions —
  633 (row 1) … 780/790/816 (row 3 digits/upper/lower), 842 hiragana,
  925 katakana, 1011/1035 Greek, 1059/1092 Cyrillic, 1125 level-1
  kanji (94 per row), 4090 level-2 kanji.  Well-known anchors pin the
  arithmetic: CID 633 = U+3000, CID 843 = あ, CID 925 = ァ,
  CID 1125 = 亜, CID 4089 = 腕 (level-1 count 2965), CID 7479 = the
  last level-2 kanji (count 3390).
* **Proportional Latin** (CIDs 1–98): CID = cp − 0x1F for
  U+0020–U+007E with the JIS-Roman swaps from ``UniJIS-UCS2-H``:
  position 0x5C is ¥ (CID 61) and 0x7E is overline (CID 95); ASCII
  backslash and tilde take the supplemental CIDs 97 and 96.

The table is a *subset* (≈6,900 CIDs) of Adobe-Japan1-7 (~23,060):
it covers the full JIS X 0208 repertoire — the overwhelming majority
of real Japanese documents — and omits rotated/vertical, annotated,
half-width and JIS X 0213 extension glyphs; unmapped CIDs still
degrade to ``''`` (reference UNKNOWN_CID semantics).
"""

from __future__ import annotations

from functools import lru_cache

from pdftotext_spark.core.cidmaps import CIDMap

# (ku, ten_lo, ten_hi, cid_base) — the assigned-position spans of the
# public H CMap; CIDs run contiguously across spans (633…1124), which
# cross-checks every base against its predecessor's length.
_JISX0208_SPANS: list[tuple[int, int, int, int]] = [
    (1, 1, 94, 633),     # punctuation / full-width space
    (2, 1, 14, 727),     # geometric symbols
    (2, 26, 33, 741),    # set theory
    (2, 42, 48, 749),    # logic
    (2, 60, 74, 756),    # math operators
    (2, 82, 89, 771),    # units / typography
    (2, 94, 94, 779),    # large circle
    (3, 16, 25, 780),    # full-width digits
    (3, 33, 58, 790),    # full-width A–Z
    (3, 65, 90, 816),    # full-width a–z
    (4, 1, 83, 842),     # hiragana
    (5, 1, 86, 925),     # katakana
    (6, 1, 24, 1011),    # Greek upper
    (6, 33, 56, 1035),   # Greek lower
    (7, 1, 33, 1059),    # Cyrillic upper
    (7, 49, 81, 1092),   # Cyrillic lower
]
_KANJI_L1_BASE = 1125   # rows 16–47, 94/row, last row ends at ten 51
_KANJI_L2_BASE = 4090   # rows 48–84, 94/row, last row ends at ten 6


def _jis_to_unicode(ku: int, ten: int) -> str | None:
    """JIS X 0208 kuten → Unicode via the stdlib EUC-JP codec."""
    try:
        return bytes((0xA0 + ku, 0xA0 + ten)).decode("euc_jp")
    except UnicodeDecodeError:
        return None


def _latin_cids() -> dict[int, str]:
    """Adobe-Japan1 proportional Latin (CIDs 1–97): the JIS-Roman run
    with the UniJIS-UCS2-H swaps for ¥/overline vs backslash/tilde."""
    out: dict[int, str] = {}
    for cp in range(0x20, 0x7F):
        out[cp - 0x1F] = chr(cp)
    out[61] = "¥"   # JIS-Roman 0x5C = yen
    out[95] = "‾"   # JIS-Roman 0x7E = overline
    # supplemental pair, cross-checked against the public
    # UniJIS-UCS2-H cidranges — the CMap splits the ASCII run exactly
    # around them: <0020><005B>→1, <005C>→97, <005D><007D>→62,
    # <007E>→96 (pinned by hardcoded-CID test, not the reverse map)
    out[96] = "~"        # U+007E tilde
    out[97] = "\\"       # U+005C backslash
    return out


@lru_cache(maxsize=1)
def adobe_japan1_subset() -> CIDMap:
    """Build (once per process) the Japan1 CID→Unicode subset table."""
    plain = _latin_cids()
    for ku, lo, hi, base in _JISX0208_SPANS:
        for i, ten in enumerate(range(lo, hi + 1)):
            u = _jis_to_unicode(ku, ten)
            if u is not None:
                plain[base + i] = u
    for ku in range(16, 48):  # level-1 kanji
        hi = 51 if ku == 47 else 94
        row_base = _KANJI_L1_BASE + 94 * (ku - 16)
        for ten in range(1, hi + 1):
            u = _jis_to_unicode(ku, ten)
            if u is not None:
                plain[row_base + ten - 1] = u
    for ku in range(48, 85):  # level-2 kanji
        hi = 6 if ku == 84 else 94
        row_base = _KANJI_L2_BASE + 94 * (ku - 48)
        for ten in range(1, hi + 1):
            u = _jis_to_unicode(ku, ten)
            if u is not None:
                plain[row_base + ten - 1] = u
    return CIDMap(plain=plain)


@lru_cache(maxsize=1)
def adobe_japan1_reverse() -> dict[str, int]:
    """Unicode → CID (first win, i.e. lowest CID) — used by the PDF
    builder and tests to synthesize Japan1-ordered content streams."""
    rev: dict[str, int] = {}
    for cid, ch in sorted(adobe_japan1_subset().plain.items()):
        rev.setdefault(ch, cid)
    return rev


# registered ordering → table factory; lookup is case-insensitive on
# the /CIDSystemInfo /Ordering value ("Japan1", "Japan1-7", ...)
_ORDERING_FACTORIES = {
    "JAPAN1": adobe_japan1_subset,
}


def lookup_ordering_map(ordering: str | None) -> CIDMap | None:
    """Resolve a /CIDSystemInfo ordering name (e.g. ``Japan1``) to its
    CID table, tolerating supplement-suffixed forms (``Japan1-7``)."""
    if not ordering:
        return None
    key = ordering.upper()
    fac = _ORDERING_FACTORIES.get(key)
    if fac is None and "-" in key:
        fac = _ORDERING_FACTORIES.get(key.rsplit("-", 1)[0])
    return fac() if fac is not None else None
