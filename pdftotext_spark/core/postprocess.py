"""Post-processing string operators (SURVEY.md §2.8 X1–X4) and
metadata retrieval (§2.9 M1).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pdftotext_spark.core.objects import PdfObject
from pdftotext_spark.core.strings import text_string_to_unicode, unescape_literal

# X2: PDFOPT_NO_HYPHENATED_WORDS regex (PdfToText.php:1313–1320)
_HYPHEN_RE = re.compile(r"([A-Za-zÀ-ɏ]+)-\n([a-zà-ɏ]+)")


def dehyphenate(text: str) -> str:
    """Join ``word-\\ncontinuation`` across line breaks
    (PdfToText.php:1313–1320, applied at 2041–2042)."""
    return _HYPHEN_RE.sub(r"\1\2", text)


def page_offsets(pages: list[str], separator: str = "\n") -> list[tuple[int, int]]:
    """(start, end) char offsets of each page in the joined text
    (X3, PdfToText.php:2035–2047)."""
    offsets = []
    pos = 0
    for i, p in enumerate(pages):
        start = pos
        pos += len(p)
        offsets.append((start, pos - 1 if pos else 0))
        pos += len(separator)
    return offsets


# ------------------------------------------- unicode simplification (F13)

# The reference ships Maps/unicode-to-ansi.map: ligatures and
# typographic spaces/dashes/quotes simplified toward ASCII
# (PdfToText.php:220–245). Public equivalents (NFKC-adjacent, but
# pinned so output is stable across Python versions):
_SIMPLIFY_TABLE = {
    0xFB00: "ff", 0xFB01: "fi", 0xFB02: "fl", 0xFB03: "ffi", 0xFB04: "ffl",
    0x2018: "'", 0x2019: "'", 0x201A: "'", 0x201C: '"', 0x201D: '"',
    0x201E: '"', 0x2013: "-", 0x2014: "-", 0x2212: "-", 0x2026: "...",
    0x00A0: " ", 0x2002: " ", 0x2003: " ", 0x2009: " ", 0x202F: " ",
    0x2000: " ", 0x2001: " ", 0x2004: " ", 0x2005: " ", 0x2006: " ",
    0x2007: " ", 0x2008: " ", 0x200A: " ", 0x2022: "*", 0x00B7: "*",
}


def simplify_to_ansi(text: str) -> str:
    """Opt-in ligature/typographic simplification toward ASCII
    (F13 analog of ``Maps/unicode-to-ansi.map``)."""
    return text.translate(_SIMPLIFY_TABLE)


# ----------------------------------------------------------- RTL (X1)

_RTL_RE = re.compile(r"[֐-׿؀-ۿݐ-ݿיִ-﷿ﹰ-﻿]")
_RTL_RUN_RE = re.compile(
    r"[֐-׿؀-ۿݐ-ݿיִ-﷿ﹰ-﻿"
    r"\s.,;:!?()\[\]'\"-]+"
)


def rtl_reorder(text: str) -> str:
    """Reverse Hebrew/Arabic character runs per line, treating
    space/punct runs inside a RTL run as reversible separators
    (X1, PdfToText.php:5626–5808)."""
    if not _RTL_RE.search(text):
        return text
    out_lines = []
    for line in text.split("\n"):
        def flip(m: re.Match[str]) -> str:
            run = m.group(0)
            if not _RTL_RE.search(run):
                return run
            # keep boundary whitespace/punct in place; reverse the core
            prefix_len = len(run) - len(run.lstrip(" .,;:!?()[]'\"-"))
            suffix_len = len(run) - len(run.rstrip(" .,;:!?()[]'\"-"))
            core = run[prefix_len : len(run) - suffix_len]
            return run[:prefix_len] + core[::-1] + run[len(run) - suffix_len :]

        out_lines.append(_RTL_RUN_RE.sub(flip, line))
    return "\n".join(out_lines)


# ------------------------------------------------------- metadata (M1, X4)

_META_KEYS = (
    b"Author",
    b"Creator",
    b"Producer",
    b"Title",
    b"Subject",
    b"Keywords",
    b"CreationDate",
    b"ModDate",
)
_DATE_RE = re.compile(
    r"D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?"
)


def parse_pdf_date(value: str) -> str | None:
    """``D:YYYYMMDDHHmmSS…`` → ISO-8601 UTC string
    (``GetUTCDate``, PdfToText.php:496–507)."""
    m = _DATE_RE.match(value.strip())
    if not m:
        return None
    parts = [int(g) if g else d for g, d in zip(m.groups(), (0, 1, 1, 0, 0, 0))]
    try:
        dt = datetime(*parts, tzinfo=timezone.utc)
    except ValueError:
        return None
    return dt.isoformat()


_META_PEEK_RE = re.compile(
    rb"/(?:Author|Creator|Producer|Title|Subject|Keywords|CreationDate|ModDate)\b"
)


def has_author_information(body: bytes) -> bool:
    """Cheap peek (PdfToText.php:5877–5884)."""
    return _META_PEEK_RE.search(body) is not None


def retrieve_metadata(
    body: bytes, objects: dict[int, PdfObject]
) -> dict[str, str]:
    """Parse the Info dictionary (M1, PdfToText.php:5906–6031):
    paren/hex values with ``n 0 R`` indirection; dates → ISO UTC."""
    meta: dict[str, str] = {}
    for key in _META_KEYS:
        m = re.search(
            rb"/" + key + rb"\s*(?:\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>|(\d+)\s+\d+\s+R)",
            body,
            re.S,
        )
        if not m:
            continue
        if m.group(3) is not None:  # indirect
            ref = objects.get(int(m.group(3)))
            if ref is None:
                continue
            im = re.search(
                rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>", ref.dict_part, re.S
            )
            if not im:
                continue
            raw_paren, raw_hex = im.group(1), im.group(2)
        else:
            raw_paren, raw_hex = m.group(1), m.group(2)
        if raw_paren is not None:
            value = text_string_to_unicode(unescape_literal(raw_paren))
        else:
            h = re.sub(rb"\s+", b"", raw_hex or b"")
            if len(h) % 2:
                h += b"0"
            value = text_string_to_unicode(bytes.fromhex(h.decode("ascii")))
        name = key.decode()
        if name.endswith("Date"):
            iso = parse_pdf_date(value)
            meta[name] = iso if iso is not None else value
        else:
            meta[name] = value
    return meta
