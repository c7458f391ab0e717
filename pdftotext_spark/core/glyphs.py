"""Adobe glyph name → Unicode table (subset of the public Adobe Glyph
List) used by ``/Differences`` arrays (SURVEY.md §2.4 F7).

The reference ships ``Maps/adobe-charsets.map`` with per-charset code
points; we instead resolve glyph names straight to Unicode (the AGL is
public). Covers the Standard/WinAnsi/MacRoman glyph repertoire plus the
ligatures and dash/quote glyphs that appear in real PDFs. Unknown names
fall back to ``?`` as the reference does (PdfToText.php:7061–7182).
"""

from __future__ import annotations

import re

# ASCII range: names for codes 0x20..0x7E (AGL standard names)
_ASCII = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26, "quotesingle": 0x27,
    "parenleft": 0x28, "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "zero": 0x30, "one": 0x31, "two": 0x32, "three": 0x33, "four": 0x34,
    "five": 0x35, "six": 0x36, "seven": 0x37, "eight": 0x38, "nine": 0x39,
    "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
    "greater": 0x3E, "question": 0x3F, "at": 0x40,
    "bracketleft": 0x5B, "backslash": 0x5C, "bracketright": 0x5D,
    "asciicircum": 0x5E, "underscore": 0x5F, "grave": 0x60,
    "braceleft": 0x7B, "bar": 0x7C, "braceright": 0x7D, "asciitilde": 0x7E,
}

# Latin-1 supplement + common typographic glyphs (AGL)
_EXTENDED = {
    "exclamdown": 0xA1, "cent": 0xA2, "sterling": 0xA3, "currency": 0xA4,
    "yen": 0xA5, "brokenbar": 0xA6, "section": 0xA7, "dieresis": 0xA8,
    "copyright": 0xA9, "ordfeminine": 0xAA, "guillemotleft": 0xAB,
    "logicalnot": 0xAC, "registered": 0xAE, "macron": 0xAF,
    "degree": 0xB0, "plusminus": 0xB1, "acute": 0xB4, "mu": 0xB5,
    "paragraph": 0xB6, "periodcentered": 0xB7, "cedilla": 0xB8,
    "ordmasculine": 0xBA, "guillemotright": 0xBB, "onequarter": 0xBC,
    "onehalf": 0xBD, "threequarters": 0xBE, "questiondown": 0xBF,
    "Agrave": 0xC0, "Aacute": 0xC1, "Acircumflex": 0xC2, "Atilde": 0xC3,
    "Adieresis": 0xC4, "Aring": 0xC5, "AE": 0xC6, "Ccedilla": 0xC7,
    "Egrave": 0xC8, "Eacute": 0xC9, "Ecircumflex": 0xCA, "Edieresis": 0xCB,
    "Igrave": 0xCC, "Iacute": 0xCD, "Icircumflex": 0xCE, "Idieresis": 0xCF,
    "Eth": 0xD0, "Ntilde": 0xD1, "Ograve": 0xD2, "Oacute": 0xD3,
    "Ocircumflex": 0xD4, "Otilde": 0xD5, "Odieresis": 0xD6, "multiply": 0xD7,
    "Oslash": 0xD8, "Ugrave": 0xD9, "Uacute": 0xDA, "Ucircumflex": 0xDB,
    "Udieresis": 0xDC, "Yacute": 0xDD, "Thorn": 0xDE, "germandbls": 0xDF,
    "agrave": 0xE0, "aacute": 0xE1, "acircumflex": 0xE2, "atilde": 0xE3,
    "adieresis": 0xE4, "aring": 0xE5, "ae": 0xE6, "ccedilla": 0xE7,
    "egrave": 0xE8, "eacute": 0xE9, "ecircumflex": 0xEA, "edieresis": 0xEB,
    "igrave": 0xEC, "iacute": 0xED, "icircumflex": 0xEE, "idieresis": 0xEF,
    "eth": 0xF0, "ntilde": 0xF1, "ograve": 0xF2, "oacute": 0xF3,
    "ocircumflex": 0xF4, "otilde": 0xF5, "odieresis": 0xF6, "divide": 0xF7,
    "oslash": 0xF8, "ugrave": 0xF9, "uacute": 0xFA, "ucircumflex": 0xFB,
    "udieresis": 0xFC, "yacute": 0xFD, "thorn": 0xFE, "ydieresis": 0xFF,
    # typographic
    "bullet": 0x2022, "dagger": 0x2020, "daggerdbl": 0x2021,
    "ellipsis": 0x2026, "emdash": 0x2014, "endash": 0x2013,
    "florin": 0x0192, "fraction": 0x2044, "guilsinglleft": 0x2039,
    "guilsinglright": 0x203A, "minus": 0x2212, "perthousand": 0x2030,
    "quotedblbase": 0x201E, "quotedblleft": 0x201C, "quotedblright": 0x201D,
    "quoteleft": 0x2018, "quoteright": 0x2019, "quotesinglbase": 0x201A,
    "trademark": 0x2122, "fi": 0xFB01, "fl": 0xFB02, "ff": 0xFB00,
    "ffi": 0xFB03, "ffl": 0xFB04, "Euro": 0x20AC, "dotlessi": 0x0131,
    "circumflex": 0x02C6, "caron": 0x02C7, "breve": 0x02D8,
    "dotaccent": 0x02D9, "ring": 0x02DA, "ogonek": 0x02DB, "tilde": 0x02DC,
    "hungarumlaut": 0x02DD, "OE": 0x0152, "oe": 0x0153, "Scaron": 0x0160,
    "scaron": 0x0161, "Ydieresis": 0x0178, "Zcaron": 0x017D,
    "zcaron": 0x017E, "Lslash": 0x0141, "lslash": 0x0142,
}

GLYPH_TO_UNICODE: dict[str, int] = {}
GLYPH_TO_UNICODE.update(_ASCII)
GLYPH_TO_UNICODE.update(_EXTENDED)
# single letters and digits name themselves: A->0x41, a->0x61
for _c in range(ord("A"), ord("Z") + 1):
    GLYPH_TO_UNICODE[chr(_c)] = _c
for _c in range(ord("a"), ord("z") + 1):
    GLYPH_TO_UNICODE[chr(_c)] = _c

_UNI_RE = re.compile(r"^uni([0-9A-Fa-f]{4,6})$")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")
_G_RE = re.compile(r"^g(\d+)$")
_SUFFIX_RE = re.compile(r"^(.*?)[._].*$")

# quirk offset for /gNN glyph-id names (PdfToText.php:7149–7159)
_G_QUIRK_OFFSET = 29

UNKNOWN_GLYPH = "?"


def glyph_to_char(name: str) -> str:
    """Resolve a ``/Differences`` glyph name to a character.

    Resolution order mirrors PdfToText.php:7061–7182: direct AGL hit;
    ``uniXXXX``/``uXXXX`` hex forms; ``gNN`` glyph-ids with the +29
    offset quirk (PdfToText.php:7149–7159); variant-suffix stripping
    (``a.sc`` → ``a``, PdfToText.php:7064–7073); else ``?``.
    """
    cp = GLYPH_TO_UNICODE.get(name)
    if cp is not None:
        return chr(cp)
    m = _UNI_RE.match(name) or _U_RE.match(name)
    if m:
        return chr(int(m.group(1), 16))
    m = _G_RE.match(name)
    if m:
        cp = int(m.group(1)) + _G_QUIRK_OFFSET
        return chr(cp) if 0x20 <= cp < 0x110000 else UNKNOWN_GLYPH
    m = _SUFFIX_RE.match(name)
    if m and m.group(1):
        base = GLYPH_TO_UNICODE.get(m.group(1))
        if base is not None:
            return chr(base)
    return UNKNOWN_GLYPH
