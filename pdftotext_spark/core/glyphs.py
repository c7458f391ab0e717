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

# Broader AGL repertoire (public Adobe Glyph List): Latin Extended-A/B
# (Central-European fonts), Greek, Cyrillic (afii names), math/symbol
# and superior/fraction glyphs that show up in real /Differences arrays
_AGL_WIDE = {
    # superiors / fractions (WinAnsi leftovers + Number Forms)
    "onesuperior": 0xB9, "twosuperior": 0xB2, "threesuperior": 0xB3,
    "onethird": 0x2153, "twothirds": 0x2154, "oneeighth": 0x215B,
    "threeeighths": 0x215C, "fiveeighths": 0x215D, "seveneighths": 0x215E,
    "estimated": 0x212E, "sfthyphen": 0xAD,
    # Latin Extended-A/B (AGL names)
    "Amacron": 0x100, "amacron": 0x101, "Abreve": 0x102, "abreve": 0x103,
    "Aogonek": 0x104, "aogonek": 0x105, "Cacute": 0x106, "cacute": 0x107,
    "Ccaron": 0x10C, "ccaron": 0x10D, "Dcaron": 0x10E, "dcaron": 0x10F,
    "Dcroat": 0x110, "dcroat": 0x111, "Emacron": 0x112, "emacron": 0x113,
    "Edotaccent": 0x116, "edotaccent": 0x117, "Eogonek": 0x118,
    "eogonek": 0x119, "Ecaron": 0x11A, "ecaron": 0x11B, "Gbreve": 0x11E,
    "gbreve": 0x11F, "Gcommaaccent": 0x122, "gcommaaccent": 0x123,
    "Imacron": 0x12A, "imacron": 0x12B, "Iogonek": 0x12E, "iogonek": 0x12F,
    "Idotaccent": 0x130, "Kcommaaccent": 0x136, "kcommaaccent": 0x137,
    "Lacute": 0x139, "lacute": 0x13A, "Lcommaaccent": 0x13B,
    "lcommaaccent": 0x13C, "Lcaron": 0x13D, "lcaron": 0x13E,
    "Nacute": 0x143, "nacute": 0x144, "Ncommaaccent": 0x145,
    "ncommaaccent": 0x146, "Ncaron": 0x147, "ncaron": 0x148,
    "Eng": 0x14A, "eng": 0x14B, "Omacron": 0x14C, "omacron": 0x14D,
    "Ohungarumlaut": 0x150, "ohungarumlaut": 0x151, "Racute": 0x154,
    "racute": 0x155, "Rcommaaccent": 0x156, "rcommaaccent": 0x157,
    "Rcaron": 0x158, "rcaron": 0x159, "Sacute": 0x15A, "sacute": 0x15B,
    "Scedilla": 0x15E, "scedilla": 0x15F, "Tcedilla": 0x162,
    "tcedilla": 0x163, "Tcaron": 0x164, "tcaron": 0x165, "Umacron": 0x16A,
    "umacron": 0x16B, "Uring": 0x16E, "uring": 0x16F,
    "Uhungarumlaut": 0x170, "uhungarumlaut": 0x171, "Uogonek": 0x172,
    "uogonek": 0x173, "Wcircumflex": 0x174, "wcircumflex": 0x175,
    "Ycircumflex": 0x176, "ycircumflex": 0x177, "Zacute": 0x179,
    "zacute": 0x17A, "Zdotaccent": 0x17B, "zdotaccent": 0x17C,
    "Scommaaccent": 0x218, "scommaaccent": 0x219, "Tcommaaccent": 0x21A,
    "tcommaaccent": 0x21B,
    # Greek (AGL: Delta/Omega/mu keep their Letterlike mappings)
    "Alpha": 0x391, "Beta": 0x392, "Gamma": 0x393, "Epsilon": 0x395,
    "Zeta": 0x396, "Eta": 0x397, "Theta": 0x398, "Iota": 0x399,
    "Kappa": 0x39A, "Lambda": 0x39B, "Mu": 0x39C, "Nu": 0x39D,
    "Xi": 0x39E, "Omicron": 0x39F, "Pi": 0x3A0, "Rho": 0x3A1,
    "Sigma": 0x3A3, "Tau": 0x3A4, "Upsilon": 0x3A5, "Phi": 0x3A6,
    "Chi": 0x3A7, "Psi": 0x3A8, "Delta": 0x2206, "Omega": 0x2126,
    "alpha": 0x3B1, "beta": 0x3B2, "gamma": 0x3B3, "delta": 0x3B4,
    "epsilon": 0x3B5, "zeta": 0x3B6, "eta": 0x3B7, "theta": 0x3B8,
    "iota": 0x3B9, "kappa": 0x3BA, "lambda": 0x3BB, "nu": 0x3BD,
    "xi": 0x3BE, "omicron": 0x3BF, "pi": 0x3C0, "rho": 0x3C1,
    "sigma1": 0x3C2, "sigma": 0x3C3, "tau": 0x3C4, "upsilon": 0x3C5,
    "phi": 0x3C6, "chi": 0x3C7, "psi": 0x3C8, "omega": 0x3C9,
    "theta1": 0x3D1, "phi1": 0x3D5, "omega1": 0x3D6,
    "alphatonos": 0x3AC, "epsilontonos": 0x3AD, "etatonos": 0x3AE,
    "iotatonos": 0x3AF, "omicrontonos": 0x3CC, "upsilontonos": 0x3CD,
    "omegatonos": 0x3CE, "iotadieresis": 0x3CA, "upsilondieresis": 0x3CB,
    "tonos": 0x384, "dieresistonos": 0x385, "anoteleia": 0x387,
    # math / symbols
    "approxequal": 0x2248, "arrowboth": 0x2194, "arrowdown": 0x2193,
    "arrowleft": 0x2190, "arrowright": 0x2192, "arrowup": 0x2191,
    "arrowupdn": 0x2195, "asteriskmath": 0x2217, "congruent": 0x2245,
    "dotmath": 0x22C5, "element": 0x2208, "emptyset": 0x2205,
    "equivalence": 0x2261, "existential": 0x2203, "gradient": 0x2207,
    "greaterequal": 0x2265, "infinity": 0x221E, "integral": 0x222B,
    "intersection": 0x2229, "lessequal": 0x2264, "logicaland": 0x2227,
    "logicalor": 0x2228, "lozenge": 0x25CA, "notelement": 0x2209,
    "notequal": 0x2260, "partialdiff": 0x2202, "perpendicular": 0x22A5,
    "product": 0x220F, "propersubset": 0x2282, "propersuperset": 0x2283,
    "proportional": 0x221D, "radical": 0x221A, "reflexsubset": 0x2286,
    "reflexsuperset": 0x2287, "similar": 0x223C, "suchthat": 0x220B,
    "summation": 0x2211, "therefore": 0x2234, "union": 0x222A,
    "universal": 0x2200,
    # geometric / dingbat-ish glyphs (symbol-font Differences)
    "filledbox": 0x25A0, "filledrect": 0x25AC, "triagup": 0x25B2,
    "triagrt": 0x25BA, "triagdn": 0x25BC, "triaglf": 0x25C4,
    "circle": 0x25CB, "openbullet": 0x25E6, "invbullet": 0x25D8,
    "invcircle": 0x25D9, "smileface": 0x263A, "invsmileface": 0x263B,
    "sun": 0x263C, "female": 0x2640, "male": 0x2642,
    "spade": 0x2660, "club": 0x2663, "heart": 0x2665, "diamond": 0x2666,
    "musicalnote": 0x266A, "musicalnotedbl": 0x266B,
    "exclamdbl": 0x203C, "quotereversed": 0x201B,
    # currency
    "colonmonetary": 0x20A1, "franc": 0x20A3, "lira": 0x20A4,
    "peseta": 0x20A7, "dong": 0x20AB, "won": 0x20A9,
    # Cyrillic (AGL afii names; uppercase block, Ё out of sequence)
    "afii10023": 0x401, "afii10051": 0x402, "afii10052": 0x403,
    "afii10053": 0x404, "afii10054": 0x405, "afii10055": 0x406,
    "afii10056": 0x407, "afii10057": 0x408, "afii10058": 0x409,
    "afii10059": 0x40A, "afii10060": 0x40B, "afii10061": 0x40C,
    "afii10062": 0x40E, "afii10145": 0x40F,
    "afii10071": 0x451, "afii10099": 0x452, "afii10100": 0x453,
    "afii10101": 0x454, "afii10102": 0x455, "afii10103": 0x456,
    "afii10104": 0x457, "afii10105": 0x458, "afii10106": 0x459,
    "afii10107": 0x45A, "afii10108": 0x45B, "afii10109": 0x45C,
    "afii10110": 0x45E, "afii10193": 0x45F,
    # misc afii punctuation
    "afii61352": 0x2116,  # №
    "afii61289": 0x2113,  # ℓ
    "afii00208": 0x2015,  # horizontal bar
}
# Cyrillic main blocks in AGL afii order: А..Е, then Ё (U+0401)
# inserted, then Ж..Я — so afii10017..10049 spans 33 names; the
# lowercase block afii10065..10097 mirrors it with ё (U+0451)
_CYR_UPPER = list(range(0x410, 0x416)) + [0x401] + list(range(0x416, 0x430))
for _i, _cp in enumerate(_CYR_UPPER):
    _AGL_WIDE[f"afii{10017 + _i}"] = _cp
_CYR_LOWER = list(range(0x430, 0x436)) + [0x451] + list(range(0x436, 0x450))
for _i, _cp in enumerate(_CYR_LOWER):
    _AGL_WIDE[f"afii{10065 + _i}"] = _cp

GLYPH_TO_UNICODE: dict[str, int] = {}
GLYPH_TO_UNICODE.update(_ASCII)
GLYPH_TO_UNICODE.update(_AGL_WIDE)
GLYPH_TO_UNICODE.update(_EXTENDED)
# single letters and digits name themselves: A->0x41, a->0x61
for _c in range(ord("A"), ord("Z") + 1):
    GLYPH_TO_UNICODE[chr(_c)] = _c
for _c in range(ord("a"), ord("z") + 1):
    GLYPH_TO_UNICODE[chr(_c)] = _c


# --- generated AGL repertoire -------------------------------------------
# The full public AGL's Latin section is *systematic*: the glyph name is
# the base letter(s) plus accent suffixes in the order of the Unicode
# character name ("LATIN SMALL LETTER A WITH BREVE AND ACUTE" →
# "abreveacute" = U+1EB7's sibling…).  Rather than transcribing ~2,000
# rows, derive them from the stdlib unicodedata names over the
# precomposed Latin blocks (Latin-1 … Extended Additional).  Explicit
# entries above always win (the AGL's deliberate divergences —
# gcommaaccent→G-with-cedilla etc. — are all listed there).
_ACCENT_SUFFIX = {
    "ACUTE": "acute", "GRAVE": "grave", "CIRCUMFLEX": "circumflex",
    "DIAERESIS": "dieresis", "TILDE": "tilde", "MACRON": "macron",
    "BREVE": "breve", "DOT ABOVE": "dotaccent", "RING ABOVE": "ring",
    "CARON": "caron", "OGONEK": "ogonek", "DOUBLE ACUTE": "hungarumlaut",
    "CEDILLA": "cedilla", "HORN": "horn", "DOT BELOW": "dotbelow",
    "HOOK ABOVE": "hookabove", "COMMA BELOW": "commaaccent",
    "LINE BELOW": "linebelow", "RING BELOW": "ringbelow",
    "CIRCUMFLEX BELOW": "circumflexbelow", "BREVE BELOW": "brevebelow",
    "TILDE BELOW": "tildebelow", "DIAERESIS BELOW": "dieresisbelow",
    "HOOK": "hook", "STROKE": "slash",
}
_LATIN_NAME_RE = re.compile(
    r"^LATIN (CAPITAL|SMALL) LETTER ([A-Z]+)(?: WITH (.+))?$"
)


def _generate_latin_names() -> None:
    import unicodedata

    blocks = [(0xC0, 0x250), (0x1E00, 0x1F00)]
    for lo, hi in blocks:
        for cp in range(lo, hi):
            try:
                uname = unicodedata.name(chr(cp))
            except ValueError:
                continue
            m = _LATIN_NAME_RE.match(uname)
            if not m or not m.group(3):
                continue
            case, letters, accents = m.groups()
            parts = [_ACCENT_SUFFIX.get(a) for a in accents.split(" AND ")]
            if None in parts:
                continue
            base = letters if case == "CAPITAL" else letters.lower()
            GLYPH_TO_UNICODE.setdefault(base + "".join(parts), cp)


_generate_latin_names()

# bars (Unicode calls these STROKE; AGL names them *bar)
GLYPH_TO_UNICODE.update({"Hbar": 0x126, "hbar": 0x127, "Tbar": 0x166, "tbar": 0x167})

# superscript / subscript digits (AGL: Nsuperior / Ninferior); one/
# two/threesuperior are already pinned to their Latin-1 codepoints
_DIGIT_NAMES = ["zero", "one", "two", "three", "four",
                "five", "six", "seven", "eight", "nine"]
for _i, _d in enumerate(_DIGIT_NAMES):
    GLYPH_TO_UNICODE.setdefault(f"{_d}superior", 0x2070 + _i)
    GLYPH_TO_UNICODE.setdefault(f"{_d}inferior", 0x2080 + _i)

# Hebrew consonants: AGL afii57664..57690 = U+05D0..U+05EA (alef..tav)
for _i in range(27):
    GLYPH_TO_UNICODE.setdefault(f"afii{57664 + _i}", 0x5D0 + _i)
# Arabic letters: afii57409..57434 = U+0621..U+063A (hamza..ghain),
# afii57440..57454 = U+0640..U+064E (tatweel..fatha), and the
# Arabic-Indic digits afii57392..57401 = U+0660..U+0669
for _i in range(26):
    GLYPH_TO_UNICODE.setdefault(f"afii{57409 + _i}", 0x621 + _i)
for _i in range(15):
    GLYPH_TO_UNICODE.setdefault(f"afii{57440 + _i}", 0x640 + _i)
for _i in range(10):
    GLYPH_TO_UNICODE.setdefault(f"afii{57392 + _i}", 0x660 + _i)

_UNI_RE = re.compile(r"^uni((?:[0-9A-Fa-f]{4})+)$")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")
_G_RE = re.compile(r"^g(\d+)$")
_SUFFIX_RE = re.compile(r"^(.*?)\..*$")

# quirk offset for /gNN glyph-id names (PdfToText.php:7149–7159)
_G_QUIRK_OFFSET = 29

UNKNOWN_GLYPH = "?"


def glyph_to_char(name: str) -> str:
    """Resolve a ``/Differences`` glyph name to a character.

    Resolution order mirrors PdfToText.php:7061–7182: direct AGL hit;
    ``uniXXXX``/``uXXXX`` hex forms (``uni`` allows concatenated
    4-digit groups per the AGL spec); ``gNN`` glyph-ids with the +29
    offset quirk (PdfToText.php:7149–7159); ``.``-variant-suffix
    stripping (``a.sc`` → ``a``, PdfToText.php:7064–7073);
    ``_``-joined component ligatures (``f_f_i`` → ``ffi``, AGL spec);
    else ``?``.
    """
    cp = GLYPH_TO_UNICODE.get(name)
    if cp is not None:
        return chr(cp)
    m = _UNI_RE.match(name)
    if m:
        hexes = m.group(1)
        return "".join(
            chr(int(hexes[i : i + 4], 16)) for i in range(0, len(hexes), 4)
        )
    m = _U_RE.match(name)
    if m:
        return chr(int(m.group(1), 16))
    m = _G_RE.match(name)
    if m:
        cp = int(m.group(1)) + _G_QUIRK_OFFSET
        return chr(cp) if 0x20 <= cp < 0x110000 else UNKNOWN_GLYPH
    m = _SUFFIX_RE.match(name)
    if m and m.group(1):
        return glyph_to_char(m.group(1))
    if "_" in name:
        # ADVICE r3: '_' / '__' have zero components — returning ''
        # would silently drop the glyph; only take the ligature branch
        # when at least one component resolves
        resolved = [glyph_to_char(part) for part in name.split("_") if part]
        if any(r != UNKNOWN_GLYPH for r in resolved):
            return "".join(resolved)
    return UNKNOWN_GLYPH
