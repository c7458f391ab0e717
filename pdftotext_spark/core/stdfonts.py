"""Adobe standard-14 font metrics (SURVEY.md §2 F2 completion).

Type1 base-14 fonts never embed their widths — the reference loads
them from external ``FontMetrics/*.fm`` tables keyed by character
code (PdfToText.php:1142–1158 name map, 6469–6494 load, 6641–6680
``GetStringWidth`` lookup by decoded character).  We derive the same
information from **public data only**: the Adobe Core-14 AFM metrics
(freely redistributable per Adobe's Core14 AFM license; the same
numbers ship in countless open-source PDF libraries).  The tables
below are glyph-name→width in 1/1000 em exactly as the AFMs state
them; character-keyed lookup tables are generated per font by
resolving glyph names through the repo's AGL table plus the AFM
composite rule (accented Latin composites inherit their base glyph's
advance — true across the Core-14 text faces).

Font-name normalization mirrors the reference's
``$AdobeStandardFontMetrics`` keys (subset prefix ``ABCDEF+``
stripped, lowercased), extended with the well-known metric aliases
(Arial→Helvetica, TimesNewRoman→Times, CourierNew→Courier) the
reference lacks.

Symbol and ZapfDingbats are *code*-keyed (their glyph names sit
outside the Latin AGL range and the engine's raw-code fallback decode
makes ``ord(decoded_char) == byte code``); the ASCII Symbol set and
the full AFM-encoded ZapfDingbats ornament set are shipped — unlisted
codes fall back to the font's default width, same as any unknown
character.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# ---------------------------------------------------------------------------
# AFM glyph widths (1/1000 em), Adobe Core-14 data.
# ---------------------------------------------------------------------------

_HELVETICA = {
    "space": 278, "exclam": 278, "quotedbl": 355, "numbersign": 556,
    "dollar": 556, "percent": 889, "ampersand": 667, "quotesingle": 191,
    "quoteright": 222, "quoteleft": 222, "parenleft": 333, "parenright": 333,
    "asterisk": 389, "plus": 584, "comma": 278, "hyphen": 333, "period": 278,
    "slash": 278, "zero": 556, "one": 556, "two": 556, "three": 556,
    "four": 556, "five": 556, "six": 556, "seven": 556, "eight": 556,
    "nine": 556, "colon": 278, "semicolon": 278, "less": 584, "equal": 584,
    "greater": 584, "question": 556, "at": 1015,
    "A": 667, "B": 667, "C": 722, "D": 722, "E": 667, "F": 611, "G": 778,
    "H": 722, "I": 278, "J": 500, "K": 667, "L": 556, "M": 833, "N": 722,
    "O": 778, "P": 667, "Q": 778, "R": 722, "S": 667, "T": 611, "U": 722,
    "V": 667, "W": 944, "X": 667, "Y": 667, "Z": 611,
    "bracketleft": 278, "backslash": 278, "bracketright": 278,
    "asciicircum": 469, "underscore": 556, "grave": 333,
    "a": 556, "b": 556, "c": 500, "d": 556, "e": 556, "f": 278, "g": 556,
    "h": 556, "i": 222, "j": 222, "k": 500, "l": 222, "m": 833, "n": 556,
    "o": 556, "p": 556, "q": 556, "r": 333, "s": 500, "t": 278, "u": 556,
    "v": 500, "w": 722, "x": 500, "y": 500, "z": 500,
    "braceleft": 334, "bar": 260, "braceright": 334, "asciitilde": 584,
    "exclamdown": 333, "cent": 556, "sterling": 556, "fraction": 167,
    "yen": 556, "florin": 556, "section": 556, "currency": 556,
    "quotedblleft": 333, "guillemotleft": 556, "guilsinglleft": 333,
    "guilsinglright": 333, "fi": 500, "fl": 500, "endash": 556,
    "dagger": 556, "daggerdbl": 556, "periodcentered": 278,
    "paragraph": 537, "bullet": 350, "quotesinglbase": 222,
    "quotedblbase": 333, "quotedblright": 333, "guillemotright": 556,
    "ellipsis": 1000, "perthousand": 1000, "questiondown": 611,
    "acute": 333, "circumflex": 333, "tilde": 333, "macron": 333,
    "breve": 333, "dotaccent": 333, "dieresis": 333, "ring": 333,
    "cedilla": 333, "hungarumlaut": 333, "ogonek": 333, "caron": 333,
    "emdash": 1000, "AE": 1000, "ordfeminine": 370, "Lslash": 556,
    "Oslash": 778, "OE": 1000, "ordmasculine": 365, "ae": 889,
    "dotlessi": 278, "lslash": 222, "oslash": 611, "oe": 944,
    "germandbls": 611, "onesuperior": 333, "twosuperior": 333,
    "threesuperior": 333, "plusminus": 584, "mu": 556, "multiply": 584,
    "divide": 584, "degree": 400, "copyright": 737, "registered": 737,
    "trademark": 1000, "brokenbar": 260, "logicalnot": 584,
    "onehalf": 834, "onequarter": 834, "threequarters": 834,
    "Eth": 722, "eth": 556, "Thorn": 667, "thorn": 556, "minus": 584,
    "Euro": 556,
}

_HELVETICA_BOLD = {
    "space": 278, "exclam": 333, "quotedbl": 474, "numbersign": 556,
    "dollar": 556, "percent": 889, "ampersand": 722, "quotesingle": 238,
    "quoteright": 278, "quoteleft": 278, "parenleft": 333, "parenright": 333,
    "asterisk": 389, "plus": 584, "comma": 278, "hyphen": 333, "period": 278,
    "slash": 278, "zero": 556, "one": 556, "two": 556, "three": 556,
    "four": 556, "five": 556, "six": 556, "seven": 556, "eight": 556,
    "nine": 556, "colon": 333, "semicolon": 333, "less": 584, "equal": 584,
    "greater": 584, "question": 611, "at": 975,
    "A": 722, "B": 722, "C": 722, "D": 722, "E": 667, "F": 611, "G": 778,
    "H": 722, "I": 278, "J": 556, "K": 722, "L": 611, "M": 833, "N": 722,
    "O": 778, "P": 667, "Q": 778, "R": 722, "S": 667, "T": 611, "U": 722,
    "V": 667, "W": 944, "X": 667, "Y": 667, "Z": 611,
    "bracketleft": 333, "backslash": 278, "bracketright": 333,
    "asciicircum": 584, "underscore": 556, "grave": 333,
    "a": 556, "b": 611, "c": 556, "d": 611, "e": 556, "f": 333, "g": 611,
    "h": 611, "i": 278, "j": 278, "k": 556, "l": 278, "m": 889, "n": 611,
    "o": 611, "p": 611, "q": 611, "r": 389, "s": 556, "t": 333, "u": 611,
    "v": 556, "w": 778, "x": 556, "y": 556, "z": 500,
    "braceleft": 389, "bar": 280, "braceright": 389, "asciitilde": 584,
    "exclamdown": 333, "cent": 556, "sterling": 556, "fraction": 167,
    "yen": 556, "florin": 556, "section": 556, "currency": 556,
    "quotedblleft": 500, "guillemotleft": 556, "guilsinglleft": 333,
    "guilsinglright": 333, "fi": 611, "fl": 611, "endash": 556,
    "dagger": 556, "daggerdbl": 556, "periodcentered": 278,
    "paragraph": 556, "bullet": 350, "quotesinglbase": 278,
    "quotedblbase": 500, "quotedblright": 500, "guillemotright": 556,
    "ellipsis": 1000, "perthousand": 1000, "questiondown": 611,
    "acute": 333, "circumflex": 333, "tilde": 333, "macron": 333,
    "breve": 333, "dotaccent": 333, "dieresis": 333, "ring": 333,
    "cedilla": 333, "hungarumlaut": 333, "ogonek": 333, "caron": 333,
    "emdash": 1000, "AE": 1000, "ordfeminine": 370, "Lslash": 611,
    "Oslash": 778, "OE": 1000, "ordmasculine": 365, "ae": 889,
    "dotlessi": 278, "lslash": 278, "oslash": 611, "oe": 944,
    "germandbls": 611, "onesuperior": 333, "twosuperior": 333,
    "threesuperior": 333, "plusminus": 584, "mu": 611, "multiply": 584,
    "divide": 584, "degree": 400, "copyright": 737, "registered": 737,
    "trademark": 1000, "brokenbar": 280, "logicalnot": 584,
    "onehalf": 834, "onequarter": 834, "threequarters": 834,
    "Eth": 722, "eth": 611, "Thorn": 667, "thorn": 611, "minus": 584,
    "Euro": 556,
}

_TIMES_ROMAN = {
    "space": 250, "exclam": 333, "quotedbl": 408, "numbersign": 500,
    "dollar": 500, "percent": 833, "ampersand": 778, "quotesingle": 180,
    "quoteright": 333, "quoteleft": 333, "parenleft": 333, "parenright": 333,
    "asterisk": 500, "plus": 564, "comma": 250, "hyphen": 333, "period": 250,
    "slash": 278, "zero": 500, "one": 500, "two": 500, "three": 500,
    "four": 500, "five": 500, "six": 500, "seven": 500, "eight": 500,
    "nine": 500, "colon": 278, "semicolon": 278, "less": 564, "equal": 564,
    "greater": 564, "question": 444, "at": 921,
    "A": 722, "B": 667, "C": 667, "D": 722, "E": 611, "F": 556, "G": 722,
    "H": 722, "I": 333, "J": 389, "K": 722, "L": 611, "M": 889, "N": 722,
    "O": 722, "P": 556, "Q": 722, "R": 667, "S": 556, "T": 611, "U": 722,
    "V": 722, "W": 944, "X": 722, "Y": 722, "Z": 611,
    "bracketleft": 333, "backslash": 278, "bracketright": 333,
    "asciicircum": 469, "underscore": 500, "grave": 333,
    "a": 444, "b": 500, "c": 444, "d": 500, "e": 444, "f": 333, "g": 500,
    "h": 500, "i": 278, "j": 278, "k": 500, "l": 278, "m": 778, "n": 500,
    "o": 500, "p": 500, "q": 500, "r": 333, "s": 389, "t": 278, "u": 500,
    "v": 500, "w": 722, "x": 500, "y": 500, "z": 444,
    "braceleft": 480, "bar": 200, "braceright": 480, "asciitilde": 541,
    "exclamdown": 333, "cent": 500, "sterling": 500, "fraction": 167,
    "yen": 500, "florin": 500, "section": 500, "currency": 500,
    "quotedblleft": 444, "guillemotleft": 500, "guilsinglleft": 333,
    "guilsinglright": 333, "fi": 556, "fl": 556, "endash": 500,
    "dagger": 500, "daggerdbl": 500, "periodcentered": 250,
    "paragraph": 453, "bullet": 350, "quotesinglbase": 333,
    "quotedblbase": 444, "quotedblright": 444, "guillemotright": 500,
    "ellipsis": 1000, "perthousand": 1000, "questiondown": 444,
    "acute": 333, "circumflex": 333, "tilde": 333, "macron": 333,
    "breve": 333, "dotaccent": 333, "dieresis": 333, "ring": 333,
    "cedilla": 333, "hungarumlaut": 333, "ogonek": 333, "caron": 333,
    "emdash": 1000, "AE": 889, "ordfeminine": 276, "Lslash": 611,
    "Oslash": 722, "OE": 889, "ordmasculine": 310, "ae": 667,
    "dotlessi": 278, "lslash": 278, "oslash": 500, "oe": 722,
    "germandbls": 500, "onesuperior": 300, "twosuperior": 300,
    "threesuperior": 300, "plusminus": 564, "mu": 500, "multiply": 564,
    "divide": 564, "degree": 400, "copyright": 760, "registered": 760,
    "trademark": 980, "brokenbar": 200, "logicalnot": 564,
    "onehalf": 750, "onequarter": 750, "threequarters": 750,
    "Eth": 722, "eth": 500, "Thorn": 556, "thorn": 500, "minus": 564,
    "Euro": 500,
}

_TIMES_BOLD = {
    "space": 250, "exclam": 333, "quotedbl": 555, "numbersign": 500,
    "dollar": 500, "percent": 1000, "ampersand": 833, "quotesingle": 278,
    "quoteright": 333, "quoteleft": 333, "parenleft": 333, "parenright": 333,
    "asterisk": 500, "plus": 570, "comma": 250, "hyphen": 333, "period": 250,
    "slash": 278, "zero": 500, "one": 500, "two": 500, "three": 500,
    "four": 500, "five": 500, "six": 500, "seven": 500, "eight": 500,
    "nine": 500, "colon": 333, "semicolon": 333, "less": 570, "equal": 570,
    "greater": 570, "question": 500, "at": 930,
    "A": 722, "B": 667, "C": 722, "D": 722, "E": 667, "F": 611, "G": 778,
    "H": 778, "I": 389, "J": 500, "K": 778, "L": 667, "M": 944, "N": 722,
    "O": 778, "P": 611, "Q": 778, "R": 722, "S": 556, "T": 667, "U": 722,
    "V": 722, "W": 1000, "X": 722, "Y": 722, "Z": 667,
    "bracketleft": 333, "backslash": 278, "bracketright": 333,
    "asciicircum": 581, "underscore": 500, "grave": 333,
    "a": 500, "b": 556, "c": 444, "d": 556, "e": 444, "f": 333, "g": 500,
    "h": 556, "i": 278, "j": 333, "k": 556, "l": 278, "m": 833, "n": 556,
    "o": 500, "p": 556, "q": 556, "r": 444, "s": 389, "t": 333, "u": 556,
    "v": 500, "w": 722, "x": 500, "y": 500, "z": 444,
    "braceleft": 394, "bar": 220, "braceright": 394, "asciitilde": 520,
    "exclamdown": 333, "cent": 500, "sterling": 500, "fraction": 167,
    "yen": 500, "florin": 500, "section": 500, "currency": 500,
    "quotedblleft": 500, "guillemotleft": 500, "guilsinglleft": 333,
    "guilsinglright": 333, "fi": 556, "fl": 556, "endash": 500,
    "dagger": 500, "daggerdbl": 500, "periodcentered": 250,
    "paragraph": 540, "bullet": 350, "quotesinglbase": 333,
    "quotedblbase": 500, "quotedblright": 500, "guillemotright": 500,
    "ellipsis": 1000, "perthousand": 1000, "questiondown": 500,
    "acute": 333, "circumflex": 333, "tilde": 333, "macron": 333,
    "breve": 333, "dotaccent": 333, "dieresis": 333, "ring": 333,
    "cedilla": 333, "hungarumlaut": 333, "ogonek": 333, "caron": 333,
    "emdash": 1000, "AE": 1000, "ordfeminine": 300, "Lslash": 667,
    "Oslash": 778, "OE": 1000, "ordmasculine": 330, "ae": 722,
    "dotlessi": 278, "lslash": 278, "oslash": 500, "oe": 722,
    "germandbls": 556, "onesuperior": 300, "twosuperior": 300,
    "threesuperior": 300, "plusminus": 570, "mu": 556, "multiply": 570,
    "divide": 570, "degree": 400, "copyright": 747, "registered": 747,
    "trademark": 1000, "brokenbar": 220, "logicalnot": 570,
    "onehalf": 750, "onequarter": 750, "threequarters": 750,
    "Eth": 722, "eth": 500, "Thorn": 611, "thorn": 556, "minus": 570,
    "Euro": 500,
}

_TIMES_ITALIC = {
    "space": 250, "exclam": 333, "quotedbl": 420, "numbersign": 500,
    "dollar": 500, "percent": 833, "ampersand": 778, "quotesingle": 214,
    "quoteright": 333, "quoteleft": 333, "parenleft": 333, "parenright": 333,
    "asterisk": 500, "plus": 675, "comma": 250, "hyphen": 333, "period": 250,
    "slash": 278, "zero": 500, "one": 500, "two": 500, "three": 500,
    "four": 500, "five": 500, "six": 500, "seven": 500, "eight": 500,
    "nine": 500, "colon": 333, "semicolon": 333, "less": 675, "equal": 675,
    "greater": 675, "question": 500, "at": 920,
    "A": 611, "B": 611, "C": 667, "D": 722, "E": 611, "F": 611, "G": 722,
    "H": 722, "I": 333, "J": 444, "K": 667, "L": 556, "M": 833, "N": 667,
    "O": 722, "P": 611, "Q": 722, "R": 611, "S": 500, "T": 556, "U": 722,
    "V": 611, "W": 833, "X": 611, "Y": 556, "Z": 556,
    "bracketleft": 389, "backslash": 278, "bracketright": 389,
    "asciicircum": 422, "underscore": 500, "grave": 333,
    "a": 500, "b": 500, "c": 444, "d": 500, "e": 444, "f": 278, "g": 500,
    "h": 500, "i": 278, "j": 278, "k": 444, "l": 278, "m": 722, "n": 500,
    "o": 500, "p": 500, "q": 500, "r": 389, "s": 389, "t": 278, "u": 500,
    "v": 444, "w": 667, "x": 444, "y": 444, "z": 389,
    "braceleft": 400, "bar": 275, "braceright": 400, "asciitilde": 541,
    "exclamdown": 389, "cent": 500, "sterling": 500, "fraction": 167,
    "yen": 500, "florin": 500, "section": 500, "currency": 500,
    "quotedblleft": 556, "guillemotleft": 500, "guilsinglleft": 333,
    "guilsinglright": 333, "fi": 500, "fl": 500, "endash": 500,
    "dagger": 500, "daggerdbl": 500, "periodcentered": 250,
    "paragraph": 523, "bullet": 350, "quotesinglbase": 333,
    "quotedblbase": 556, "quotedblright": 556, "guillemotright": 500,
    "ellipsis": 889, "perthousand": 1000, "questiondown": 500,
    "acute": 333, "circumflex": 333, "tilde": 333, "macron": 333,
    "breve": 333, "dotaccent": 333, "dieresis": 333, "ring": 333,
    "cedilla": 333, "hungarumlaut": 333, "ogonek": 333, "caron": 333,
    "emdash": 889, "AE": 889, "ordfeminine": 276, "Lslash": 556,
    "Oslash": 722, "OE": 944, "ordmasculine": 310, "ae": 667,
    "dotlessi": 278, "lslash": 278, "oslash": 500, "oe": 667,
    "germandbls": 500, "onesuperior": 300, "twosuperior": 300,
    "threesuperior": 300, "plusminus": 675, "mu": 500, "multiply": 675,
    "divide": 675, "degree": 400, "copyright": 760, "registered": 760,
    "trademark": 980, "brokenbar": 275, "logicalnot": 675,
    "onehalf": 750, "onequarter": 750, "threequarters": 750,
    "Eth": 722, "eth": 500, "Thorn": 611, "thorn": 500, "minus": 675,
    "Euro": 500,
}

_TIMES_BOLDITALIC = {
    "space": 250, "exclam": 389, "quotedbl": 555, "numbersign": 500,
    "dollar": 500, "percent": 833, "ampersand": 778, "quotesingle": 278,
    "quoteright": 333, "quoteleft": 333, "parenleft": 333, "parenright": 333,
    "asterisk": 500, "plus": 570, "comma": 250, "hyphen": 333, "period": 250,
    "slash": 278, "zero": 500, "one": 500, "two": 500, "three": 500,
    "four": 500, "five": 500, "six": 500, "seven": 500, "eight": 500,
    "nine": 500, "colon": 333, "semicolon": 333, "less": 570, "equal": 570,
    "greater": 570, "question": 500, "at": 832,
    "A": 667, "B": 667, "C": 667, "D": 722, "E": 667, "F": 667, "G": 722,
    "H": 778, "I": 389, "J": 500, "K": 667, "L": 611, "M": 889, "N": 722,
    "O": 722, "P": 611, "Q": 722, "R": 667, "S": 556, "T": 611, "U": 722,
    "V": 667, "W": 889, "X": 667, "Y": 611, "Z": 611,
    "bracketleft": 333, "backslash": 278, "bracketright": 333,
    "asciicircum": 570, "underscore": 500, "grave": 333,
    "a": 500, "b": 500, "c": 444, "d": 500, "e": 444, "f": 333, "g": 500,
    "h": 556, "i": 278, "j": 278, "k": 500, "l": 278, "m": 778, "n": 556,
    "o": 500, "p": 500, "q": 500, "r": 389, "s": 389, "t": 278, "u": 556,
    "v": 444, "w": 667, "x": 500, "y": 444, "z": 389,
    "braceleft": 348, "bar": 220, "braceright": 348, "asciitilde": 570,
    "exclamdown": 389, "cent": 500, "sterling": 500, "fraction": 167,
    "yen": 500, "florin": 500, "section": 500, "currency": 500,
    "quotedblleft": 500, "guillemotleft": 500, "guilsinglleft": 333,
    "guilsinglright": 333, "fi": 556, "fl": 556, "endash": 500,
    "dagger": 500, "daggerdbl": 500, "periodcentered": 250,
    "paragraph": 500, "bullet": 350, "quotesinglbase": 333,
    "quotedblbase": 500, "quotedblright": 500, "guillemotright": 500,
    "ellipsis": 1000, "perthousand": 1000, "questiondown": 500,
    "acute": 333, "circumflex": 333, "tilde": 333, "macron": 333,
    "breve": 333, "dotaccent": 333, "dieresis": 333, "ring": 333,
    "cedilla": 333, "hungarumlaut": 333, "ogonek": 333, "caron": 333,
    "emdash": 1000, "AE": 944, "ordfeminine": 266, "Lslash": 611,
    "Oslash": 722, "OE": 944, "ordmasculine": 300, "ae": 722,
    "dotlessi": 278, "lslash": 278, "oslash": 500, "oe": 722,
    "germandbls": 500, "onesuperior": 300, "twosuperior": 300,
    "threesuperior": 300, "plusminus": 570, "mu": 576, "multiply": 570,
    "divide": 570, "degree": 400, "copyright": 747, "registered": 747,
    "trademark": 1000, "brokenbar": 220, "logicalnot": 606,
    "onehalf": 750, "onequarter": 750, "threequarters": 750,
    "Eth": 722, "eth": 500, "Thorn": 611, "thorn": 500, "minus": 606,
    "Euro": 500,
}

# Symbol: code-keyed (font-specific encoding; the engine's raw-code
# fallback decode keeps ord(char) == byte code).  ASCII-range subset of
# the Symbol AFM — Greek alphabet + the operators real documents use.
_SYMBOL_CODES: dict[int, int] = {
    32: 250, 33: 333, 34: 713, 35: 500, 36: 549, 37: 833, 38: 778,
    39: 439, 40: 333, 41: 333, 42: 500, 43: 549, 44: 250, 45: 549,
    46: 250, 47: 278,
    48: 500, 49: 500, 50: 500, 51: 500, 52: 500, 53: 500, 54: 500,
    55: 500, 56: 500, 57: 500,
    58: 278, 59: 278, 60: 549, 61: 549, 62: 549, 63: 444, 64: 549,
    65: 722, 66: 667, 67: 722, 68: 612, 69: 611, 70: 763, 71: 603,
    72: 722, 73: 333, 74: 631, 75: 722, 76: 686, 77: 889, 78: 722,
    79: 722, 80: 768, 81: 741, 82: 556, 83: 592, 84: 611, 85: 690,
    86: 439, 87: 768, 88: 645, 89: 795, 90: 611,
    91: 333, 92: 863, 93: 333, 94: 658, 95: 500, 96: 500,
    97: 631, 98: 549, 99: 549, 100: 494, 101: 439, 102: 521, 103: 411,
    104: 603, 105: 329, 106: 603, 107: 549, 108: 549, 109: 576,
    110: 521, 111: 549, 112: 549, 113: 521, 114: 549, 115: 603,
    116: 439, 117: 576, 118: 713, 119: 686, 120: 493, 121: 686,
    122: 494, 123: 480, 124: 200, 125: 480, 126: 549,
}

# ZapfDingbats: code-keyed like Symbol (ornament glyph names a1..a191
# sit outside the AGL; raw-code fallback decode keeps ord(char) ==
# byte code).  Widths are the public Adobe Core-14 ZapfDingbats AFM
# advances at the AFM's own encoding (codes 32–126 and 161–254; 240 is
# unencoded) — the same numbers every open-source PDF library embeds.
# Codes 128–141 carry the 14 AFM-unencoded ornaments (C -1: a89–a96,
# a85–a88, a205, a206) at the positions the PDF spec's ZapfDingbats
# encoding assigns them (the same table pdf.js ships as
# ZapfDingbatsEncoding); the reference's zapfdingbats.fm has the same
# widths there (PdfToText.php FontMetrics parity).  The remaining
# unencoded codes (0–31, 127, 142–160, 255) fall back to the font
# default width like any unknown character — the reference pads them
# with the 746 .notdef filler instead, a divergence only for codes no
# writer emits.
_ZAPF_CODES: dict[int, int] = {
    32: 278, 33: 974, 34: 961, 35: 974, 36: 980, 37: 719, 38: 789,
    39: 790, 40: 791, 41: 690, 42: 960, 43: 939, 44: 549, 45: 855,
    46: 911, 47: 933, 48: 911, 49: 945, 50: 974, 51: 755, 52: 846,
    53: 762, 54: 761, 55: 571, 56: 677, 57: 763, 58: 760, 59: 759,
    60: 754, 61: 494, 62: 552, 63: 537, 64: 577, 65: 692, 66: 786,
    67: 788, 68: 788, 69: 790, 70: 793, 71: 794, 72: 816, 73: 823,
    74: 789, 75: 841, 76: 823, 77: 833, 78: 816, 79: 831, 80: 923,
    81: 744, 82: 723, 83: 749, 84: 790, 85: 792, 86: 695, 87: 776,
    88: 768, 89: 792, 90: 759, 91: 707, 92: 708, 93: 682, 94: 701,
    95: 826, 96: 815, 97: 789, 98: 789, 99: 707, 100: 687, 101: 696,
    102: 689, 103: 786, 104: 787, 105: 713, 106: 791, 107: 785,
    108: 791, 109: 873, 110: 761, 111: 762, 112: 762, 113: 759,
    114: 759, 115: 892, 116: 892, 117: 788, 118: 784, 119: 438,
    120: 138, 121: 277, 122: 415, 123: 392, 124: 392, 125: 668,
    126: 668,
    # PDF-spec supplemental positions for the AFM's unencoded
    # ornaments: 128=a89 129=a90 130=a93 131=a94 132=a91 133=a92
    # 134=a205 135=a85 136=a206 137=a86 138=a87 139=a88 140=a95 141=a96
    128: 390, 129: 390, 130: 317, 131: 317, 132: 276, 133: 276,
    134: 509, 135: 509, 136: 410, 137: 410, 138: 234, 139: 234,
    140: 334, 141: 334,
    161: 732, 162: 544, 163: 544, 164: 910, 165: 667, 166: 760,
    167: 760, 168: 776, 169: 595, 170: 694, 171: 626,
    # a100–a139: the circled/negative digits and sans serif numbers,
    # uniformly 788 in the AFM
    **{c: 788 for c in range(172, 212)},
    212: 894, 213: 838, 214: 1016, 215: 458, 216: 748, 217: 924,
    218: 748, 219: 918, 220: 927, 221: 928, 222: 928, 223: 834,
    224: 873, 225: 828, 226: 924, 227: 924, 228: 917, 229: 930,
    230: 931, 231: 463, 232: 883, 233: 836, 234: 836, 235: 867,
    236: 867, 237: 696, 238: 696, 239: 874, 241: 874, 242: 760,
    243: 946, 244: 771, 245: 865, 246: 771, 247: 888, 248: 967,
    249: 888, 250: 831, 251: 873, 252: 927, 253: 970, 254: 918,
}


def _char_table(afm: dict[str, int]) -> dict[int, float]:
    """Glyph-name table → decoded-character (codepoint) table via the
    repo's AGL map, plus the AFM composite rule: a precomposed Latin
    letter inherits its base glyph's advance."""
    from pdftotext_spark.core.glyphs import GLYPH_TO_UNICODE

    out: dict[int, float] = {}
    name_to_cp = GLYPH_TO_UNICODE
    for name, w in afm.items():
        cp = name_to_cp.get(name)
        if cp is not None:
            out[cp] = float(w)
    # composite rule: for Latin-1/Latin-A precomposed letters not named
    # above, use the base letter's width (canonical decomposition)
    for cp in list(range(0xC0, 0x100)) + list(range(0x100, 0x180)):
        if cp in out:
            continue
        decomp = unicodedata.decomposition(chr(cp))
        if not decomp or decomp.startswith("<"):
            continue
        base_cp = int(decomp.split()[0], 16)
        if base_cp == 0x69:
            # AFM composites build accented i on dotlessi, whose
            # advance differs from 'i' in Helvetica (278 vs 222)
            base_w = float(afm.get("dotlessi", afm.get("i", 0))) or None
        else:
            base_w = out.get(base_cp)
        if base_w is not None:
            out[cp] = base_w
    return out


@lru_cache(maxsize=None)
def _tables() -> dict[str, dict[int, float]]:
    courier = {cp: 600.0 for cp in range(0x20, 0x180)}
    return {
        "courier": courier,
        "courier-bold": courier,
        "courier-oblique": courier,
        "courier-boldoblique": courier,
        "helvetica": _char_table(_HELVETICA),
        "helvetica-bold": _char_table(_HELVETICA_BOLD),
        # obliques share their upright's metrics (public AFM fact)
        "helvetica-oblique": _char_table(_HELVETICA),
        "helvetica-boldoblique": _char_table(_HELVETICA_BOLD),
        "times-roman": _char_table(_TIMES_ROMAN),
        "times-bold": _char_table(_TIMES_BOLD),
        "times-italic": _char_table(_TIMES_ITALIC),
        "times-bolditalic": _char_table(_TIMES_BOLDITALIC),
        "symbol": {c: float(w) for c, w in _SYMBOL_CODES.items()},
        "zapfdingbats": {c: float(w) for c, w in _ZAPF_CODES.items()},
    }


# Aliases beyond the reference's exact names: metric-compatible
# substitutes generators commonly write for the same four families.
_ALIASES = {
    "arial": "helvetica",
    "arial-bold": "helvetica-bold",
    "arial-italic": "helvetica-oblique",
    "arial-bolditalic": "helvetica-boldoblique",
    "arialmt": "helvetica",
    "arial-boldmt": "helvetica-bold",
    "timesnewroman": "times-roman",
    "timesnewromanpsmt": "times-roman",
    "timesnewromanps-boldmt": "times-bold",
    "timesnewromanps-italicmt": "times-italic",
    "timesnewromanps-bolditalicmt": "times-bolditalic",
    "times": "times-roman",
    "times-new-roman": "times-roman",
    "couriernew": "courier",
    "couriernewpsmt": "courier",
    "couriernewps-boldmt": "courier-bold",
    "couriernewps-italicmt": "courier-oblique",
    "helvetica-italic": "helvetica-oblique",
}


def normalize_std_font_name(base_font: str) -> str | None:
    """``ABCDEF+Helvetica-Bold`` → ``helvetica-bold`` when the name
    resolves to a standard-14 face, else None (reference name match:
    PdfToText.php:6473–6478, subset prefix stripped + lowercased)."""
    if not base_font:
        return None
    name = base_font.rsplit("+", 1)[-1].lower()
    name = _ALIASES.get(name, name)
    return name if name in _tables() else None


def std_font_widths(base_font: str) -> dict[int, float] | None:
    """Decoded-character→width table for a standard-14 BaseFont name,
    or None when the name isn't one of the 14 (or their aliases)."""
    key = normalize_std_font_name(base_font)
    return _tables()[key] if key is not None else None
