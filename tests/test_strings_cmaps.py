"""Unit tests for string unescaping, names, glyphs and cmaps
(SURVEY.md §2.4, §2.6 T10/T12/T13)."""

from pdftotext_spark.core.cmaps import (
    EncodingMap,
    ToUnicodeCMap,
    base_encoding_char,
    is_character_map,
)
from pdftotext_spark.core.glyphs import glyph_to_char
from pdftotext_spark.core.strings import (
    decode_name,
    hex_string_bytes,
    text_string_to_unicode,
    unescape_literal,
)


def test_unescape_named_and_octal():
    assert unescape_literal(rb"a\(b\)c\\d") == b"a(b)c\\d"
    assert unescape_literal(rb"\110\145\154\154\157") == b"Hello"
    assert unescape_literal(rb"tab\there") == b"tab\there"
    # 1–2 digit octal
    assert unescape_literal(rb"\7Q") == b"\x07Q"
    # unknown escape keeps the char (PdfToText.php:790–900)
    assert unescape_literal(rb"\q") == b"q"


def test_unescape_line_continuation():
    assert unescape_literal(b"foo\\\nbar") == b"foobar"
    assert unescape_literal(b"foo\\\r\nbar") == b"foobar"


def test_hex_string_whitespace_and_odd_pad():
    assert hex_string_bytes(b"48 65 6C\n6C 6F") == b"Hello"
    assert hex_string_bytes(b"486") == b"\x48\x60"


def test_decode_name_hash_escape():
    assert decode_name(b"C2#5F0") == "C2_0"


def test_utf16_bom_detect():
    assert text_string_to_unicode("héllo".encode("utf-16")) == "héllo"
    assert text_string_to_unicode(b"plain") == "plain"


def test_glyph_names():
    assert glyph_to_char("eacute") == "é"
    assert glyph_to_char("uni20AC") == "€"
    assert glyph_to_char("fi") == "ﬁ"
    assert glyph_to_char("a") == "a"
    assert glyph_to_char("g70") == chr(70 + 29)  # /gNN +29 quirk
    assert glyph_to_char("a.sc") == "a"  # variant suffix strip
    assert glyph_to_char("nosuchglyph") == "?"


def test_glyph_names_wide_agl():
    # generated AGL repertoire (unicodedata-derived Latin + afii runs):
    # spot-check public glyphlist.txt rows across every generator
    from pdftotext_spark.core.glyphs import GLYPH_TO_UNICODE as G

    assert G["wgrave"] == 0x1E81 and G["Ygrave"] == 0x1EF2   # Welsh
    assert G["adotbelow"] == 0x1EA1 and G["uhorn"] == 0x1B0  # Vietnamese
    assert G["abreveacute"] == 0x1EAF                        # double accent
    assert G["hbar"] == 0x127 and G["Tbar"] == 0x166
    assert G["zerosuperior"] == 0x2070 and G["fourinferior"] == 0x2084
    # AGL divergences must keep their explicit (non-generated) values
    assert G["gcommaaccent"] == 0x123 and G["onesuperior"] == 0xB9
    assert G["afii57664"] == 0x5D0   # Hebrew alef
    assert G["afii57409"] == 0x621   # Arabic hamza
    assert G["afii57392"] == 0x660   # Arabic-Indic zero
    assert len(G) > 1000


def test_glyph_names_ligature_and_multi_hex():
    # AGL spec: f_f_i component ligatures; uni accepts concatenated
    # 4-digit groups; suffix strip composes with other forms
    assert glyph_to_char("f_f_i") == "ffi"
    assert glyph_to_char("uni00410042") == "AB"
    assert glyph_to_char("eacute.sc") == "é"
    assert glyph_to_char("uni0041.alt") == "A"
    # ADVICE r3: underscore-only / unresolvable-component names must
    # surface as UNKNOWN_GLYPH, never silently vanish as ''
    from pdftotext_spark.core.glyphs import UNKNOWN_GLYPH

    assert glyph_to_char("_") == UNKNOWN_GLYPH
    assert glyph_to_char("__") == UNKNOWN_GLYPH
    assert glyph_to_char("zzqq_zzqq") == UNKNOWN_GLYPH
    assert glyph_to_char("_f") == "f"  # leading underscore, one resolvable part


def test_generated_latin_names_match_unicodedata():
    # property: every generated Latin name round-trips through the
    # Unicode name it was derived from (sampled cross-section)
    import unicodedata

    from pdftotext_spark.core.glyphs import GLYPH_TO_UNICODE as G

    for name, want in [
        ("ndotbelow", "LATIN SMALL LETTER N WITH DOT BELOW"),
        ("Ocircumflexacute", "LATIN CAPITAL LETTER O WITH CIRCUMFLEX AND ACUTE"),
        ("etildebelow", "LATIN SMALL LETTER E WITH TILDE BELOW"),
        ("AEacute", "LATIN CAPITAL LETTER AE WITH ACUTE"),
    ]:
        assert G[name] == ord(unicodedata.lookup(want))


def test_cmap_parse_cache_identity_and_safety():
    # content-keyed parse cache: same bytes -> same (shared) object,
    # different bytes -> different; lookup memoization on a shared
    # instance stays deterministic
    from pdftotext_spark.core.cmaps import (
        parse_encoding_cached,
        parse_tounicode_cached,
    )

    body = (
        b"begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<41> <0042>\nendbfchar\nendcmap"
    )
    a = parse_tounicode_cached(body)
    b = parse_tounicode_cached(bytes(body))
    assert a is b and a.lookup(0x41) == "B"
    other = body.replace(b"<0042>", b"<0043>")
    assert parse_tounicode_cached(other) is not a
    assert parse_tounicode_cached(other).lookup(0x41) == "C"
    e1 = parse_encoding_cached(b"<< /BaseEncoding /WinAnsiEncoding >>")
    e2 = parse_encoding_cached(b"<< /BaseEncoding /WinAnsiEncoding >>")
    assert e1 is e2 and e1.base == "winansi"


def test_glyph_names_wide_agl_sample():
    # sampled sweep across the extended AGL families (round-2 widening)
    samples = {
        # Latin Extended (Central-European)
        "Aogonek": "Ą", "lcaron": "ľ", "Ohungarumlaut": "Ő",
        "scommaaccent": "ș", "Zdotaccent": "Ż", "dcroat": "đ",
        # Greek incl. the AGL Letterlike quirks
        "Gamma": "Γ", "Delta": "∆", "Omega": "Ω", "sigma1": "ς",
        "pi": "π", "alphatonos": "ά",
        # Cyrillic afii block incl. the Ё insertion
        "afii10017": "А", "afii10022": "Е", "afii10023": "Ё",
        "afii10024": "Ж", "afii10049": "Я", "afii10065": "а",
        "afii10071": "ё", "afii10097": "я", "afii10051": "Ђ",
        "afii10110": "ў",
        # math / symbols / superiors
        "summation": "∑", "notequal": "≠", "partialdiff": "∂",
        "greaterequal": "≥", "heart": "♥", "twosuperior": "²",
        "onethird": "⅓", "afii61352": "№",
    }
    for name, want in samples.items():
        assert glyph_to_char(name) == want, name


def test_bfchar_multi_target():
    # undocumented multi-target bfchar (PdfToText.php:6824–6860)
    cmap = ToUnicodeCMap.parse(
        b"begincodespacerange <00> <FF> endcodespacerange\n"
        b"beginbfchar <41> <0066 0069> endbfchar"
    )
    assert cmap.lookup(0x41) == "fi"


def test_bfrange_interval_and_promotion():
    cmap = ToUnicodeCMap.parse(
        b"beginbfrange <20> <7E> <0020> endbfrange"
    )
    assert cmap.lookup(0x41) == "A"
    assert 0x41 in cmap.direct  # promoted to direct map after first hit
    assert cmap.lookup(0x7F) is None


def test_bfrange_enumerated_form():
    cmap = ToUnicodeCMap.parse(
        b"beginbfrange <01> <03> [<0058> <0059> <005A>] endbfrange"
    )
    assert [cmap.lookup(i) for i in (1, 2, 3)] == ["X", "Y", "Z"]


def test_codespacerange_width():
    cmap = ToUnicodeCMap.parse(
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"beginbfchar <0041> <0042> endbfchar"
    )
    assert cmap.code_width == 2
    assert cmap.lookup(0x41) == "B"


def test_differences_map():
    enc = EncodingMap.parse(
        b"<< /BaseEncoding /WinAnsiEncoding /Differences [ 128 /eacute /uni20AC 200 /fl ] >>"
    )
    assert enc.base == "winansi"
    assert enc.lookup(128) == "é"
    assert enc.lookup(129) == "€"
    assert enc.lookup(200) == "ﬂ"
    assert enc.lookup(65) is None  # falls through to base encoding


def test_base_encodings():
    # WinAnsi 0x80–0x9F fixups (cp1252): 0x93 = left double quote
    assert base_encoding_char("winansi", 0x93) == "“"
    assert base_encoding_char("winansi", 0x80) == "€"
    # MacRoman upper half: 0x8E = é
    assert base_encoding_char("macroman", 0x8E) == "é"


def test_is_character_map():
    assert is_character_map(b"... beginbfchar ...")
    assert is_character_map(b"<< /Differences [1 /a] >>")
    assert not is_character_map(b"<< /Type /Page >>")


def test_pua_f0xx_quirk():
    """0xF0xx private-use fixup (F10, PdfToText.php:7592–7675):
    symbol-font bfchar targets in U+F020–F07E map back to ASCII."""
    cmap = ToUnicodeCMap.parse(
        b"beginbfchar\n<41> <F030>\n<42> <F041>\n<43> <E000>\nendbfchar"
    )
    assert cmap.lookup(0x41) == "0"
    assert cmap.lookup(0x42) == "A"
    assert cmap.lookup(0x43) == ""  # outside the quirk window: kept


def test_winansi_cyrillic_variant():
    """Cyrillic WinAnsi variant (PdfToText.php:6185-6186 gate,
    7349-7417 table): a subset BaseFont containing 'Cyr' swaps the
    cp1252 map for the replacement table — 0xC0-0xFF become А..я,
    curly quotes flatten, everything else is identity."""
    from pdftotext_spark.core.fonts import parse_font

    cyr = parse_font(
        1,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+NimbusCyr "
        b"/Encoding /WinAnsiEncoding >>",
    )
    assert cyr.encoding == "winansi-cyr"
    assert cyr.map_char(0xC0) == "А"  # А
    assert cyr.map_char(0xFF) == "я"  # я
    assert cyr.map_char(0x93) == '"' and cyr.map_char(0x94) == '"'
    assert cyr.map_char(0x41) == "A"       # identity outside the table
    assert cyr.map_char(0x80) == "\x80"    # NO cp1252 euro in the variant

    plain = parse_font(
        2,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+Nimbus "
        b"/Encoding /WinAnsiEncoding >>",
    )
    assert plain.encoding == "winansi"
    assert plain.map_char(0xC0) == "À"  # À (cp1252)
    assert plain.map_char(0x93) == "“"  # curly quote survives


def test_undocumented_pua_table_full():
    """Full 0xF0xx table (PdfToText.php:7592-7675): REVERSED alphabets
    plus punctuation and é/è — construction goldens per entry family,
    both at CMap-parse time and in the post-extraction fixup."""
    from pdftotext_spark.core.cmaps import (
        ADOBE_UNDOC_PUA,
        ToUnicodeCMap,
        _pua_fixup,
    )

    # reversed families: 0xF0F0-k -> '0'+k etc.
    assert ADOBE_UNDOC_PUA[0xF0F0] == ord("0")
    assert ADOBE_UNDOC_PUA[0xF0E7] == ord("9")
    assert ADOBE_UNDOC_PUA[0xF0DF] == ord("A")
    assert ADOBE_UNDOC_PUA[0xF0C6] == ord("Z")
    assert ADOBE_UNDOC_PUA[0xF0BF] == ord("a")
    assert ADOBE_UNDOC_PUA[0xF0A6] == ord("z")
    assert ADOBE_UNDOC_PUA[0xF037] == 0xE9  # é — NOT '7'
    assert ADOBE_UNDOC_PUA[0xF038] == 0xE8  # è

    # parse-time substitution: bfchar target + bfrange form-1 base
    cm = ToUnicodeCMap.parse(
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"beginbfchar\n<41> <F0F0>\n<42> <F037>\nendbfchar\n"
        b"beginbfrange\n<50> <52> <F0DF>\nendbfrange\n"
    )
    assert cm.lookup(0x41) == "0"
    assert cm.lookup(0x42) == "é"
    # base substituted to 'A', then spec increment per code
    assert [cm.lookup(c) for c in (0x50, 0x51, 0x52)] == ["A", "B", "C"]

    # fixup: table wins over the shift; shift still covers table-absent
    # printable codes; outside-range PUA untouched
    assert _pua_fixup("\uf037\uf030\uf0a6\uf1ff") == "é0z\uf1ff"
