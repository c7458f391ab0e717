"""End-to-end goldens by construction (SURVEY.md §5.2, FIXTURES.md §2):
synthetic PDFs where the expected text is known because we emitted the
content streams ourselves."""

import pytest

from pdftotext_spark.core.document import ExtractOptions, extract_document
from pdftotext_spark.core.dispatch import extract_payload, sniff_kind
from pdftotext_spark.sources import pdfbuilder as pb


def test_plain_tj():
    pdf = pb.simple_pdf([["Hello World", "Second line"]])
    res = extract_document(pdf)
    assert res.text == "Hello World\nSecond line"
    assert res.n_pages == 1
    assert res.decode_failures == 0


def test_escapes_in_literals():
    pdf = pb.simple_pdf([["(parens) and \\backslash"]])
    res = extract_document(pdf)
    assert res.text == "(parens) and \\backslash"


@pytest.mark.parametrize(
    "filt", [None, "FlateDecode", "LZWDecode", "ASCIIHexDecode", "ASCII85Decode"]
)
def test_stream_filters_end_to_end(filt):
    pdf = pb.simple_pdf([["Filtered body text", "line two"]], stream_filter=filt)
    res = extract_document(pdf)
    assert res.text == "Filtered body text\nline two"


def test_tj_array_kerning_spaces():
    # TJ with -300/1000em offsets between words → spaces (T11,
    # MIN_SPACE_WIDTH=200 per PdfToText.php:1127)
    pdf = pb.simple_pdf([["alpha beta gamma"]], use_tj_array=True)
    res = extract_document(pdf)
    assert res.text == "alpha beta gamma"


def test_multipage_order_and_separator():
    pdf, goldens = pb.multipage_pdf(3)
    res = extract_document(pdf)
    assert res.n_pages == 3
    assert res.pages == goldens
    assert res.text == "\n".join(goldens)
    # page offsets cover the joined text (X3)
    for (start, end), page in zip(res.page_offsets, res.pages):
        assert res.text[start : end + 1] == page


def test_tounicode_bfchar():
    pdf, golden = pb.tounicode_pdf("Ünïcödé!", mode="bfchar")
    assert extract_document(pdf).text == golden


def test_tounicode_bfrange():
    pdf, golden = pb.tounicode_pdf("Range decoding works", mode="bfrange")
    assert extract_document(pdf).text == golden


def test_identity_h_two_byte_cids():
    pdf, golden = pb.identity_h_pdf("CID text ✓")
    assert extract_document(pdf).text == golden


def test_identity_h_without_tounicode_default_table():
    # F11: CID font with NO /ToUnicode — glyph ids resolve through the
    # default MS-standard-order table (gid = codepoint - 29), not
    # chr(cid) mojibake (regression: pre-round-2 emitted '\x27\x48...')
    pdf, golden = pb.identity_h_no_tounicode_pdf("Dear Mr. Smith, (ref #42)")
    assert extract_document(pdf).text == golden


def test_identity_h_without_tounicode_unmapped_cid_drops():
    # unmapped CIDs decode to '' like the reference's UNKNOWN_CID path
    # (PdfToText.php:7866-7875): gid 0x3000 is outside every table
    from pdftotext_spark.core import cidmaps

    pdf, _ = pb.identity_h_no_tounicode_pdf("Hi")  # codes 002B 004C
    mangled = pdf.replace(b"<002B004C>", b"<002B3000004C>")
    assert mangled != pdf
    assert extract_document(mangled).text == "Hi"
    assert cidmaps.lookup_cid_map("NOSUCH+Font").lookup(0x3000) == ""


def test_identity_h_variant_override_cascade():
    # per-font override table: registered for the subset prefix, found
    # via the most-specific-first cascade (PdfToText.php:7794-7840)
    from pdftotext_spark.core import cidmaps

    cidmaps.register_cid_map(
        "ZYXWVU",
        plain={1: "A", 2: "B", 3: "C"},
        alt={0: {1: "Á"}},  # ALT_CID prefix: 0 then 1 composes Á
    )
    try:
        assert cidmaps.variant_candidates("ZYXWVU+Weird-Font") == [
            "ZYXWVU+Weird-Font",
            "ZYXWVU+Weird",
            "ZYXWVU",
        ]
        pdf, _ = pb.identity_h_no_tounicode_pdf("x", base_font="ZYXWVU+Weird-Font")
        # codes: 1, 2, (0,1) prefix pair, 3 → "AB" + "Á" + "C"
        mangled = pdf.replace(b"<005B>", b"<00010002000000010003>")  # 'x' = gid 0x5B
        assert mangled != pdf
        pdf = mangled
        assert extract_document(pdf).text == "ABÁC"
    finally:
        cidmaps.clear_registry()


def test_identity_h_japan1_ordering_table():
    # F11 CJK: Identity-H + /CIDSystemInfo /Ordering (Japan1) and NO
    # /ToUnicode — CIDs resolve through the public Adobe-Japan1 subset
    # table instead of degrading to ''
    text = "日本語のテキスト、ひらがなとカタカナと漢字。ASCII mixed in!"
    pdf, golden = pb.identity_h_japan1_pdf(text)
    res = extract_document(pdf)
    assert res.text == golden
    assert res.decode_failures == 0


def test_adobe_japan1_public_anchors():
    # pin the well-known public CID anchors the table derivation rests
    # on (Adobe H / UniJIS-UCS2-H CMap data + stdlib euc_jp layout)
    from pdftotext_spark.core.cjk_cid import adobe_japan1_subset

    t = adobe_japan1_subset().plain
    assert t[1] == " " and t[94] == "}"       # proportional Latin run
    assert t[61] == "¥" and t[95] == "‾"      # JIS-Roman swaps
    # ADVICE r3: the supplemental pair pinned by HARDCODED CIDs from
    # the public UniJIS-UCS2-H cidranges (not via the repo's own
    # reverse map): <005C> 97 (backslash), <007E> 96 (tilde) — the
    # CMap splits the ASCII run <0020>-<005B>→1.. / <005D>-<007D>→62..
    # precisely around these two substitutions
    assert t[96] == "~"
    assert t[97] == "\\"
    assert t[633] == "　"                  # full-width space
    assert t[843] == "あ" and t[842] == "ぁ"   # hiragana base
    assert t[925] == "ァ"                      # katakana base
    assert t[790] == "Ａ" and t[780] == "０"   # full-width alnum
    assert t[1125] == "亜"                     # first level-1 kanji
    assert t[4089] == "腕"                     # last level-1 (count 2965)
    assert t[4090] == "弌"                     # first level-2 kanji
    assert t[4090 + 3389] == "熙"              # last level-2 (count 3390)
    assert 1126 not in (0,) and t.get(99) is None  # outside subset → ''


def test_japan1_variant_override_beats_ordering():
    # cascade order parity (PdfToText.php:7794-7840): a per-font
    # variant override outranks the ordering table
    from pdftotext_spark.core.document import ExtractOptions

    pdf, _ = pb.identity_h_japan1_pdf("あ")  # CID 843
    opts = ExtractOptions(cid_tables=(("QWERAS", {843: "Z"}, {}),))
    assert extract_document(pdf, opts).text == "Z"
    assert extract_document(pdf).text == "あ"


def test_cid_tables_option_scoped_per_call():
    # ADVICE r02: opts.cid_tables must be scoped to the one extract
    # call — no leak into the process-global cidmaps registry, so a
    # later extraction of the same payload WITHOUT the option degrades
    from pdftotext_spark.core import cidmaps
    from pdftotext_spark.core.document import ExtractOptions

    pdf, _ = pb.identity_h_no_tounicode_pdf("x", base_font="SCOPED+Fake")
    pdf = pdf.replace(b"<005B>", b"<000100020003>")
    opts = ExtractOptions(cid_tables=(("SCOPED", {1: "A", 2: "B", 3: "C"}, {}),))
    assert extract_document(pdf, opts).text == "ABC"
    # same payload, no option: unmapped CIDs drop to '' again
    assert extract_document(pdf).text == ""
    # and the module registry was never touched
    assert cidmaps.lookup_cid_map("SCOPED+Fake").lookup(1) == ""


def test_alt_pending_cleared_by_non_cid_resolution():
    # ADVICE r02: an ALT_CID prefix followed by a code that resolves
    # via the ToUnicode cmap (partial-ToUnicode font) must NOT leave
    # the pending prefix armed for a later unrelated CID
    from pdftotext_spark.core import cidmaps
    from pdftotext_spark.core.cmaps import ToUnicodeCMap
    from pdftotext_spark.core.fonts import Font

    font = Font(1, base_font="ALTP+F", cid=True, encoding="cid")
    font._cid_overrides = cidmaps.build_override_map(
        (("ALTP", {5: "e", 9: "x"}, {0: {5: "é", 9: "ẍ"}}),)
    )
    cmap = ToUnicodeCMap()
    cmap.code_width = 2
    cmap.direct = {7: "Z"}  # partial: only code 7 is mapped
    font.cmap = cmap
    # prefix 0 arms the alt table; code 7 resolves via the cmap and
    # must discharge it; code 9 then takes the PLAIN entry 'x', not the
    # accent sub-table's 'ẍ'
    assert font.map_char(0) == ""
    assert font.map_char(7) == "Z"
    assert font.map_char(9) == "x"
    # intact behavior: prefix + alt-mapped code still composes
    assert font.map_char(0) == ""
    assert font.map_char(5) == "é"


def test_options_from_json_roundtrip():
    # the deployable job's --options carrier: JSON string keys coerce
    # back to int CID codes; unknown fields fail loudly
    import pytest

    from pdftotext_spark.core.document import options_from_json

    opts = options_from_json(
        {
            "layout": True,
            "max_pages": 2,
            "cid_tables": [["VARX", {"1": "A"}, {"0": {"1": "Á"}}]],
            "markers": [["foo", "<", ">"]],
        }
    )
    assert opts.layout and opts.max_pages == 2
    assert opts.cid_tables == (("VARX", {1: "A"}, {0: {1: "Á"}}),)
    assert opts.markers == (("foo", "<", ">"),)
    with pytest.raises(TypeError):
        options_from_json({"not_a_field": 1})


def test_differences_encoding():
    pdf, golden = pb.differences_pdf()
    assert extract_document(pdf).text == golden


def test_objstm_compound_objects():
    pdf, golden = pb.objstm_pdf("Inside an object stream")
    res = extract_document(pdf)
    assert res.text == golden
    assert res.decode_failures == 0


def test_encrypted_marked_undecodable():
    res = extract_document(pb.encrypted_pdf())
    assert res.encrypted
    assert res.decode_failures >= 1
    assert res.text == ""


def test_broken_stream_is_metric_not_crash():
    pdf = pb.simple_pdf([["good text"]], stream_filter="FlateDecode")
    # corrupt the flate body: flip bytes after the stream keyword
    i = pdf.index(b"stream\n") + 7
    broken = pdf[:i] + b"\xff\x00\xff\x00" + pdf[i + 4 :]
    res = extract_document(broken)
    assert res.decode_failures >= 1


def test_metadata_extraction():
    pdf = pb.simple_pdf(
        [["body"]],
        metadata={
            "Author": "Ada Lovelace",
            "Title": "Notes",
            "CreationDate": "D:20260101120000Z",
        },
    )
    res = extract_document(pdf)
    assert res.metadata["Author"] == "Ada Lovelace"
    assert res.metadata["Title"] == "Notes"
    assert res.metadata["CreationDate"].startswith("2026-01-01T12:00:00")


def test_max_pages_selection():
    pdf, goldens = pb.multipage_pdf(4)
    first2 = extract_document(pdf, ExtractOptions(max_pages=2))
    assert first2.pages == goldens[:2]
    last2 = extract_document(pdf, ExtractOptions(max_pages=-2))
    assert last2.pages == goldens[-2:]


def test_layout_mode_matches_raw_for_simple_page():
    pdf = pb.simple_pdf([["First line", "Second line"]])
    raw = extract_document(pdf)
    lay = extract_document(pdf, ExtractOptions(layout=True))
    assert lay.text == raw.text
    assert len(lay.fragments) == 2
    f0, f1 = sorted(lay.fragments, key=lambda f: f.seq)
    assert f0.y > f1.y  # second line is lower on the page


def test_dehyphenation_option():
    pdf = pb.simple_pdf([["hyphen-", "ation joined"]])
    res = extract_document(pdf, ExtractOptions(no_hyphenated_words=True))
    assert res.text == "hyphenation joined"


def test_sniff_and_dispatch():
    pdf = pb.simple_pdf([["dispatch me"]])
    ascii_payload = pdf.decode("latin-1")
    assert sniff_kind(ascii_payload) == "pdf"
    assert extract_payload(ascii_payload).text == "dispatch me"

    import base64

    b64 = "%B64%" + base64.b64encode(pb.simple_pdf([["binary route"]], stream_filter="FlateDecode")).decode()
    assert sniff_kind(b64) == "pdf-b64"
    assert extract_payload(b64).text == "binary route"

    assert sniff_kind("just words") == "plain"
    assert extract_payload("just words").text == "just words"


def test_deep_header_pdf_routes_to_pdf():
    # ADVICE r02: a valid PDF behind >1 KiB of leading junk must reach
    # the PDF parser (find_header tolerates arbitrarily deep headers),
    # not fall through to the HTML/plain probes — in all three routes:
    # verbatim string, bare b64, and gzip-wrapped b64
    import base64
    import gzip

    junk = b"X" * 2048
    pdf = junk + pb.simple_pdf([["deep header"]])
    assert sniff_kind(pdf.decode("latin-1")) == "pdf"
    assert extract_payload(pdf.decode("latin-1")).text == "deep header"

    pdf_bin = junk + pb.simple_pdf([["deep binary"]], stream_filter="FlateDecode")
    b64 = "%B64%" + base64.b64encode(pdf_bin).decode()
    res = extract_payload(b64)
    assert (res.kind, res.text) == ("pdf-b64", "deep binary")

    gz = "%B64%" + base64.b64encode(gzip.compress(pdf_bin)).decode()
    res = extract_payload(gz)
    assert (res.kind, res.text) == ("pdf-b64", "deep binary")


def test_dispatch_never_raises_on_garbage():
    res = extract_payload("%PDF-1.4 then total garbage \x01\x02")
    assert res.decode_failures >= 0  # no exception; text may be empty
    res2 = extract_payload("%B64%!!!notbase64???")
    assert res2.text == ""


def test_winansi_high_bytes_end_to_end():
    """WinAnsi font: bytes 0x80–0x9F decode through the cp1252 fixups
    (F9) — curly quotes, euro, em-dash."""
    from pdftotext_spark.sources.pdfbuilder import PdfBuilder

    b = PdfBuilder()
    catalog, pages_node, font, page, content = (b.alloc() for _ in range(5))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(font, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\n")
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    # \x93quoted\x94 \x80 100 \x97 dash
    b.add_stream(
        content, b"",
        b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (\x93quoted\x94 \x80 \x97) Tj ET",
    )
    res = extract_document(b.build())
    assert res.text == "“quoted” € —"


def test_macroman_high_bytes_end_to_end():
    from pdftotext_spark.sources.pdfbuilder import PdfBuilder

    b = PdfBuilder()
    catalog, pages_node, font, page, content = (b.alloc() for _ in range(5))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(font, b"<< /Type /Font /Subtype /Type1 /BaseFont /Times /Encoding /MacRomanEncoding >>\n")
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    b.add_stream(content, b"", b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (caf\x8e) Tj ET")
    res = extract_document(b.build())
    assert res.text == "café"


def test_header_footer_content_object_excluded():
    """A /Type/Pagination content object on the page is dropped from
    page text when ignore_headers_and_footers (P8, default ON) and
    kept when the option is off."""
    from pdftotext_spark.sources.pdfbuilder import PdfBuilder

    b = PdfBuilder()
    catalog, pages_node, font, page, body_c, hdr_c = (b.alloc() for _ in range(6))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(font, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n")
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> "
            f"/Contents [{body_c} 0 R {hdr_c} 0 R] >>\n"
        ).encode(),
    )
    b.add_stream(body_c, b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (body text) Tj ET")
    b.add_stream(
        hdr_c,
        b"/Type /Pagination /Subtype /Header",
        b"BT /F1 9 Tf 1 0 0 1 72 780 Tm (RUNNING HEADER) Tj ET",
    )
    pdf = b.build()
    default = extract_document(pdf)
    assert "body text" in default.text and "RUNNING HEADER" not in default.text
    kept = extract_document(pdf, ExtractOptions(ignore_headers_and_footers=False))
    assert "RUNNING HEADER" in kept.text


def test_identity_v_and_baseencoding_variants():
    # reference parity (PdfToText.php:6165): the Identity detection is
    # case-insensitive, accepts /BaseEncoding, and we extend to the
    # vertical -V form (same CID decode semantics)
    pdf, golden = pb.identity_h_japan1_pdf("縦書きテスト")
    for old, new in [
        (b"/Encoding /Identity-H", b"/Encoding /Identity-V"),
        (b"/Encoding /Identity-H", b"/BaseEncoding /Identity-H"),
    ]:
        mutated = pdf.replace(old, new)
        assert mutated != pdf
        assert extract_document(mutated).text == golden


def test_plain_text_mentioning_pdf_header_stays_plain():
    # code-review r3: a conversational payload that merely MENTIONS
    # '%PDF-' deep in the text must not be eaten by the PDF parser
    chatter = "y" * 1100 + " the magic header is %PDF-1.4 somewhere deep"
    assert sniff_kind(chatter) == "plain"
    assert extract_payload(chatter).text == chatter
    # with the real object markers present, deep routing still works
    deep = b"X" * 2048 + pb.simple_pdf([["still a pdf"]])
    assert extract_payload(deep.decode("latin-1")).text == "still a pdf"


def test_quoted_pdf_markup_falls_back_to_plain():
    """ADVICE r3 (dispatch deep-probe misroute): a conversational turn
    QUOTING PDF markup — header + object markers, but no parseable
    document — must keep its text (plain fallback + metric), while a
    genuinely corrupt real PDF must stay an empty pdf result."""
    import base64

    from pdftotext_spark.core.dispatch import B64_SENTINEL

    # string payload quoting markup near the head: parse is empty ->
    # plain fallback preserves the full turn text
    chat = (
        "user: my file begins %PDF-1.4 then has 1 0 obj ... endobj, "
        "can you explain xref tables? " + "context " * 200
    )
    res = extract_payload(chat)
    assert res.kind == "plain"
    assert res.text == chat
    assert "fell back to plain" in res.failure_reasons[-1]

    # same conversation base64-wrapped (printable bytes): also restored
    b64 = B64_SENTINEL + base64.b64encode(chat.encode()).decode()
    res_b = extract_payload(b64)
    assert res_b.kind == "plain"
    assert res_b.text == chat

    # review r4: NON-ASCII chat (UTF-8 multibyte ≥50% high bytes) must
    # survive too — the textual gate runs on the DECODED string
    ru = (
        "пользователь: файл начинается с %PDF-1.4, затем 1 0 obj ... "
        "endobj, объясни таблицы xref? " + "контекст " * 150
    )
    res_ru = extract_payload(B64_SENTINEL + base64.b64encode(ru.encode()).decode())
    assert res_ru.kind == "plain"
    assert res_ru.text == ru

    # binary garbage carrying the markers stays an empty pdf-b64 result
    # (mojibake must NOT become 'text')
    garbage = B64_SENTINEL + base64.b64encode(
        b"%PDF- junk 1 0 obj endobj" + bytes(range(256)) * 16
    ).decode()
    res_g = extract_payload(garbage)
    assert res_g.kind == "pdf-b64"
    assert res_g.text == ""

    # an honest header-at-offset-0 PDF that fails completely keeps the
    # empty pdf result + decode metric (no text invented)
    pdf = pb.simple_pdf([["good"]], stream_filter="FlateDecode")
    i = pdf.index(b"stream\n") + 7
    broken = (pdf[:i] + b"\xff\x00\xff\x00" + pdf[i + 4 :]).decode("latin-1")
    res_p = extract_payload(broken)
    assert res_p.kind == "pdf"
    assert res_p.decode_failures >= 1
    assert res_p.text == ""


def test_junk_prefixed_ascii_pdf_source_not_emitted_as_plain():
    """ADVICE r4: a junk-prefixed but mostly-ASCII REAL pdf whose parse
    comes up empty (no page tree) must NOT fall back to plain text —
    that would inject raw PDF markup into the corpus. Density of
    structural tokens separates it from the prose-quoting case above."""
    junk = "NOISE " * 5
    fake = (
        junk
        + "%PDF-1.4\n"
        + "".join(
            f"{i} 0 obj\n<< /Length 0 >>\nstream\nendstream\nendobj\n"
            for i in range(1, 8)
        )
        + "xref\n0 8\ntrailer\n<< /Size 8 >>\nstartxref\n0\n%%EOF\n"
    )
    res = extract_payload(fake)
    assert res.kind == "pdf"
    assert res.text == "" and res.n_pages == 0
    assert any("fallback rejected" in r for r in res.failure_reasons)

    # bytes-path twin through the deep probe (>1 KiB of junk ahead of
    # the header routes via _maybe_plain_fallback_bytes)
    import base64

    from pdftotext_spark.core.dispatch import B64_SENTINEL

    deep = ("x" * 2048 + fake).encode()
    res_b = extract_payload(B64_SENTINEL + base64.b64encode(deep).decode())
    assert res_b.kind == "pdf-b64"
    assert res_b.text == ""
    assert any("fallback rejected" in r for r in res_b.failure_reasons)

    # review r5: a LONG prose prefix must not hide the document body
    # from the density window (it anchors at the header, not the head)
    long_prefix = ("some preceding discussion text " * 200) + fake
    res_l = extract_payload(long_prefix)
    assert res_l.text == ""
    assert any("fallback rejected" in r for r in res_l.failure_reasons)


def test_prose_discussing_streams_with_quote_stays_plain():
    """Review r5: bare 'stream' is common English — prose using it
    several times around a short PDF quote must keep its text (the
    ADVICE r3 guarantee), not trip the source-density gate."""
    chat = (
        "user: my parser reads a stream of events; each stream chunk "
        "maps to a stream window. My file header says %PDF-1.7 and "
        "then 1 0 obj ... endobj — why does the xref parse fail? "
        + "more context " * 150
    )
    res = extract_payload(chat)
    assert res.kind == "plain"
    assert res.text == chat


def test_winansi_cyr_variant_end_to_end():
    """Full-path integration for the Cyrillic WinAnsi variant (r4):
    a subset BaseFont containing 'Cyr' drives the replacement table
    through the complete parse→interpret→decode pipeline."""
    from pdftotext_spark.sources.pdfbuilder import PdfBuilder

    b = PdfBuilder()
    catalog, pages_node, font, page, content = (b.alloc() for _ in range(5))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(
        font,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+NimbusCyr "
        b"/Encoding /WinAnsiEncoding >>\n",
    )
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> "
            f"/Contents {content} 0 R >>\n"
        ).encode(),
    )
    # bytes 0xCC 0xE8 0xF0 = Мир in the variant table; 'ok ' identity
    stream = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (ok \xcc\xe8\xf0) Tj ET"
    b.add_stream(content, b"", stream, "FlateDecode")
    res = extract_document(b.build())
    assert res.text == "ok Мир"
    assert res.decode_failures == 0


def test_type3_fontmatrix_widths_end_to_end():
    """Full-path integration for Type3 /FontMatrix width scaling (r4):
    glyph-space widths scale into layout fragments via the matrix."""
    from pdftotext_spark.core.document import ExtractOptions
    from pdftotext_spark.sources.pdfbuilder import PdfBuilder

    b = PdfBuilder()
    catalog, pages_node, font, page, content = (b.alloc() for _ in range(5))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(
        font,
        b"<< /Type /Font /Subtype /Type3 /BaseFont /T3 "
        b"/FontMatrix [0.01 0 0 0.01 0 0] "
        b"/FirstChar 65 /Widths [ 50 90 ] >>\n",
    )
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> "
            f"/Contents {content} 0 R >>\n"
        ).encode(),
    )
    stream = b"BT /F1 10 Tf 1 0 0 1 72 720 Tm (AA) Tj 1 0 0 1 72 700 Tm (BB) Tj ET"
    b.add_stream(content, b"", stream, "FlateDecode")
    res = extract_document(
        b.build(), ExtractOptions(layout=True, want_fragments=True)
    )
    frags = {f.text: f for f in res.fragments}
    # width_em = w * 0.01 * 1000: A=500, B=900 per glyph at size 10
    assert frags["AA"].width == pytest.approx(2 * 500 * 10 / 1000.0)
    assert frags["BB"].width == pytest.approx(2 * 900 * 10 / 1000.0)


def test_mixed_fonts_one_page_integration():
    """Integration golden: one page mixing a Japan1 Identity-H CID
    font (no ToUnicode), a WinAnsi font, and a /Differences font —
    per-fragment font switching through the full cascade in a single
    content stream."""
    from pdftotext_spark.core.cjk_cid import adobe_japan1_reverse
    from pdftotext_spark.sources.pdfbuilder import PdfBuilder, escape_literal

    rev = adobe_japan1_reverse()
    jp = "日本語テスト"
    jp_hex = "".join(f"{rev[c]:04X}" for c in jp)

    b = PdfBuilder()
    catalog, pages_node, f_jp, f_jp_desc, f_win, f_diff, encdict, page, content = (
        b.alloc() for _ in range(9)
    )
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(
        f_jp,
        (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /MIXED+Mincho "
            f"/Encoding /Identity-H /DescendantFonts [{f_jp_desc} 0 R] >>\n"
        ).encode(),
    )
    b.add(
        f_jp_desc,
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /MIXED+Mincho "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
        b"/Supplement 6 >> >>\n",
    )
    b.add(
        f_win,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helv "
        b"/Encoding /WinAnsiEncoding >>\n",
    )
    b.add(
        f_diff,
        f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding {encdict} 0 R >>\n".encode(),
    )
    b.add(
        encdict,
        b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 128 /eacute /uni20AC ] >>\n",
    )
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /FJ {f_jp} 0 R /FW {f_win} 0 R "
            f"/FD {f_diff} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    win_text = "caf" + chr(0xE9)  # é via cp1252 high byte
    stream = (
        f"BT /FJ 12 Tf 1 0 0 1 72 720 Tm <{jp_hex}> Tj "
        f"/FW 12 Tf ({escape_literal(' then ')}) Tj "
        f"/FW 12 Tf ({win_text}) Tj "
        "/FD 12 Tf (\x80\x81) Tj ET"
    ).encode("latin-1")
    b.add_stream(content, b"", stream, "FlateDecode")
    res = extract_document(b.build())
    assert res.text == jp + " then caféé€"
    assert res.decode_failures == 0


def test_prose_pdf_mention_cannot_shadow_real_document():
    """Review r5 pass 2: a prose '%PDF-' mention ahead of the real
    junk-prefixed document must not anchor the density window away
    from the body — every header occurrence is probed."""
    prose = (
        "user: my file header says %PDF-1.7 and I wonder about it. "
        + "filler discussion text " * 200  # > 4096 chars of padding
    )
    body = (
        "JUNKJUNK%PDF-1.4\n"
        + "".join(
            f"{i} 0 obj\n<< /Length 0 >>\nstream\nendstream\nendobj\n"
            for i in range(1, 8)
        )
        + "xref\n0 8\ntrailer\n<< /Size 8 >>\nstartxref\n0\n%%EOF\n"
    )
    assert len(prose) > 4096
    res = extract_payload(prose + body)
    assert res.text == ""
    assert any("fallback rejected" in r for r in res.failure_reasons)
