"""Unit tests for the remaining §2 operator semantics: RTL reorder
(X1), header/footer stripping (P8/P10), template inlining (G5), raw
text-positioning operators (T4/T5), metadata edge cases."""

from pdftotext_spark.core.document import (
    ExtractOptions,
    extract_document,
    is_text_stream,
    strip_header_footer_spans,
)
from pdftotext_spark.core.fonts import FontTable
from pdftotext_spark.core.interpreter import extract_text_raw, tokenize
from pdftotext_spark.core.pagemap import is_page_header_or_footer
from pdftotext_spark.core.postprocess import parse_pdf_date, rtl_reorder
from pdftotext_spark.sources.pdfbuilder import PdfBuilder


def _raw(stream: bytes) -> str:
    return extract_text_raw(stream, FontTable())


# ------------------------------------------------------- interpreter ops


def test_quote_operator_advances_line():
    # ' = T* + show text (PdfToText.php:3897–3921)
    s = b"BT 14 TL 1 0 0 1 72 720 Tm (first) Tj (second) ' (third) ' ET"
    assert _raw(s) == "first\nsecond\nthird"


def test_tstar_with_leading():
    s = b"BT 12 TL 1 0 0 1 72 720 Tm (a) Tj T* (b) Tj T* (c) Tj ET"
    assert _raw(s) == "a\nb\nc"


def test_large_dy_emits_blank_lines():
    # Δy of 3 line-heights → ~3 newlines (PdfToText.php:3793)
    s = b"BT 12 TL 1 0 0 1 72 720 Tm (top) Tj 0 -36 Td (bottom) Tj ET"
    assert _raw(s) == "top\n\n\nbottom"


def test_same_line_continuation():
    # Td with dy=0 stays on the same line
    s = b"BT 1 0 0 1 72 720 Tm (left) Tj 100 0 Td (right) Tj ET"
    assert _raw(s) == "leftright"


def test_moving_up_one_newline():
    s = b"BT 1 0 0 1 72 100 Tm (low) Tj 0 200 Td (high) Tj ET"
    assert _raw(s) == "low\nhigh"


def test_tj_kerning_threshold():
    # -150 < MIN_SPACE_WIDTH=200 → no space; -300 → space
    # (PdfToText.php:1127, 5497–5517)
    s = b"BT 1 0 0 1 72 720 Tm [ (a) -150 (b) -300 (c) ] TJ ET"
    assert _raw(s) == "ab c"


def test_hex_string_tj():
    s = b"BT 1 0 0 1 72 720 Tm <48 65 6C6C 6F> Tj ET"
    assert _raw(s) == "Hello"


def test_nested_parens_in_literal():
    s = b"BT 1 0 0 1 72 720 Tm (outer (inner) tail) Tj ET"
    assert _raw(s) == "outer (inner) tail"


def test_inline_image_prestripped():
    s = (
        b"BT 1 0 0 1 72 720 Tm (before) Tj ET\n"
        b"BI /W 4 /H 4 ID \x00\xff\x28\x29garbage EI\n"
        b"BT 1 0 0 1 72 700 Tm (after) Tj ET"
    )
    out = _raw(s)
    assert "garbage" not in out
    # Δy=20 at size 12 → round(20/12)=2 newlines (documented heuristic)
    assert out == "before\n\nafter"


def test_tokenizer_skips_dicts():
    toks = list(tokenize(b"<< /Type /Font >> (keep) Tj"))
    assert toks == [("str", b"keep"), ("op", "Tj")]


def test_is_text_stream():
    assert is_text_stream(b"BT (x) Tj ET")
    assert not is_text_stream(b"0 0 100 100 re f")


# ------------------------------------------------------- header/footer


def test_pagination_object_detect():
    assert is_page_header_or_footer(b"<< /Type /Pagination /Subtype /Header >>")
    assert is_page_header_or_footer(b"<< /Attached [ /Top ] >>")
    assert not is_page_header_or_footer(b"<< /Type /Page >>")


def test_header_footer_span_strip():
    s = (
        b"BT (body) Tj ET "
        b"/Artifact << /Attached /Top /Type /Pagination >> BDC BT (HEADER) Tj ET EMC "
        b"BT (more body) Tj ET"
    )
    out = strip_header_footer_spans(s)
    assert b"HEADER" not in out
    assert b"body" in out and b"more body" in out


# --------------------------------------------------- template inlining G5


def test_form_xobject_do_inlining():
    """/TPL1 Do splices the form XObject's content
    (PdfToText.php:8293–8331)."""
    b = PdfBuilder()
    catalog, pages_node, font, page, content, tpl = (b.alloc() for _ in range(6))
    b.add(catalog, f"<< /Type /Catalog /Pages {pages_node} 0 R >>\n".encode())
    b.add(pages_node, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>\n".encode())
    b.add(font, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n")
    b.add(
        page,
        (
            f"<< /Type /Page /Parent {pages_node} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> "
            f"/XObject << /TPL1 {tpl} 0 R >> >> /Contents {content} 0 R >>\n"
        ).encode(),
    )
    b.add_stream(
        content,
        b"",
        b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (before) Tj ET /TPL1 Do "
        b"BT 1 0 0 1 72 680 Tm (after) Tj ET",
    )
    b.add_stream(
        tpl,
        b"/Subtype /Form /BBox [0 0 612 792]",
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (from template) Tj ET",
    )
    res = extract_document(b.build())
    assert "from template" in res.text
    assert res.text.index("before") < res.text.index("from template")
    assert "after" in res.text


# ------------------------------------------------------------------ RTL


def test_rtl_hebrew_run_reversed():
    # visual order in the PDF is reversed; rtl_reorder restores logical
    line = "שלום" + " hello"
    out = rtl_reorder(line)
    assert out.startswith("םולש")  # run reversed
    assert "hello" in out


def test_rtl_noop_for_latin():
    assert rtl_reorder("plain latin text") == "plain latin text"


# ------------------------------------------------------------- metadata


def test_pdf_date_variants():
    assert parse_pdf_date("D:20260101").startswith("2026-01-01T00:00:00")
    assert parse_pdf_date("D:20170509115932-02'00'").startswith("2017-05-09T11:59:32")
    assert parse_pdf_date("garbage") is None


def test_options_disable_header_footer_strip():
    s = (
        b"/Artifact << /Attached /Top >> BDC BT (HEADER) Tj ET EMC "
        b"BT (body) Tj ET"
    )
    kept = extract_text_raw(s, FontTable())
    assert "body" in kept  # raw interpreter itself doesn't strip spans


# ---------------------------------------------------- marker injection X5


def test_mark_text_like():
    """First fragment matching the regex binds its (font, size); all
    same-binding fragments get wrapped (PdfToText.php:2565–2573)."""
    from pdftotext_spark.sources import pdfbuilder as pb

    pdf = pb.simple_pdf([["Heading One", "body text", "Heading Two"]])
    res = extract_document(
        pdf,
        ExtractOptions(layout=True, markers=(("Heading", "<h>", "</h>"),)),
    )
    # all three lines share one font/size in this fixture, so all wrap
    assert "<h>Heading One</h>" in res.text
    assert "<h>Heading Two</h>" in res.text


def test_mark_text_like_no_match_is_noop():
    from pdftotext_spark.sources import pdfbuilder as pb

    pdf = pb.simple_pdf([["nothing to see"]])
    res = extract_document(
        pdf, ExtractOptions(layout=True, markers=(("ZZZ", "<m>", "</m>"),))
    )
    assert res.text == "nothing to see"


# ------------------------------------------------------ M5 statistics


def test_enhanced_statistics():
    from pdftotext_spark.sources import pdfbuilder as pb

    pdf = pb.simple_pdf([["one", "two", "three"]])
    res = extract_document(pdf, ExtractOptions(enhanced_statistics=True))
    assert res.stats["show_ops"] == 3  # three Tj
    assert res.stats["position_ops"] >= 3  # Tm + two Td
    assert res.stats["bt_et"] == 2
    assert res.stats["operands"] > 0
    assert res.stats["optimized_text_size"] <= res.stats["text_size"]
    # off by default
    assert extract_document(pdf).stats == {}


def test_repeat_separator_option():
    from pdftotext_spark.core.interpreter import extract_text_raw
    from pdftotext_spark.core.fonts import FontTable

    s = b"BT 1 0 0 1 72 720 Tm [ (a) -2500 (b) ] TJ ET"
    assert extract_text_raw(s, FontTable()) == "a b"
    assert (
        extract_text_raw(s, FontTable(), repeat_separator=True) == "a  b"
    )  # ⌊2500/1000⌋ = 2 separators


def test_time_budget_skips_remaining_pages():
    from pdftotext_spark.sources import pdfbuilder as pb

    pdf, goldens = pb.multipage_pdf(4)
    res = extract_document(pdf, ExtractOptions(max_seconds=1e-9))
    assert res.decode_failures >= 1
    assert res.n_pages < 4
    assert any("time budget" in r for r in res.failure_reasons)
    # generous budget extracts everything
    ok = extract_document(pdf, ExtractOptions(max_seconds=30.0))
    assert ok.pages == goldens and ok.decode_failures == 0


def test_simplify_unicode_option():
    """F13 unicode-to-ansi analog: ligatures/typographic chars → ASCII."""
    from pdftotext_spark.core.postprocess import simplify_to_ansi
    from pdftotext_spark.sources import pdfbuilder as pb

    assert simplify_to_ansi("ﬁnal — “quote”… café") == 'final - "quote"... café'
    pdf, _ = pb.tounicode_pdf("ﬁn—x", mode="bfchar")
    plain = extract_document(pdf)
    simplified = extract_document(pdf, ExtractOptions(simplify_unicode=True))
    assert plain.text == "ﬁn—x"
    assert simplified.text == "fin-x"


# ------------------------------------- fused-vs-token differential guards


def test_fused_raw_interpreter_matches_token_path():
    """The fused scan+interpret fast path must be byte-identical to the
    token-loop reference on the full operator battery."""
    from pdftotext_spark.core.interpreter import (
        _extract_text_raw_fused,
        _extract_text_raw_tokens,
    )

    battery = [
        b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (Hello) Tj ET",
        b"BT (a) Tj 0 -14 Td (b) Tj 0 -28 Td (c) Tj ET",
        b"BT [(ker) -250 (ned)] TJ ET",
        b"BT [(a) -50 (b) -1500 (c)] TJ ET",
        b"BT (line1) ' (line2) ' ET",
        b'BT 2 3 (aw ac quoted) " ET',
        b"BT /F9 7.5 Tf <48656C6C 6F> Tj ET",
        b"BT T* (x) Tj T* (y) Tj ET",
        b"BT 14 TL (p) ' (q) ' ET",
        b"BT /XX Do (t) Tj ET",
        b"BT ((nested) parens) Tj ET",
        b"BT [((nst) a) -300 (z)] TJ ET",
        b"BT [ [(inner)] (outer) ] TJ ET",
        b"BT << /Junk [)] >> (after) Tj ET",
        b"BT [ << /D [ ] >> (el) ] TJ ET",
        b"BT ] (stray) Tj ET",
        b"BT /F1 Tf (nosize) Tj ET",
        b"BT 12 Tf (noname) Tj ET",
        b"garbage \x01\x02 BT (ok) Tj ET trailing",
        b"BT (esc \\( paren \\n) Tj ET",
        b"BT <4 8> Tj ET",
        b"",
    ]
    for s in battery:
        assert _extract_text_raw_fused(s, FontTable()) == _extract_text_raw_tokens(
            s, FontTable()
        ), s


def test_fused_raw_interpreter_fuzz_equivalence():
    import random

    from pdftotext_spark.core.interpreter import (
        _extract_text_raw_fused,
        _extract_text_raw_tokens,
    )

    random.seed(7)
    alphabet = [
        b"BT", b"ET", b"(txt)", b"(a(b)c)", b"<414 2>", b"[", b"]",
        b"-300", b"12", b"/F1", b"Tf", b"Td", b"TD", b"Tm", b"Tj",
        b"TJ", b"'", b'"', b"T*", b"TL", b"Do", b"<<", b">>", b"q",
        b"Q", b"0.5", b"(x)",
    ]
    for _ in range(1500):
        s = b" ".join(random.choices(alphabet, k=random.randrange(1, 40)))
        assert _extract_text_raw_fused(s, FontTable()) == _extract_text_raw_tokens(
            s, FontTable()
        ), s


def test_find_based_object_scan_matches_regex():
    """_iter_objects (memmem-anchored) must agree with the original
    regex on builders, edge shapes and garbage fuzz."""
    import random

    from pdftotext_spark.core.objects import _OBJ_RE, _iter_objects
    from pdftotext_spark.sources import pdfbuilder as pb

    def ref(buf):
        return [(int(m.group(1)), m.group(3)) for m in _OBJ_RE.finditer(buf)]

    cases = [
        pb.simple_pdf([["hello world"]]),
        pb.simple_pdf([["x"]], stream_filter="FlateDecode"),
        pb.objstm_pdf("inside")[0],
        b"",
        b"no objects here",
        b"3 0 obj",
        b"endobj endobj",
        b"12 0 obj <<>> endobj 13 0 obj (x) endobj",
        b"xxobj 1 0 obj A endobj",
        b"9 obj A endobj",
        b"1 0 obj trailing without end",
        b"1  0\nobj\nbody\nendobj",
        b"obj endobj 2 1 obj ok endobj",
        b"7 0 objx not real endobj 8 0 obj real endobj",
    ]
    random.seed(3)
    toks = [
        b"obj", b"endobj", b" ", b"\n", b"12", b"0", b"3", b"<<", b">>",
        b"(s)", b"stream", b"endstream",
        bytes(random.randrange(256) for _ in range(5)),
    ]
    for _ in range(1500):
        cases.append(b"".join(random.choices(toks, k=random.randrange(0, 30))))
    for c in cases:
        assert list(_iter_objects(c)) == ref(c), c[:80]


def test_find_based_split_object_matches_regex():
    import random

    from pdftotext_spark.core.objects import _STREAM_RE, split_object

    def ref(body):
        sm = _STREAM_RE.search(body)
        if not sm:
            return body, None
        return body[: sm.start()], sm.group(1)

    random.seed(11)
    toks = [
        b"stream", b"endstream", b"\n", b"\r\n", b"\r", b"<<", b">>",
        b"/Length 5", b" ", b"DATA",
        bytes(random.randrange(256) for _ in range(4)),
    ]
    cases = [
        b"", b"stream", b"stream\nX\nendstream",
        b"<< >> stream\r\nBIN\r\nendstream",
        b"streamX stream\nok\nendstream", b"stream\rreal\nendstream",
        b"stream\nA endstreamB endstream", b"stream\nnoend",
        b"stream\n\r\nendstream", b"stream\n\nendstream",
        b"stream\n\rendstream",
    ]
    for _ in range(4000):
        cases.append(b"".join(random.choices(toks, k=random.randrange(0, 14))))
    for c in cases:
        assert split_object(c) == ref(c), c[:60]


def test_ignore_text_leading_option():
    """PDFOPT_IGNORE_TEXT_LEADING: TL/TD leading is ignored, so the
    accumulated y-trajectory (and therefore blank-line counts on a
    later absolute Tm) changes; fused and token paths must agree in
    BOTH settings."""
    from pdftotext_spark.core.fonts import FontTable
    from pdftotext_spark.core.interpreter import (
        _extract_text_raw_fused,
        _extract_text_raw_tokens,
    )

    # TL 100 then three T*: honored leading walks y down 300; ignored
    # leading walks only 3 x font size. The absolute Tm afterwards
    # yields different dy -> different blank-line runs.
    stream = (
        b"BT /F1 12 Tf 100 TL (a) Tj T* (b) Tj T* (c) Tj T* "
        b"1 0 0 1 0 -350 Tm (z) Tj ET"
    )
    ft = FontTable()
    honored_f = _extract_text_raw_fused(stream, ft)
    ignored_f = _extract_text_raw_fused(stream, ft, ignore_text_leading=True)
    assert honored_f != ignored_f
    honored_t = _extract_text_raw_tokens(stream, ft)
    ignored_t = _extract_text_raw_tokens(
        stream, ft, ignore_text_leading=True
    )
    assert honored_t == honored_f and ignored_t == ignored_f
    # ignored-leading run sees a much larger Tm drop -> more newlines
    assert ignored_f.count("\n") > honored_f.count("\n")


def test_global_deadline_skips_payloads():
    """MaxGlobalExecutionTime analog: an expired global deadline skips
    the payload as a recorded failure without parsing; a future
    deadline parses normally."""
    import time

    from pdftotext_spark.core.document import ExtractOptions, extract_document
    from pdftotext_spark.sources.pdfbuilder import simple_pdf

    buf = simple_pdf([["hello world"]])
    expired = ExtractOptions(global_deadline_epoch=time.time() - 1)
    res = extract_document(buf, expired)
    assert res.decode_failures == 1
    assert res.failure_reasons == ["global time budget exceeded"]
    assert res.text == "" and not res.pages

    live = ExtractOptions(global_deadline_epoch=time.time() + 3600)
    res2 = extract_document(buf, live)
    assert res2.decode_failures == 0
    assert "hello world" in "\n".join(res2.pages)
