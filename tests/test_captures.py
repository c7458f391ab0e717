"""Captures operator family (L5–L10) over the fragments table,
driven end-to-end from layout-mode PDF extraction."""

import pytest
from pyspark.sql import functions as F

from pdftotext_spark.operators import captures as cap
from pdftotext_spark.plans.pipeline import extract_fragments_df
from pdftotext_spark.sources import pdfbuilder as pb

pytestmark = pytest.mark.spark


def test_page_range_algebra():
    # reference syntax "1, $-9..$" with $ = page count (L7)
    assert cap.parse_page_range("1, 3..5", 10) == {1, 3, 4, 5}
    assert cap.parse_page_range("$", 7) == {7}
    assert cap.parse_page_range("$-2..$", 10) == {8, 9, 10}
    assert cap.parse_page_range("1, $-9..$", 10) == {1, 2, 3, 4, 5, 6, 7, 8, 9, 10}
    assert cap.parse_page_range("12..20", 10) == set()  # clamped
    with pytest.raises(ValueError):
        cap.parse_page_range("1; drop", 10)


def test_capture_xml_parse():
    xml = """
    <captures>
      <rectangle name="header" left="0" top="792" right="612" bottom="700" pages="1"/>
      <rectangle name="box" left="50" top="400" width="100" height="50"/>
      <lines name="table" top="600" height="20" count="3">
        <column name="qty" left="72" right="200"/>
        <column name="desc" left="201" right="500"/>
      </lines>
    </captures>
    """
    rects, lines = cap.parse_capture_xml(xml)
    assert [r.name for r in rects] == ["header", "box"]
    assert rects[1].right == 149.0 and rects[1].bottom == 351.0
    assert lines[0].count == 3 and len(lines[0].columns) == 2


@pytest.fixture(scope="module")
def fragments(spark):
    """Fragments from a two-page layout PDF: page text at y=720/706
    (two Td lines), known x=72 start."""
    pdf, _ = pb.multipage_pdf(2)
    payload = pdf.decode("latin-1")
    df = spark.createDataFrame(
        [("c0", 0, payload)], "conv_id string, turn_idx int, text string"
    )
    out = extract_fragments_df(df)
    out.cache()
    out.count()
    return out


def test_rectangle_capture(spark, fragments):
    # area covering the top line only (y=720, font height 12)
    areas = [cap.CaptureArea("topline", left=0, top=740, right=612, bottom=715)]
    got = cap.rectangle_capture(fragments, areas).orderBy("page").collect()
    assert [r.page for r in got] == [1, 2]
    assert got[0].captured_text == "Page 1 line one"
    assert got[1].captured_text == "Page 2 line one"
    assert got[0].shape == "topline"
    assert got[0].bbox_bottom >= 715 and got[0].bbox_top <= 740


def test_rectangle_capture_excludes_outside(spark, fragments):
    areas = [cap.CaptureArea("nothing", left=0, top=100, right=50, bottom=0)]
    assert cap.rectangle_capture(fragments, areas).count() == 0


def test_lines_capture_grid(spark, fragments):
    # two line bands of height 14 starting just above y=720 capture the
    # two text lines into line_no 0 and 1
    lc = cap.LinesCapture(
        "body", top=726, height=14, count=2, columns=(("col1", 0.0, 612.0),)
    )
    got = cap.lines_capture(fragments, lc).orderBy("page", "line_no").collect()
    assert [(r.page, r.line_no) for r in got] == [(1, 0), (1, 1), (2, 0), (2, 1)]
    assert got[0].cell_text == "Page 1 line one"
    assert got[1].cell_text == "Page 1 line two"
    assert got[0].capture_name == "body"


def test_captures_projection(spark, fragments):
    areas = [cap.CaptureArea("topline", left=0, top=740, right=612, bottom=715)]
    rect = cap.rectangle_capture(fragments, areas)
    proj = cap.captures_projection(rect).collect()
    assert len(proj) == 1
    m = proj[0].pages_map
    assert m[1] == "Page 1 line one" and m[2] == "Page 2 line one"
    assert proj[0].n_pages_hit == 2


def test_rectangle_capture_respects_page_ranges(spark, fragments):
    # same area, page-scoped: "1" hits page 1 only; "$" hits the last
    areas = [
        cap.CaptureArea("first_only", 0, 740, 612, 715, pages="1"),
        cap.CaptureArea("last_only", 0, 740, 612, 715, pages="$"),
        cap.CaptureArea("everything", 0, 740, 612, 715, pages="1..$"),
    ]
    got = cap.rectangle_capture(fragments, areas)
    rows = {(r.shape, r.page) for r in got.collect()}
    assert ("first_only", 1) in rows and ("first_only", 2) not in rows
    assert ("last_only", 2) in rows and ("last_only", 1) not in rows
    assert ("everything", 1) in rows and ("everything", 2) in rows


def test_reference_capture_xml_end_to_end(spark):
    """The reference's own sample-report.xml + sample-report.pdf driven
    through the DataFrame captures path: the page-1 Title rectangle
    must capture 'REPORT HEADER' and nothing on page 2."""
    from pathlib import Path

    ex = Path("/root/reference/examples/text-capture")
    if not ex.exists():
        pytest.skip("reference examples not available")
    xml = (ex / "sample-report.xml").read_text(encoding="utf-8-sig")
    rects, _lines = cap.parse_capture_xml(xml)
    payload = (ex / "sample-report.pdf").read_bytes()
    import base64

    df = spark.createDataFrame(
        [("r0", 0, "%B64%" + base64.b64encode(payload).decode())],
        "conv_id string, turn_idx int, text string",
    )
    frags = extract_fragments_df(df)
    got = cap.rectangle_capture(frags, rects).collect()
    assert len(got) == 1
    assert got[0].shape == "Title" and got[0].page == 1
    assert "REPORT HEADER" in got[0].captured_text


def test_reference_lines_capture_end_to_end(spark):
    """The reference's ReportLines lines-capture (page-1 spec, Column1
    spanning x 70..399) over the real sample-report.pdf: the four data
    rows L1C1..L4C3 land in consecutive line cells."""
    from pathlib import Path

    ex = Path("/root/reference/examples/text-capture")
    if not ex.exists():
        pytest.skip("reference examples not available")
    xml = (ex / "sample-report.xml").read_text(encoding="utf-8-sig")
    _rects, lines = cap.parse_capture_xml(xml)
    page1_spec = next(ln for ln in lines if ln.pages == "1")
    import base64

    payload = (ex / "sample-report.pdf").read_bytes()
    df = spark.createDataFrame(
        [("r0", 0, "%B64%" + base64.b64encode(payload).decode())],
        "conv_id string, turn_idx int, text string",
    )
    frags = extract_fragments_df(df)
    got = (
        cap.lines_capture(frags, page1_spec)
        .orderBy("line_no")
        .collect()
    )
    assert all(r.page == 1 for r in got)
    cells = [r.cell_text for r in got]
    joined = " | ".join(cells)
    for token in ("L1C1", "L2C1", "L3C1", "L4C1"):
        assert token in joined
