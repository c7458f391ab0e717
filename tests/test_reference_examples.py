"""Integration tests against the reference's own shipped example PDFs
(real-world PDFs with Acrobat-generated golden text; SURVEY.md §5.2).

Goldens were produced by *Acrobat Reader → Save as text*
(examples/README.md), so layout details differ from any extractor —
the reference itself only eyeball-compares (example01/example.php).
We assert on normalized word-set overlap, which catches decode
regressions (cmap/Differences/Flate/fonts) without overfitting to
Acrobat line breaking. The text-capture golden is the reference's
debug dump with ``[x:..,y:..]`` coordinate prefixes — stripped before
comparison."""

import re
from pathlib import Path

import pytest

from pdftotext_spark.core.document import ExtractOptions, extract_document

EXAMPLES = Path("/root/reference/examples")

pytestmark = pytest.mark.skipif(
    not EXAMPLES.exists(), reason="reference examples not available"
)


def word_overlap(golden: str, extracted: str) -> float:
    gw = set(re.sub(r"\s+", " ", golden).split())
    ew = set(re.sub(r"\s+", " ", extracted).split())
    return len(gw & ew) / max(len(gw), 1)


@pytest.mark.parametrize(
    "example,min_overlap",
    [("example01", 0.95), ("example02", 1.0), ("example03", 0.95)],
)
def test_example_text_extraction(example, min_overlap):
    pdf = (EXAMPLES / example / "sample.pdf").read_bytes()
    golden = (EXAMPLES / example / "sample.txt").read_text(
        encoding="latin-1", errors="replace"
    )
    res = extract_document(pdf)
    assert res.decode_failures == 0
    assert res.n_pages >= 1
    assert word_overlap(golden, res.text) >= min_overlap


def test_text_capture_sample_content():
    """The /gNN +29 Differences quirk + ToUnicode-over-Differences
    priority, exercised by a real PrimoPDF file."""
    pdf = (EXAMPLES / "text-capture" / "sample-report.pdf").read_bytes()
    res = extract_document(pdf)
    assert res.decode_failures == 0
    assert res.n_pages == 2
    assert "REPORT HEADER" in res.text
    assert "Column1" in res.text and "Column3" in res.text
    for line, col in [(1, 1), (4, 3)]:
        assert f"L{line}C{col}" in res.text
    # golden (debug dump) word content matches once [x:..] prefixes go
    golden = (EXAMPLES / "text-capture" / "sample-report.txt").read_text(
        encoding="latin-1", errors="replace"
    )
    golden_words = re.sub(r"\[[^\]]*\]", " ", golden)
    assert word_overlap(golden_words, res.text) >= 0.9


def test_image_extraction_sample():
    pdf = (EXAMPLES / "image-extraction" / "sample.pdf").read_bytes()
    res = extract_document(pdf, ExtractOptions(want_images=True))
    assert res.n_images >= 1
    assert res.decode_failures == 0


def test_metadata_from_real_pdf():
    pdf = (EXAMPLES / "text-capture" / "sample-report.pdf").read_bytes()
    res = extract_document(pdf)
    assert "PrimoPDF" in res.metadata.get("Producer", "")
    assert res.metadata.get("CreationDate", "").startswith("2017-05-09")


def test_reference_capture_xml_parses():
    from pdftotext_spark.operators.captures import parse_capture_xml

    xml = (EXAMPLES / "text-capture" / "sample-report.xml").read_text(
        encoding="utf-8-sig"
    )
    rects, lines = parse_capture_xml(xml)
    assert [r.name for r in rects] == ["Title"]
    assert rects[0].pages == "1"
    assert rects[0].top == 820.0 and rects[0].bottom == 720.0
    assert [ln.name for ln in lines] == ["ReportLines", "ReportLines"]
    assert lines[0].pages == "1" and lines[1].pages == "2..$"
    assert lines[0].columns[0][0] == "Column1"
