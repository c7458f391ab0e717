"""Search / page-attribution API (X6) over extracted pages."""

import pytest
from pyspark.sql import functions as F

from pdftotext_spark.operators import search
from pdftotext_spark.sources import pdfbuilder as pb

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def pages(spark):
    pdf = pb.simple_pdf(
        [
            ["needle in line one", "no match here"],
            ["second page needle", "another needle here"],
        ]
    )
    df = spark.createDataFrame(
        [("c0", 0, pdf.decode("latin-1")), ("c0", 1, "plain text with needle")],
        "conv_id string, turn_idx int, text string",
    )
    out = search.extract_pages(df)
    out.cache()
    out.count()
    return out


def test_pages_table_shape(pages):
    rows = pages.orderBy("turn_idx", "page").collect()
    assert [(r.turn_idx, r.page) for r in rows] == [(0, 1), (0, 2), (1, 1)]
    assert rows[0].page_text.startswith("needle in line one")
    # offset spans tile the document text
    assert rows[0].start_offset == 0
    assert rows[1].start_offset == rows[0].end_offset + 2  # "\n" separator


def test_text_strpos(pages):
    hits = search.text_strpos(pages, "needle").orderBy("turn_idx", "page").collect()
    assert [(h.turn_idx, h.page) for h in hits] == [(0, 1), (0, 2), (1, 1)]
    assert hits[0].offsets == [1]
    assert len(hits[1].offsets) == 2  # two needles on page 2


def test_document_strpos_global_offsets(pages):
    doc = search.document_strpos(pages, "needle")
    rows = {(r.turn_idx, r.page): r for r in doc.collect()}
    p1 = rows[(0, 1)]
    p2 = rows[(0, 2)]
    assert p1.n_hits == 1 and p2.n_hits == 2
    # global offset of page-2 first needle lands inside page 2's span
    pg2 = pages.filter("turn_idx = 0 and page = 2").first()
    assert all(pg2.start_offset < o <= pg2.end_offset + 1 for o in p2.offsets)


def test_text_match_regex(pages):
    m = search.text_match(pages, "ne{2}dle").groupBy().count().first()[0]
    assert m == 4


def test_page_from_offset(pages):
    pg2 = pages.filter("turn_idx = 0 and page = 2").first()
    hit = search.page_from_offset(
        pages.filter("turn_idx = 0"), int(pg2.start_offset) + 3
    ).collect()
    assert [(h.turn_idx, h.page) for h in hit] == [(0, 2)]
