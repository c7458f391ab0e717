"""Semantic tests for top_duplicated_spans on constructed inputs with
known planted boilerplate (the blind-oracle rule)."""

import pytest

from pdftotext_spark.operators import dedup

pytestmark = pytest.mark.spark

# 40-char boilerplate planted verbatim in three docs; the rest of
# each doc is unique AND the characters adjacent to the boilerplate
# differ per doc, so no boundary-crossing 8-gram repeats and the
# merged island is exactly the planted string
BOILER = "COPYRIGHT NOTICE ALL RIGHTS RESERVED 42."
DOCS = [
    (1, f"alpha unique opening words herA{BOILER}Xtail one xxxx"),
    (2, f"{BOILER}Ysecond document distinct body entirely"),
    (3, f"third doc body before the noticZ{BOILER}"),
    (4, "completely unrelated fourth document with no repeats qqqq"),
]


def test_planted_boilerplate_tops_the_report(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = dedup.top_duplicated_spans_for(docs).collect()
    assert rows, "planted duplication must be reported"
    top = rows[0]
    # the top span is exactly the planted boilerplate (islands merge
    # the overlapping duplicated 8-grams back into the full string)
    assert top.excerpt == BOILER[: dedup._SPAN_EXCERPT_LEN]
    assert top.span_len == len(BOILER)
    assert top.n_docs == 3
    assert top.n_occ == 3
    assert top.total_dup_chars == 3 * len(BOILER)
    # the unique doc contributes nothing
    assert all(r.n_docs >= 2 or r.n_occ >= 2 for r in rows)


def test_ranking_is_by_total_duplicated_chars(spark):
    short = "SHORTDUP"  # exactly one 8-gram
    long_ = "LONG DUPLICATED SPAN WITH MANY CHARS INSIDE IT!"
    docs = spark.createDataFrame(
        [
            (1, f"{short} a1b2c3d4e5 {long_}"),
            (2, f"{long_} z9y8x7w6v5 {short}"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.top_duplicated_spans_for(docs).collect()
    assert rows[0].span_len == len(long_)
    assert rows[0].total_dup_chars > rows[-1].total_dup_chars or len(rows) == 1


def test_registered_query_nonzero(spark):
    rows = dedup.top_duplicated_spans(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= dedup.TOP_DUP_SPANS
    vals = [r.total_dup_chars for r in rows]
    assert vals == sorted(vals, reverse=True)
