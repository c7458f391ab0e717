"""SHINGLE_SPAN configurability (VERDICT r3 §next #6).

The default 249-char prefix bound makes near-dup detection blind to
documents that differ only in their opening paragraph; the
SPARK_GRAFT_SHINGLE_SPAN override must widen BOTH the Spark operator
and its DuckDB oracle (they share the constant)."""

from __future__ import annotations

import importlib
import os

import duckdb
import pytest

pytestmark = pytest.mark.spark


def _write_docs(tmp_path, spark):
    # two docs: DISTINCT first 250 chars, IDENTICAL 1500-char tail —
    # a true near-dup pair that the default prefix bound cannot see
    tail = ("the shared body of the document continues here " * 40)[:1500]
    doc_a = ("alpha " * 50)[:250] + tail
    doc_b = ("omega " * 50)[:250] + tail
    df = spark.createDataFrame(
        [(1, doc_a, "s"), (2, doc_b, "s")], "doc_id long, text string, source string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _reload_dedup():
    from pdftotext_spark.operators import dedup

    return importlib.reload(dedup)


def test_default_span_blind_then_wide_span_catches(spark, tmp_path):
    sf_dir = _write_docs(tmp_path, spark)
    from pdftotext_spark.operators import dedup

    assert dedup.SHINGLE_SPAN == 249
    # blind: disjoint prefixes dominate the bounded shingle window
    assert dedup.minhash_lsh_pairs(spark, sf_dir).count() == 0

    os.environ["SPARK_GRAFT_SHINGLE_SPAN"] = "2000"
    try:
        wide = _reload_dedup()
        assert wide.SHINGLE_SPAN == 2000
        pairs = wide.minhash_lsh_pairs(spark, sf_dir).collect()
        assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}
        # the oracle string follows the same constant: DuckDB must see
        # the identical pair set on the same parquet
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        )
        orc = con.execute(wide.MINHASH_LSH_PAIRS_SQL).fetchall()
        assert {(a, b) for a, b, *_ in orc} == {(1, 2)}
        assert f"range(1, {2000 + 1})" in wide.MINHASH_LSH_PAIRS_SQL
    finally:
        del os.environ["SPARK_GRAFT_SHINGLE_SPAN"]
        restored = _reload_dedup()
        assert restored.SHINGLE_SPAN == 249
