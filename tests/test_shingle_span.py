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


def test_strip_duplicated_spans_constructed(spark, tmp_path):
    """Hand-checked ExactSubstr apply (the parity gate is blind to
    bugs implemented identically in both engines): two docs share
    exactly one 14-char segment; the merged duplicated island must be
    precisely that segment in each doc, and the rebuilt text must be
    the original minus the segment."""
    from pdftotext_spark.operators import dedup

    shared = "SHAREDSEGMENT!"  # 14 chars -> 7 duplicated 8-grams
    doc_a = "aaaaaa" + shared + "bbbbbb"
    doc_b = "cccccc" + shared + "dddddd"
    df = spark.createDataFrame(
        [(1, doc_a, "s"), (2, doc_b, "s")],
        "doc_id long, text string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.doc_id: r for r in dedup.strip_duplicated_spans(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[1].clean_text == "aaaaaabbbbbb"
    assert rows[2].clean_text == "ccccccdddddd"
    assert rows[1].removed_chars == len(shared) == rows[2].removed_chars

    # consistency invariant with the metric on the same fixture
    met = {
        r.doc_id: r.dup_chars
        for r in dedup.duplicated_span_fraction(spark, str(tmp_path)).collect()
    }
    assert met == {1: 14, 2: 14}


def test_strip_removed_equals_metric_dup_chars(spark):
    """Cross-operator invariant on the real corpus: the apply side
    removes exactly the chars the metric counts (same island algebra)."""
    from pdftotext_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    removed = {
        r.doc_id: r.removed_chars
        for r in dedup.strip_duplicated_spans(spark, sf).collect()
    }
    dup = {
        r.doc_id: r.dup_chars
        for r in dedup.duplicated_span_fraction(spark, sf).collect()
    }
    assert removed == dup
    assert sum(removed.values()) > 0


def test_dedup_keep_best_semantics(spark):
    """Hand-checked: exactly ONE kept doc per group, and it is the
    longest (doc_id-ascending tie-break) — the quality-argmax policy,
    not min-id."""
    from pdftotext_spark.operators import dedup

    rows = dedup.dedup_keep_best(spark, "/root/testdata/sf0.001").collect()
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r.group_id, []).append(r)
    multi = 0
    for members in groups.values():
        kept = [r for r in members if r.kept]
        assert len(kept) == 1
        best = max(members, key=lambda r: (r.n_chars, -r.doc_id))
        assert kept[0].doc_id == best.doc_id
        assert all(r.group_size == len(members) for r in members)
        if len(members) > 1:
            multi += 1
    assert multi > 0  # the corpus has real near-dup clusters


def test_pack_sequences_offsets_exact(spark):
    """Hand-checked: per-source running offsets are exact prefix sums
    in doc_id order and pack_id is the power-of-two floor division."""
    from pdftotext_spark.operators import textstats

    # sf0.01, where per-source token totals (~1.5k) exceed the
    # 256-token budget several times over — the splits assertion below
    # is non-trivial
    rows = textstats.pack_sequences(spark, "/root/testdata/sf0.01").collect()
    by_src: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        by_src.setdefault(r.source, []).append(r)
    n_packs = set()
    for src, members in by_src.items():
        off = 0
        for r in members:
            assert r.start_offset == off
            assert r.pack_id == off // textstats.PACK_BUDGET_TOKENS
            n_packs.add((src, r.pack_id))
            off += r.n_tokens
    assert len(n_packs) > len(by_src)  # budget actually splits sources


def test_dedup_keep_best_constructed(spark, tmp_path):
    """Constructed inputs (independent of the operator's own
    intermediates): A and B are near-dups (identical 249-char prefix),
    B is longer → only B kept from that cluster; unrelated C is its
    own singleton group and kept."""
    from pdftotext_spark.operators import dedup

    prefix = ("shared near duplicate prefix text " * 10)[:249]
    doc_a = prefix + " short tail"
    doc_b = prefix + " a much longer tail that makes B the best doc"
    doc_c = "completely unrelated content with its own distinct words here"
    df = spark.createDataFrame(
        [(1, doc_a, "s"), (2, doc_b, "s"), (3, doc_c, "s")],
        "doc_id long, text string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in dedup.dedup_keep_best(spark, str(tmp_path)).collect()}
    assert rows[1].group_id == rows[2].group_id == 1
    assert rows[1].group_size == rows[2].group_size == 2
    assert not rows[1].kept and rows[2].kept          # B is longer
    assert rows[3].group_id == 3 and rows[3].group_size == 1 and rows[3].kept
    assert rows[2].n_chars == len(doc_b)


def test_pack_sequences_constructed(spark, tmp_path):
    """Constructed inputs with hand-counted tokens: 100-token docs
    against the 256 budget pack as 0,0,0,1,1,1,2 by start offset."""
    from pdftotext_spark.operators import textstats

    assert textstats.PACK_BUDGET_TOKENS == 256
    doc = " ".join(["tok"] * 100)  # exactly 100 whitespace tokens
    df = spark.createDataFrame(
        [(i, doc, "s") for i in range(7)],
        "doc_id long, text string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = sorted(
        textstats.pack_sequences(spark, str(tmp_path)).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.n_tokens for r in rows] == [100] * 7
    assert [r.start_offset for r in rows] == [0, 100, 200, 300, 400, 500, 600]
    assert [r.pack_id for r in rows] == [0, 0, 0, 1, 1, 1, 2]
