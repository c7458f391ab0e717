"""Long-document fixture validation (VERDICT r5 → r6 #1).

Every r5 shingle-family tuning decision was made on ~300-char docs;
this suite measures the family on a PLANTED multi-KB corpus
(:mod:`pdftotext_spark.sources.longdocs_gen`) where every duplicate
relationship — and the exact ExactSubstr duplicated-char count per
document — is known by construction (collision-free md5 vocabulary).
The rate-curve *bench* lives in ``scripts/longdoc_bench.py``; these
tests pin correctness at realistic lengths."""

from __future__ import annotations

import importlib
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from pdftotext_spark.sources.longdocs_gen import make_longdocs

pytestmark = pytest.mark.spark

# shrunk long regime keeps the ExactSubstr window affordable in CI
# while staying an order of magnitude past the old 249-char cap
TEST_REGIMES = {"short": 300, "medium": 1500, "long": 6000}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("longdocs")
    truth = make_longdocs(str(out), scale=1, seed=13, regimes=TEST_REGIMES)
    return str(out), truth


def test_generator_deterministic_and_collision_free(tmp_path):
    t1 = make_longdocs(str(tmp_path / "a"), scale=1, seed=13, regimes=TEST_REGIMES)
    t2 = make_longdocs(str(tmp_path / "b"), scale=1, seed=13, regimes=TEST_REGIMES)
    assert t1.n_chars == t2.n_chars and t1.pairs == t2.pairs
    con = duckdb.connect()
    rows = {
        p: con.execute(
            "SELECT doc_id, md5(text) FROM "
            f"read_parquet('{tmp_path}/{p}/documents.parquet/*.parquet') "
            "ORDER BY doc_id"
        ).fetchall()
        for p in ("a", "b")
    }
    assert rows["a"] == rows["b"]
    # long regime docs are genuinely long (containment INNER docs are
    # deliberately ~1/6 of the regime target — exclude them)
    longs = [
        t1.n_chars[d]
        for d in t1.background
        if t1.regime[d] == "long"
    ]
    assert min(longs) > 4000
    # background docs share NO 8-gram with any other doc: the
    # all-positions duplicated-shingle scan must attribute them 0
    # (checked exactly in test_exactsubstr_truth below)


def test_exactsubstr_truth_exact_at_length(corpus, spark):
    """The strongest semantic pin of the round: on multi-KB docs the
    measured duplicated_span_fraction char counts equal the planted
    truth EXACTLY, for every document (background = 0, exact pairs =
    whole doc, near-dup/span/containment = planted shared length)."""
    sf, truth = corpus
    from pdftotext_spark.operators import dedup

    got = {
        r.doc_id: r.dup_chars
        for r in dedup.duplicated_span_fraction(spark, sf).collect()
    }
    assert got == truth.dup_chars
    # apply side removes exactly those chars (shared island algebra)
    removed = {
        r.doc_id: r.removed_chars
        for r in dedup.strip_duplicated_spans(spark, sf).collect()
    }
    assert removed == truth.dup_chars


def test_lsh_recall_at_length(corpus, spark):
    """Banded MinHash (4 bands × 2) on multi-KB docs: every exact pair
    collides, J=0.9 pairs are found at ≥ the analytic p=1-(1-J²)⁴
    floor, and collision-free background docs NEVER pair."""
    sf, truth = corpus
    from pdftotext_spark.operators import dedup

    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(spark, sf).collect()
    }
    exact = truth.pairs_of("exact")
    assert exact <= pairs
    hi = truth.pairs_of("neardup", j=0.9)
    assert len(hi & pairs) >= 0.8 * len(hi)
    bg_pairs = {
        p for p in pairs
        if p[0] in truth.background and p[1] in truth.background
    }
    assert not bg_pairs
    # span pairs (J≈0.11) sit below the banded operating point BY
    # DESIGN — they are the ExactSubstr/winnowing target, and must
    # not be recalled here at a rate suggesting the bands leak
    assert len(truth.pairs_of("span") & pairs) <= len(truth.pairs_of("span")) // 2


def test_containment_at_length(corpus, spark):
    """Every planted verbatim containment scores exactly 1.0 on the
    inner side at the default sampling rate (content-only keep rule:
    sampled(inner) ⊆ sampled(host))."""
    sf, truth = corpus
    from pdftotext_spark.operators import dedup

    got = {
        (r.doc_a, r.doc_b): r
        for r in dedup.containment_pairs(spark, sf).collect()
    }
    planted = truth.pairs_of("containment")
    assert planted <= set(got)
    for a, b in planted:  # a = inner (added first), b = host
        assert got[(a, b)].containment_a == 1.0


def test_winnowing_finds_span_pairs_at_length(corpus, spark):
    """Winnowing shared-fingerprint pairs recover the planted
    medium/long span pairs (shared spans ≥ ~290 chars → far beyond
    WINNOW_MIN_SHARED prints) that banded MinHash misses by design."""
    sf, truth = corpus
    from pdftotext_spark.operators import dedup

    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.winnowing_shared_pairs(spark, sf).collect()
    }
    want = truth.pairs_of("span", regime="medium") | truth.pairs_of(
        "span", regime="long"
    )
    assert want <= pairs
    bg_pairs = {
        p for p in pairs
        if p[0] in truth.background and p[1] in truth.background
    }
    assert not bg_pairs


def test_keep16_1_preserves_signal_at_length(corpus, spark):
    """The deployment recommendation for multi-KB corpora (KEEP16=1):
    at 1/16 sampling the long-regime J=0.9 pairs are still recalled
    and exact pairs still collide, while sampled shingle volume drops
    to ~1/4 of the default 4/16 — the cost/recall trade the 100 TB
    sizing note in dedup.py promises."""
    sf, truth = corpus
    from pdftotext_spark.operators import dedup

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    base_vol = dedup._shingles(docs, distinct=False).count()
    os.environ["SPARK_GRAFT_SHINGLE_KEEP16"] = "1"
    try:
        low = importlib.reload(dedup)
        assert low.SHINGLE_KEEP16 == 1
        vol = low._shingles(docs, distinct=False).count()
        assert 0.15 < vol / base_vol < 0.35
        pairs = {
            (r.doc_a, r.doc_b)
            for r in low.minhash_lsh_pairs(spark, sf).collect()
        }
        assert truth.pairs_of("exact") <= pairs
        hi_long = truth.pairs_of("neardup", regime="long", j=0.9)
        assert hi_long <= pairs
        # the oracle follows the lever on the same corpus
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet/*.parquet')"
        )
        orc = {
            (a, b)
            for a, b in con.execute(
                "SELECT doc_a, doc_b FROM ("
                + low.MINHASH_LSH_PAIRS_SQL
                + ")"
            ).fetchall()
        }
        assert orc == pairs
    finally:
        del os.environ["SPARK_GRAFT_SHINGLE_KEEP16"]
        restored = importlib.reload(dedup)
        assert restored.SHINGLE_KEEP16 == 4


def test_top_duplicated_spans_recovers_planted_spans(corpus, spark):
    """The boilerplate report at realistic lengths: restricted to the
    planted SPAN pairs + background, the only duplicated islands are
    the planted shared spans — each must surface as one report row
    with n_docs = n_occ = 2 and span_len = shared_chars + 2 (the
    flanking spaces are part of the island, the generator's own
    accounting)."""
    sf, truth = corpus
    from pdftotext_spark.operators import dedup

    span_pairs = truth.pairs_of("span")
    keep = {d for p in span_pairs for d in p} | set(truth.background)
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.col("doc_id").isin([int(d) for d in keep]))
        .select("doc_id", "text")
    )
    rows = dedup.top_duplicated_spans_for(docs).collect()
    expected = sorted(
        (truth.pairs[p]["shared_chars"] + 2, 2, 2) for p in span_pairs
    )
    got = sorted((r.span_len, r.n_docs, r.n_occ) for r in rows)
    assert got == expected
    assert all(r.total_dup_chars == r.span_len * r.n_occ for r in rows)
