"""Semantic tests for int8-quantized ANN: the quantizer pinned
against an independent pure-Python replay on constructed vectors, and
search quality pinned against the exact float top-k (the oracle gate
checks engine parity, not that quantization is a faithful compression
— these do)."""

import math

import pytest
from pyspark.sql import functions as F

from pdftotext_spark.operators import similarity

pytestmark = pytest.mark.spark

SF_DIR = "/root/testdata/sf0.01"


def _py_quantize(vec):
    mx = max((abs(float(x)) for x in vec), default=0.0)
    mx = max(mx, similarity._Q_EPS)
    return [math.floor(float(x) * 127.0 / mx + 0.5) for x in vec]


def test_quantizer_matches_pure_python_replay(spark):
    vecs = [
        (1, [0.5, -0.25, 0.125, 1.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: eps floor, all-zero q
        (3, [-1.0, 1.0, 0.0039, -0.0039]),  # sub-half-step values -> 0
        (4, [3.0, -7.5, 0.1, 0.3]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: list(r.q)
        for r in df.select(
            "vec_id",
            similarity._quantize_arr(
                F.col("embedding"), similarity._maxabs(F.col("embedding"))
            ).alias("q"),
        ).collect()
    }
    for vid, vec in vecs:
        assert got[vid] == _py_quantize(vec), vid
    assert got[2] == [0, 0, 0, 0]
    # extremes hit exactly ±127
    assert max(got[4]) <= 127 and min(got[4]) >= -127
    assert 127 in [abs(v) for v in got[4]]


def test_quantized_topk_tracks_exact_topk(spark):
    exact = [r.vec_id for r in similarity.cosine_topk(spark, SF_DIR).collect()]
    approx = similarity.ann_topk_quantized(spark, SF_DIR).collect()
    assert len(approx) == similarity.TOP_K
    # int8 on 64-dim unit-scale vectors loses ~1e-3 cosine: the top-k
    # sets should be nearly identical (measured 10/10 on this corpus;
    # pin >=8 to absorb future fixture changes)
    assert len(set(exact) & {r.vec_id for r in approx}) >= 8
    # ordering is by quantized cosine, descending
    sims = [r.qcos for r in approx]
    assert sims == sorted(sims, reverse=True)
    # reported quantization error stays inside the int8 error budget
    assert all(r.abs_err <= 0.01 for r in approx)
    assert all(-1.0 <= r.qcos <= 1.0 for r in approx)


def _unit(i, dim=8):
    v = [0.0] * dim
    v[i] = 1.0
    return v


def test_incremental_srp_verdict_classes(spark):
    """Constructed embeddings: identical vector in the corpus →
    corpus_dup (all SRP bands collide, cosine 1.0); batch twins →
    first keeps, second drops; near-orthogonal singleton → keep (the
    exact-cosine verify rejects any accidental band collision)."""
    schema = "vec_id long, embedding array<float>"
    base = [0.5, -0.25, 0.125, 1.0, -0.7, 0.3, 0.9, -0.1]
    corpus = spark.createDataFrame(
        [(1, base), (2, _unit(1))], schema
    )
    incoming = spark.createDataFrame(
        [
            (10, base),          # == corpus 1
            (11, _unit(2)),      # orthogonal to everything
            (13, _unit(7)),      # twin pair 13/15 (both new;
            (15, _unit(7)),      #  cos vs base = -0.06, vs unit(1) = 0)
        ],
        schema,
    )
    from pdftotext_spark.operators import similarity

    got = {
        r.vec_id: (r.verdict, r.n_corpus_dups, r.n_batch_prior)
        for r in similarity.incremental_srp_verdicts(
            corpus, incoming
        ).collect()
    }
    assert got[10] == ("corpus_dup", 1, 0)
    assert got[11] == ("keep", 0, 0)
    assert got[13][0] == "keep"
    assert got[15] == ("batch_dup", 0, 1)


def test_incremental_srp_registered_nonzero(spark):
    from pdftotext_spark.operators import similarity

    rows = similarity.dedup_incremental_srp(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and any(r.verdict != "keep" for r in rows)
    assert all(
        r.vec_id % similarity.INCREMENTAL_VEC_MOD
        == similarity.INCREMENTAL_VEC_REM
        for r in rows
    )


def test_cosine_batch_matches_single_query_scans(spark):
    """cosine_batch_topk: each query's rows equal cosine_scan_for run
    on that query alone over a corpus that keeps the other query rows
    as candidates — batching changes the scan count, never the math.
    Ranks are contiguous from 1 per query."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    batch = similarity.cosine_batch_topk(spark, sf).collect()
    assert {r.query_id for r in batch} == set(similarity.BATCH_QUERY_VEC_IDS)
    for qid in similarity.BATCH_QUERY_VEC_IDS:
        # rebase the single-query helper onto qid by swapping ids:
        # cosine_scan_for pins the query to QUERY_VEC_ID, so relabel
        # qid <-> QUERY_VEC_ID (cosines are id-independent)
        swap = emb.withColumn(
            "vec_id",
            F.when(F.col("vec_id") == qid, similarity.QUERY_VEC_ID)
            .when(F.col("vec_id") == similarity.QUERY_VEC_ID, qid)
            .otherwise(F.col("vec_id")),
        )
        # map swapped labels back: the label qid is ORIGINAL vec 0 (a
        # cross-query candidate); the query's own row never appears
        single = {
            (similarity.QUERY_VEC_ID if r.vec_id == qid else r.vec_id): r.cosine
            for r in similarity.cosine_scan_for(
                swap, similarity.COSINE_BATCH_TOPK
            ).collect()
        }
        got = {
            r.vec_id: r.cosine for r in batch if r.query_id == qid
        }
        assert got == single
        ranks = sorted(r.q_rank for r in batch if r.query_id == qid)
        assert ranks == list(range(1, similarity.COSINE_BATCH_TOPK + 1))
