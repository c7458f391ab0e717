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
