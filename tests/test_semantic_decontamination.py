"""Constructed-geometry semantics + pure-Python third-engine replay
for the semantic decontamination family
(operators/similarity.py: semantic_decontamination{,_apply}).

The DuckDB value twin runs in test_oracle_parity; these tests exist
because the parity gate is blind to bugs implemented identically in
both engines — the replay here re-derives the md5 SRP planes, band
keys, strict left-to-right cosines, and the argmax rule from the
written spec, not from either engine's SQL.
"""

import hashlib
import math

import pytest
from pyspark.sql import Row

from pdftotext_spark.operators import similarity as S

pytestmark = pytest.mark.spark

DIM = S.SRP_DIM


def _frame(spark, vecs):
    """vecs: list of (vec_id, embedding list, label)."""
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in e], label=l) for i, e, l in vecs]
    )


def _unit(axis, scale=1.0):
    v = [0.0] * DIM
    v[axis] = scale
    return v


# ---------------------------------------------------------------- replay


def _py_planes():
    return [
        [
            int(hashlib.md5(f"{k}:{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
            for d in range(DIM)
        ]
        for k in range(S.SRP_PLANES)
    ]


def _py_srp(v, planes):
    out = 0
    for k, p in enumerate(planes):
        dot = 0.0
        for a, b in zip(v, p):
            dot += float(a) * float(b)
        if dot > 0:
            out += 1 << k
    return out


def _py_bands(srp):
    bits = S._SRP_BAND_BITS
    return [
        (i, (srp >> (i * bits)) & ((1 << bits) - 1)) for i in range(S.SRP_BANDS)
    ]


def _py_cos4(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    c = dot / (math.sqrt(na) * math.sqrt(nb))
    # SQL round(): half away from zero at 4dp
    return math.copysign(math.floor(abs(c) * 1e4 + 0.5) / 1e4, c)


def _py_semantic_decon(vecs):
    planes = _py_planes()
    srp = {i: _py_srp(e, planes) for i, e, _ in vecs}
    ev = [(i, e) for i, e, l in vecs if l == S.SEM_DECON_EVAL_LABEL]
    tr = [(i, e) for i, e, l in vecs if l != S.SEM_DECON_EVAL_LABEL]
    best = {}
    for ti, te in tr:
        tb = set(_py_bands(srp[ti]))
        for ei, ee in ev:
            if tb & set(_py_bands(srp[ei])):
                c = _py_cos4(te, ee)
                if c >= S.SEM_DECON_EPS:
                    cur = best.get(ti)
                    if cur is None or (c, -ei) > (cur[1], -cur[0]):
                        best[ti] = (ei, c)
    return {ti: (ei, c) for ti, (ei, c) in best.items()}


# ---------------------------------------------------------------- tests


def test_planted_geometry(spark):
    """Scaled copies of an eval vector are contaminated at cosine 1.0;
    the opposite direction and a weakly-similar vector are clean."""
    e = _unit(0)
    vecs = [
        (10, e, 0),                      # eval
        (1, _unit(0, 7.0), 3),           # same direction -> cosine 1.0
        (2, _unit(0, -1.0), 3),          # opposite -> cosine -1, clean
        (3, _unit(1), 3),                # orthogonal -> clean
    ]
    rep = {r.vec_id: r for r in S.semantic_decontamination_for(_frame(spark, vecs)).collect()}
    assert set(rep) == {1}
    assert rep[1].eval_vec_id == 10 and rep[1].cosine == 1.0


def test_argmax_prefers_highest_cosine_then_lowest_eval_id(spark):
    e = _unit(0)
    near = _unit(0)
    near[1] = 0.3  # cosine(near, e) < 1 but > eps, same orthant as e
    vecs = [
        (11, e, 0),
        (10, e, 0),        # identical eval twin: tie at 1.0 -> min id 10
        (12, near, 0),
        (1, _unit(0, 2.0), 5),
    ]
    rep = {r.vec_id: r for r in S.semantic_decontamination_for(_frame(spark, vecs)).collect()}
    assert rep[1].eval_vec_id == 10 and rep[1].cosine == 1.0


def test_apply_emits_every_train_row(spark):
    e = _unit(0)
    vecs = [
        (10, e, 0),
        (1, _unit(0, 2.0), 3),   # contaminated
        (2, _unit(1), 3),        # clean
        (3, _unit(0, -1.0), 4),  # clean
    ]
    rows = {r.vec_id: r for r in S.semantic_decontaminate_apply_for(_frame(spark, vecs)).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].contaminated and rows[1].eval_vec_id == 10
    assert not rows[2].contaminated and rows[2].eval_vec_id is None
    assert not rows[3].contaminated and rows[3].cosine is None


def test_pure_python_replay_randomized(spark):
    """Third-engine replay on a seeded pseudo-random corpus: band
    keys, cosine rounding, threshold, and argmax must all agree."""
    import random

    rng = random.Random(1234)
    vecs = []
    base = [rng.uniform(-1, 1) for _ in range(DIM)]
    for i in range(40):
        if i % 5 == 0:
            v = [rng.uniform(-1, 1) for _ in range(DIM)]
        else:
            # perturbed copies of base at varying strengths: a spread
            # of cross-set cosines above and below the threshold
            s = rng.uniform(0.0, 2.0)
            v = [b + s * rng.uniform(-1, 1) for b in base]
        vecs.append((i, v, 0 if i % 4 == 0 else 1 + i % 3))
    got = {
        r.vec_id: (r.eval_vec_id, r.cosine)
        for r in S.semantic_decontamination_for(_frame(spark, vecs)).collect()
    }
    assert got == _py_semantic_decon(vecs)
    # non-degenerate fixture: some contaminated, some clean
    n_train = sum(1 for _, _, l in vecs if l != 0)
    assert 0 < len(got) < n_train


def test_corpus_fixture_nondegenerate(spark, sf_dir):
    """Registration invariant: nonzero rows, non-constant cosine."""
    rows = S.semantic_decontamination(spark, sf_dir).collect()
    assert len(rows) > 0
    assert len({r.cosine for r in rows}) > 1
