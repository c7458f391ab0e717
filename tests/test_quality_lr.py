"""Constructed-input semantics for the in-Spark LR quality
classifier (operators/quality_lr.py): a pure-Python replay of the
full training chain — counts, micro features, 8 rounds of full-batch
GD with half-up micro rounding — on the real fixture (the third
engine the DuckDB-parity blindness can't fool), plus the learning
properties the model must show. The DuckDB value twin runs in
test_oracle_parity."""

import math

import pytest

from pdftotext_spark.operators import prose, quality_lr

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def _rh(x: float) -> int:
    """SQL round(x, 0) half-away-from-zero on the double's EXACT
    binary value — floor(x + 0.5) silently differs on the
    0.49999999999999994 class (x + 0.5 rounds up to 1.0 in binary);
    Decimal sees the true value, matching Spark's BigDecimal HALF_UP
    and DuckDB."""
    import decimal

    return int(
        decimal.Decimal(x).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )


def _py_counts(text: str) -> dict:
    toks = [t for t in text.split(" ") if t != ""]
    low = [t for t in text.lower().split(" ") if t != ""]
    return {
        "n_chars": len(text),
        "nl_cnt": text.count("\n"),
        "dot_cnt": text.count("."),
        "up_cnt": sum(1 for c in text if "A" <= c <= "Z"),
        "n_tok": len(toks),
        "stop_cnt": sum(1 for t in low if t in quality_lr.LR_STOPWORDS),
        "sum_wl": sum(len(t) for t in toks),
    }


def _py_feats(c: dict) -> list[int]:
    nt = max(c["n_tok"], 1)
    return [
        _rh(min(c["nl_cnt"], 20) * 1.0 / 20.0 * 1e6),
        _rh(min(c["dot_cnt"] * 1.0 / nt, 1.0) * 1e6),
        _rh(c["stop_cnt"] * 1.0 / nt * 1e6),
        _rh(min(c["sum_wl"] * 1.0 / nt / 10.0, 1.0) * 1e6),
        _rh(min(c["up_cnt"] * 1.0 / max(c["n_chars"], 1) * 10.0, 1.0) * 1e6),
    ]


def _py_train(examples: list[tuple[int, list[int]]]) -> list[list[int]]:
    """examples: (label, [f1m..f5m]); returns weight rows 0..LR_ROUNDS."""
    w = [0] * 6
    hist = [list(w)]
    n = len(examples)
    lr = 4.0
    for _ in range(quality_lr.LR_ROUNDS):
        g = [0] * 6
        for label, f in examples:
            z = (
                w[0] * 1.0
                + (
                    w[1] * 1.0 * f[0]
                    + w[2] * 1.0 * f[1]
                    + w[3] * 1.0 * f[2]
                    + w[4] * 1.0 * f[3]
                    + w[5] * 1.0 * f[4]
                )
                / 1e6
            ) / 1e6
            sig = 1.0 / (1.0 + math.exp(-z))
            for k in range(6):
                xk = 1e6 if k == 0 else f[k - 1]
                g[k] += _rh((label * 1.0 - sig) * xk)
        w = [
            w[k] + _rh(lr * (g[k] * 1.0 / n) / 1e6 * 1e6)
            for k in range(6)
        ]
        hist.append(list(w))
    return hist


def _py_examples(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    raw = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    pro = {
        r.doc_id: r.text
        for r in prose.prose_frame(docs).select("doc_id", "text").collect()
    }
    ex = []
    for d, t in raw.items():
        ex.append((int(d) * 2, 0, _py_feats(_py_counts(t))))
    for d, t in pro.items():
        ex.append((int(d) * 2 + 1, 1, _py_feats(_py_counts(t))))
    return sorted(ex)


def test_lr_feature_replay(spark):
    got = {
        r.ex_id: (r.label, [r.f1m, r.f2m, r.f3m, r.f4m, r.f5m])
        for r in quality_lr.lr_features_for(
            spark.read.parquet(f"{SF}/documents.parquet")
        ).collect()
    }
    exp = {e: (l, f) for e, l, f in _py_examples(spark)}
    assert got == exp and len(got) == 2 * 500  # every doc, both renderings


def test_lr_training_replay(spark):
    """The full 8-round GD chain replays bit-for-bit in pure Python
    (weights are integer micro-units rounded every update, so drift
    cannot accumulate across rounds)."""
    exp_hist = _py_train([(l, f) for _, l, f in _py_examples(spark)])
    got = {
        r["round"]: [r.w0m, r.w1m, r.w2m, r.w3m, r.w4m, r.w5m]
        for r in quality_lr.quality_lr_train(spark, SF).collect()
    }
    assert got == {r: w for r, w in enumerate(exp_hist)}


def test_lr_learns_the_separating_features(spark):
    """Learning properties: the newline feature (prose always has
    newlines, raw never does) must carry the largest positive weight;
    the bias must go negative (raw majority of the z-range); weights
    move monotonically while the classes remain separable; held-out
    accuracy is high and scores are non-degenerate."""
    wts = {
        r["round"]: r for r in quality_lr.quality_lr_train(spark, SF).collect()
    }
    final = wts[quality_lr.LR_ROUNDS]
    assert final.w1m == max(
        final.w1m, final.w2m, final.w3m, final.w4m, final.w5m
    )
    assert final.w1m > 0 and final.w0m < 0
    for r in range(1, quality_lr.LR_ROUNDS + 1):
        assert wts[r].w1m > wts[r - 1].w1m
    scores = quality_lr.quality_lr_scores(spark, SF).collect()
    acc = sum(1 for r in scores if r.correct) / len(scores)
    assert acc >= 0.95
    uniq = {r.score_micro for r in scores}
    assert len(uniq) > 100  # continuous score, not a binary echo


def test_auc_midranks_and_replay(spark):
    """auc_for: midrank tie handling is exact — a constructed frame
    with ties reproduces the hand-computed Mann-Whitney AUC — and the
    fixture AUC separates perfectly (every prose score above every
    raw score)."""
    from pyspark.sql import Row

    # scores: pos {30, 20, 20}, neg {20, 10}
    # doubled midranks over sorted [10,20,20,20,30]: 10->2; the three
    # 20s share (2*2 + 3 - 1) = 6; 30 -> 10
    # sum pos r2 = 6 + 6 + 10 = 22; AUC = (11 - 6) / 6 = 0.833333
    rows = [Row(label=1, score_micro=30), Row(label=1, score_micro=20),
            Row(label=1, score_micro=20), Row(label=0, score_micro=20),
            Row(label=0, score_micro=10)]
    got = quality_lr.auc_for(spark.createDataFrame(rows)).collect()[0]
    assert (got.n_pos, got.n_neg, got.r2_pos, got.auc_micro) == (
        3, 2, 22, 833333
    )
    # single-class input: AUC undefined -> explicit NULL, counts kept
    one = quality_lr.auc_for(
        spark.createDataFrame([Row(label=1, score_micro=7)] * 3)
    ).collect()[0]
    assert (one.n_pos, one.n_neg, one.auc_micro) == (3, 0, None)
    fix = quality_lr.quality_lr_auc(spark, SF).collect()[0]
    assert (fix.n_pos, fix.n_neg) == (500, 500)
    assert fix.auc_micro == 1_000_000  # perfect separation, pinned
    # r2_pos depends on every individual rank (does NOT saturate):
    # with perfect separation positives hold ranks 501..1000 tie-free
    # here, so 2*sum(501..1000) = 750500*2
    assert fix.r2_pos > 0 and fix.r2_pos == 2 * sum(range(501, 1001))


def test_streaming_gate_scores_equal_batch_scorer(spark, tmp_path):
    """Coherence pin for the streaming LR gate: a turn scored at
    ingest equals the batch scorer's score for the same text under
    the same weights — the gate composes the IDENTICAL count/feature/
    sigmoid expressions. Prose-rendered turns pass the 0.5 gate, raw
    turns fail it (the training separation carries over); replayed
    micro-batches overwrite."""
    from pyspark.sql import Row

    from pdftotext_spark.streaming.quality_lr import (
        LR_GATE_THRESHOLD,
        lr_filter_batch,
        write_lr_weights,
    )

    wdir = str(tmp_path / "weights")
    out = str(tmp_path / "out")
    write_lr_weights(spark, SF, wdir)
    w = spark.read.parquet(wdir).collect()[0]

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    raw = [(f"c{r.doc_id}", 0, r.text) for r in docs.collect()]
    pro = [
        (f"p{r.doc_id}", 1, r.text)
        for r in prose.prose_frame(docs).collect()
    ]
    batch = spark.createDataFrame(
        raw + pro, "conv_id string, turn_idx int, text string"
    )
    fn = lr_filter_batch(out, wdir)
    fn(batch, 0)
    got = {
        (r.conv_id, r.turn_idx): r.score_micro
        for r in spark.read.parquet(f"{out}/batch_id=0").collect()
    }
    # replay the score in pure Python with the materialized weights
    wv = [w.w0m, w.w1m, w.w2m, w.w3m, w.w4m, w.w5m]
    survivors = {}
    for c, t, text in raw + pro:
        f = _py_feats(_py_counts(text))
        z = (
            wv[0] * 1.0
            + sum(wv[k + 1] * 1.0 * f[k] for k in range(5)) / 1e6
        ) / 1e6
        score = _rh(1.0 / (1.0 + math.exp(-z)) * 1e6)
        if score >= LR_GATE_THRESHOLD:
            survivors[(c, t)] = score
    assert got == survivors
    # the separation carries over: every prose turn kept, no raw turn
    assert all(c.startswith("p") for c, _ in got)
    assert sum(1 for c, _ in got if c.startswith("p")) == len(pro)
    fn(batch, 0)  # replay: overwrite, not append
    again = spark.read.parquet(f"{out}/batch_id=0").count()
    assert again == len(got)
