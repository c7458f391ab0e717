"""Streaming ingest gate scored by the trained LR quality model.

The modern counterpart of the hand-written panel gate
(:mod:`pdftotext_spark.streaming.curation` ``panels=True``): the
classifier is trained by the BATCH authority
(:mod:`pdftotext_spark.operators.quality_lr` — the corpus-level GD
chain) and its final weights row is materialized out-of-band; the
stream applies only the per-row feature extraction and the shared
sigmoid scoring expression. Same split as every gate in this repo
(near-dup store, benchmark shingles, mixture rates): corpus-level
state comes from batch, the stream evaluates row-local rules.

The scoring expression is the IDENTICAL ``_SIGMA_SQL`` string the
batch scorer evaluates (single-source helper discipline), over the
IDENTICAL ``_COUNTS_EXPR``/``_FEAT_SQL`` feature pipeline — a turn
scored at ingest and the same text scored by the batch job produce
the same integer micro score.

100 TB shape: the weights frame is ONE row (broadcast trivially);
the gate is a zero-shuffle projection per micro-batch — feature
extraction, sigmoid, threshold — with no joins against anything
corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdftotext_spark.operators.quality_lr import (
    _SIGMA_SQL,
    _lr_chain,
    features_over,
    LR_ROUNDS,
)

# ingest keep threshold in micro units; 0.5 = the classifier's own
# decision boundary (quality_lr_scores.predicted_clean)
LR_GATE_THRESHOLD = 500_000


def write_lr_weights(spark, sf_dir: str, out_dir: str) -> None:
    """Materialize the batch-trained final weights row for the stream
    gate. Refresh out-of-band when the reference corpus (and so the
    model) moves."""
    wts, _ = _lr_chain(spark, sf_dir)
    (
        wts.filter(F.col("round") == LR_ROUNDS)
        .drop("round")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def lr_score_expr() -> F.Column:
    """The per-row integer micro score, given the weight columns
    (w0m..w5m) already joined in — shared verbatim with the batch
    scorer."""
    return F.expr(
        f"CAST(round({_SIGMA_SQL} * 1000000e0, 0) AS BIGINT)"
    )


def lr_filter_batch(output_dir: str, weights_dir: str):
    """``foreachBatch`` body for the streaming quality gate: score
    every turn with the batch-trained model, keep turns at or above
    :data:`LR_GATE_THRESHOLD`, and write survivors (with their
    ``score_micro``) into a per-``batch_id`` partition (overwrite ⇒
    at-least-once replays replace, never double-append)."""

    def _fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        w = spark.read.parquet(weights_dir)
        # NULL text would score NULL and vanish from BOTH sides of
        # the threshold — make the policy explicit, as the sibling
        # gates do (streaming/sketches.py): null-text turns drop here
        feats = features_over(batch.filter(F.col("text").isNotNull()))
        scored = feats.join(F.broadcast(w)).withColumn(
            "score_micro", lr_score_expr()
        )
        (
            scored.filter(F.col("score_micro") >= LR_GATE_THRESHOLD)
            .select(*batch.columns, "score_micro")
            .write.mode("overwrite")
            .parquet(f"{output_dir}/batch_id={batch_id}")
        )

    return _fn
