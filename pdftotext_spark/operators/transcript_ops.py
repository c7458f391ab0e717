"""Transcript-level training-data operators over the *extracted*
turns table (EXTRACT_SCHEMA): turn dedup and conversation quality —
the post-extraction stages of a web-scale pipeline.

All built-in expressions; the only shuffles are the dedup groupBy (on
a 32-byte digest) and the per-conversation rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_turns_exact(extracted: DataFrame) -> DataFrame:
    """Exact cross-conversation turn dedup on the extracted text
    digest: keeps the first occurrence by (conv_id, turn_idx) and
    reports duplicate multiplicity. Empty turns are never deduped
    (an empty extraction is not a duplicate of another empty one in
    any useful sense)."""
    nonempty = extracted.filter(F.length("extracted_text") > 0)
    w_key = F.md5("extracted_text")
    ranked = nonempty.withColumn("content_md5", w_key)
    firsts = (
        ranked.groupBy("content_md5")
        .agg(
            F.min(F.struct("conv_id", "turn_idx")).alias("first_turn"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select(
            "content_md5",
            F.col("first_turn.conv_id").alias("conv_id"),
            F.col("first_turn.turn_idx").alias("turn_idx"),
            "n_copies",
        )
    )
    return ranked.join(firsts.select("content_md5", "n_copies"), "content_md5").join(
        firsts.select(
            "content_md5",
            F.col("conv_id").alias("keep_conv_id"),
            F.col("turn_idx").alias("keep_turn_idx"),
        ),
        "content_md5",
    ).filter(
        (F.col("conv_id") == F.col("keep_conv_id"))
        & (F.col("turn_idx") == F.col("keep_turn_idx"))
    ).drop("keep_conv_id", "keep_turn_idx")


def conversation_quality(extracted: DataFrame) -> DataFrame:
    """Per-conversation quality rollup: turn counts by payload kind,
    decode-failure rate, extracted-char stats — the filter inputs a
    training pipeline thresholds on."""
    return (
        extracted.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum("decode_failures").cast("long").alias("decode_failures"),
            F.sum(F.length("extracted_text")).cast("long").alias("total_chars"),
            F.round(F.avg(F.length("extracted_text")), 2).alias("avg_turn_chars"),
            F.sum(
                F.when(F.col("payload_kind").startswith("pdf"), 1).otherwise(0)
            ).cast("long").alias("n_pdf_turns"),
            F.sum(F.when(F.col("payload_kind") == "html", 1).otherwise(0))
            .cast("long")
            .alias("n_html_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .withColumn(
            "failure_rate",
            F.round(F.col("decode_failures") / F.col("n_turns"), 4),
        )
    )
