"""Streaming exact deduplication: content-hash ``dropDuplicates``
with a watermark bounding the dedup state — the standard Structured
Streaming shape for "never emit the same document twice" ingestion.

State is keyed by the md5 of the payload; the watermark lets Spark
evict keys older than the horizon, so state is O(docs per window),
not O(all docs ever). Duplicates arriving *after* the horizon would
re-emit — the documented trade-off of every watermarked streaming
dedup (run the batch ``dedup_exact`` downstream for the global pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    transcripts: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Drop payload-identical turns across micro-batches.

    ``dropDuplicatesWithinWatermark`` keeps a turn's content hash in
    the state store until the watermark passes it; any later arrival
    with the same hash inside the horizon is dropped exactly once
    regardless of micro-batch boundaries."""
    hashed = transcripts.withColumn("content_md5", F.md5("text"))
    return (
        hashed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
        .drop("content_md5")
    )
