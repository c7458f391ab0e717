"""Output sizing & layout: the small-files problem at 100 TB.

A 1000-executor extraction writing per-task files produces millions
of KB-sized parquet files; downstream scans then pay a namenode/list
penalty and lose row-group compression. ``write_sized`` sizes the
write to a target file size from a *sampled* row-byte estimate — one
extra narrow job over ≤ ``sample_rows`` rows, never a full pass —
and optionally lays the output out by partition columns (e.g.
``ds=date(ts)``) so downstream readers get partition pruning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# parquet compresses text-heavy rows well; scale the raw estimate
_COMPRESSION_RATIO = 0.45


def estimate_row_bytes(df: DataFrame, sample_rows: int = 10_000) -> float:
    """Mean serialized row size estimated from a bounded sample:
    sum of column byte-lengths (strings/binaries dominate) plus a
    fixed per-row overhead for fixed-width columns."""
    cols = []
    fixed = 0
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in ("string", "binary"):
            cols.append(
                F.coalesce(F.length(F.col(f.name)), F.lit(0)).cast("double")
            )
        elif t.startswith("array") or t.startswith("map") or t.startswith("struct"):
            cols.append(
                F.coalesce(F.length(F.to_json(F.col(f.name))), F.lit(0)).cast(
                    "double"
                )
            )
        else:
            fixed += 8
    size_col = sum(cols[1:], cols[0]) if cols else F.lit(0.0)
    row = (
        df.limit(sample_rows)
        .select((size_col + F.lit(float(fixed))).alias("b"))
        .agg(F.avg("b").alias("avg"), F.count("*").alias("n"))
        .first()
    )
    return float(row["avg"] or fixed or 64.0)


def write_sized(
    df: DataFrame,
    path: str,
    target_file_mb: int = 256,
    partition_by: tuple[str, ...] = (),
    mode: str = "append",
    total_rows: int | None = None,
    sample_rows: int = 10_000,
) -> int:
    """Write ``df`` as parquet with files sized near ``target_file_mb``.

    Returns the partition count used. ``total_rows`` skips the count
    job when the caller already knows it (e.g. from a manifest)."""
    n = total_rows if total_rows is not None else df.count()
    if n == 0:
        df.write.mode(mode).parquet(path)
        return df.rdd.getNumPartitions()
    row_bytes = estimate_row_bytes(df, sample_rows) * _COMPRESSION_RATIO
    total_mb = n * row_bytes / (1024 * 1024)
    n_parts = max(1, math.ceil(total_mb / target_file_mb))
    writer = (
        df.repartition(n_parts, *partition_by)
        if partition_by
        else df.repartition(n_parts)
    ).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return n_parts
