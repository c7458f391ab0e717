"""Bucketed-table layout for co-located joins (scale design).

At 100 TB the repeated join of extracted turns against golden /
annotation / feedback tables on ``(conv_id)`` dominates shuffle cost if
both sides re-shuffle every run. Writing both sides bucketed by the
join key once (``bucketBy`` + ``sortBy``) makes every later equi-join
shuffle-free: Spark matches bucket files pairwise and the plan shows
no Exchange on either side (asserted in tests/test_bucketing.py).

Bucket-count guidance: buckets ≈ total-size / (target partition size);
must match on both sides (or divide evenly) for exchange elimination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed managed table (spark-warehouse)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    physical plan contains no Exchange on either input."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
