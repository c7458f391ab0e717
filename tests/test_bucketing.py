"""Bucketed co-located join: the scale pattern for repeated
conv_id-keyed joins — asserted at the physical-plan level."""

import pytest
from pyspark.sql import functions as F

from pdftotext_spark.plans.bucketing import colocated_join, write_bucketed

pytestmark = pytest.mark.spark


def test_bucketed_join_eliminates_exchange(spark, transcripts_dir, tmp_path):
    # warehouse dir is a static conf, set in conftest's builder
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    transcripts = spark.read.parquet(f"{transcripts_dir}/transcripts.parquet")
    golden = spark.read.parquet(f"{transcripts_dir}/golden.parquet")

    write_bucketed(
        transcripts, "t_bucketed", ["conv_id"], n_buckets=4, sort_cols=["turn_idx"]
    )
    write_bucketed(
        golden, "g_bucketed", ["conv_id"], n_buckets=4, sort_cols=["turn_idx"]
    )
    try:
        joined = colocated_join(spark, "t_bucketed", "g_bucketed", ["conv_id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # both sides read pre-bucketed
        assert "SortMergeJoin" in plan
        # and it is the *same* result as the shuffled join
        shuffled = transcripts.join(golden, "conv_id")
        assert joined.count() == shuffled.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
        spark.sql("DROP TABLE IF EXISTS t_bucketed")
        spark.sql("DROP TABLE IF EXISTS g_bucketed")
