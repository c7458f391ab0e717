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


def test_write_sized_scales_file_count(spark, tmp_path):
    """Sized writes: halving the target file size ~doubles the file
    count; partition_by lays out a pruning-friendly directory tree."""
    from pdftotext_spark.plans.output import estimate_row_bytes, write_sized

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    est = estimate_row_bytes(docs)
    assert est > 100  # documents carry real text

    big = write_sized(docs, str(tmp_path / "big"), target_file_mb=1, mode="overwrite")
    small = write_sized(
        docs, str(tmp_path / "small"), target_file_mb=10, mode="overwrite"
    )
    assert big >= small >= 1
    back = spark.read.parquet(str(tmp_path / "big"))
    assert back.count() == docs.count()

    n = write_sized(
        docs.withColumn("lang_part", docs.lang),
        str(tmp_path / "parts"),
        target_file_mb=10,
        partition_by=("lang_part",),
        mode="overwrite",
    )
    assert n >= 1
    dirs = {p.name for p in (tmp_path / "parts").iterdir() if p.is_dir()}
    assert any(d.startswith("lang_part=") for d in dirs)
    assert spark.read.parquet(str(tmp_path / "parts")).count() == docs.count()


def test_salted_join_equals_plain_join(spark):
    """Hot-key salting must preserve join semantics exactly."""
    from pdftotext_spark.plans.skew import salted_join

    # skewed fact: 90% of rows share key 'hot'
    fact = spark.createDataFrame(
        [(("hot" if i % 10 else f"k{i}"), i) for i in range(2000)],
        "key string, v long",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("k10", "A"), ("k20", "B"), ("missing", "Z")],
        "key string, label string",
    )
    plain = fact.join(dim, "key")
    salted = salted_join(fact, dim, on=["key"], salt=8)
    assert salted.count() == plain.count()
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b
    # the hot key actually spreads over multiple salt shards
    from pdftotext_spark.plans.skew import _SALT_COL

    hot_salts = (
        fact.filter("key = 'hot'")
        .withColumn(_SALT_COL, F.pmod(F.xxhash64("key", "v"), F.lit(8)))
        .select(_SALT_COL)
        .distinct()
        .count()
    )
    assert hot_salts > 1
