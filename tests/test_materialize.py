"""Cluster-safe lineage cuts (VERDICT r3 §wrong #1).

The iterative CC / LSH operators must survive executor loss on a real
cluster: when a reliable checkpoint directory is configured
(``setCheckpointDir`` → HDFS/object store), every lineage cut routes
through ``DataFrame.checkpoint`` instead of executor-local
``localCheckpoint``, with identical results."""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.spark

SF_DIR = "/root/testdata/sf0.001"


def _unset_checkpoint_dir(spark):
    jsc = spark.sparkContext._jsc.sc()
    getattr(jsc, "checkpointDir_$eq")(spark.sparkContext._jvm.scala.Option.empty())


def test_materialize_routes_by_checkpoint_dir(spark, tmp_path):
    from pdftotext_spark.operators.materialize import materialize

    assert spark.sparkContext.getCheckpointDir() is None
    df = materialize(spark.range(8))
    # local path: executor-local blocks, nothing written anywhere
    assert df.count() == 8

    ckdir = str(tmp_path / "reliable")
    spark.sparkContext.setCheckpointDir(ckdir)
    try:
        df2 = materialize(spark.range(8))
        assert df2.count() == 8
        # reliable path: RDD blocks persisted under the configured dir
        root = next(os.scandir(ckdir)).path
        assert any(e.name.startswith("rdd-") for e in os.scandir(root))
    finally:
        _unset_checkpoint_dir(spark)
    assert spark.sparkContext.getCheckpointDir() is None


def test_dedup_groups_identical_under_reliable_checkpointing(spark, tmp_path):
    """The full detect→CC chain with a checkpoint dir configured must
    produce byte-identical groups to the localCheckpoint run (and
    actually write reliable checkpoints)."""
    from pdftotext_spark.operators import dedup

    baseline = sorted(
        tuple(r) for r in dedup.dedup_groups_minhash(spark, SF_DIR).collect()
    )
    ckdir = str(tmp_path / "cc_reliable")
    spark.sparkContext.setCheckpointDir(ckdir)
    try:
        reliable = sorted(
            tuple(r) for r in dedup.dedup_groups_minhash(spark, SF_DIR).collect()
        )
        root = next(os.scandir(ckdir)).path
        rdd_dirs = [e.name for e in os.scandir(root) if e.name.startswith("rdd-")]
        assert rdd_dirs, "reliable checkpoint dir unused — still localCheckpoint?"
    finally:
        _unset_checkpoint_dir(spark)
    assert baseline == reliable
    assert len(baseline) > 0
