#!/usr/bin/env python
"""Deployable corpus-dedup job (detect → group → apply):

    spark-submit --py-files pdftotext_spark.zip \\
        scripts/run_dedup_job.py \\
        --input  <dir containing documents.parquet> \\
        --output <survivors parquet target> \\
        [--groups <groups parquet target>]

Pipeline: exact dedup (md5 hash-groupBy) first, then banded-MinHash
LSH candidate pairs, connected-components grouping (transitive
closure), and a min-id-per-group survivor policy applied with one
anti-join. Prints a one-line JSON report.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--groups", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdftotext_spark.operators.dedup import (
        dedup_groups,
        minhash_lsh_pairs,
    )
    from pdftotext_spark.plans.pipeline import session_confs

    builder = SparkSession.builder.appName("pdftotext-spark-dedup")
    for k, v in session_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    n_in = docs.count()

    # 1. exact: keep the min doc_id per content digest
    canonical = docs.groupBy(F.md5("text").alias("content_md5")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exact_survivors = docs.join(
        canonical.select("doc_id"), "doc_id", "left_semi"
    )
    n_exact = exact_survivors.count()

    # 2. near-dup: LSH pairs → connected components → min-id survivor
    pairs = minhash_lsh_pairs(spark, args.input)
    groups = dedup_groups(pairs)
    if args.groups:
        groups.write.mode("overwrite").parquet(args.groups)
    losers = groups.filter(F.col("doc_id") != F.col("group_id")).select("doc_id")
    survivors = exact_survivors.join(losers, "doc_id", "left_anti")
    survivors.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()

    print(
        json.dumps(
            {
                "docs_in": n_in,
                "after_exact": n_exact,
                "after_neardup": n_out,
                "exact_removed": n_in - n_exact,
                "neardup_removed": n_exact - n_out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
