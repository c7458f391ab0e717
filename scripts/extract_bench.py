#!/usr/bin/env python
"""Measure steady-state extraction throughput at a given parallelism.

One JVM per invocation (local[N] is fixed per JVM). A warm-up pass
runs in-process (JIT, Arrow, Python-worker spin-up), then ``--repeat``
timed passes over the input give the steady-state rate.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--max-partition-bytes", default="1m")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import build_spark
    from pdftotext_spark.plans.pipeline import extract_turns

    spark = build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # small splits so even the largest level has ≥4 waves of tasks
    spark.conf.set("spark.sql.files.maxPartitionBytes", args.max_partition_bytes)
    df = spark.read.parquet(args.input)
    n_turns = df.count()

    def one_pass() -> None:
        extract_turns(df).agg(F.count("*")).collect()

    one_pass()  # warm-up (discarded)
    t0 = time.perf_counter()
    for _ in range(args.repeat):
        one_pass()
    wall = time.perf_counter() - t0
    total = n_turns * args.repeat
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "turns": total,
                "wall_sec": round(wall, 3),
                "turns_per_sec": round(total / wall, 1),
                "repeat": args.repeat,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
