#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "extraction": {...}}

Components:
- per-query wall seconds for every ``queries()`` entry (collect()ed);
- the extraction pipeline over a cached deterministic transcripts
  fixture (seed=42, BENCH_TURNS turns incl. one mega-conversation) —
  reported as turns/sec under "extraction".
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "100000"))
# best-of-N per measurement: this host sees ±50% tenant-noise swings
# (BENCH/BASELINE.md), so single-shot numbers are not comparable
# across rounds
BENCH_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
SKEW_TURNS = BENCH_TURNS // 10
CACHE_DIR = REPO / ".cache" / f"bench_transcripts_{BENCH_TURNS}"


def ensure_bench_transcripts() -> str:
    from pdftotext_spark.sources.transcripts_gen import write_parquet

    marker = CACHE_DIR / "transcripts.parquet"
    if not marker.exists():
        write_parquet(str(CACHE_DIR), BENCH_TURNS, seed=42, skew_conv_turns=SKEW_TURNS)
    return str(marker)


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    from pdftotext_spark.plans.pipeline import session_confs

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pdftotext-spark-bench")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    )
    for k, v in session_confs().items():
        b = b.config(k, v)
    return b.getOrCreate()


def time_extraction(spark, input_path: str, n_partitions: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from pdftotext_spark.plans.pipeline import extract_turns

    df = spark.read.parquet(input_path)
    n_turns = df.count()
    # warm-up pass (JIT, Arrow, Python-worker spin-up) so the reported
    # number is steady-state throughput, matching the scaling bench
    extract_turns(df.limit(5000)).agg(F.count("*")).collect()
    wall = float("inf")
    for _ in range(BENCH_REPS):
        t0 = time.perf_counter()
        agg = (
            extract_turns(df, n_partitions=n_partitions)
            .agg(
                F.count("*").alias("n"),
                F.sum("decode_failures").alias("failures"),
                F.sum(F.length("extracted_text")).alias("chars"),
            )
            .collect()[0]
        )
        wall = min(wall, time.perf_counter() - t0)
        assert agg["n"] == n_turns
    # conversation assembly (the one shuffle stage), timed in isolation
    # over a cached extraction so the number is assembly-only
    from pdftotext_spark.plans.pipeline import assemble_conversations

    extracted = extract_turns(df, n_partitions=n_partitions).cache()
    extracted.count()
    assembly_wall = float("inf")
    for _ in range(BENCH_REPS):
        t0 = time.perf_counter()
        n_convs = assemble_conversations(extracted).count()
        assembly_wall = min(assembly_wall, time.perf_counter() - t0)
    extracted.unpersist()
    return {
        "turns": n_turns,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "decode_failures": int(agg["failures"]),
        "extracted_chars": int(agg["chars"]),
        "assembly_wall_sec": round(assembly_wall, 3),
        "n_conversations": int(n_convs),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1) if "sf" in Path(sf_dir).name else 0.1

    import __spark_entry__ as entrymod

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    bench_input = ensure_bench_transcripts()
    extraction = time_extraction(spark, bench_input)

    query_secs: dict[str, float] = {}
    for name, fn in sorted(entrymod.queries().items()):
        best = float("inf")
        for _ in range(BENCH_REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        query_secs[name] = round(best, 3)

    total = round(sum(query_secs.values()) + extraction["wall_sec"], 3)
    payload = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": query_secs,
        "sf": sf,
        "extraction": extraction,
        "cpus": cpus,
        "reps": BENCH_REPS,
    }
    # stop Spark BEFORE printing so no JVM shutdown logging lands after
    # the JSON line, emit compact separators to keep the line small,
    # and mirror to a repo file — r3's headline was lost when the
    # driver's tail window truncated the (last) JSON line.
    spark.stop()
    line = json.dumps(payload, separators=(",", ":"))
    (REPO / "BENCH_LOCAL.json").write_text(line + "\n")
    print(line, flush=True)


if __name__ == "__main__":
    main()
