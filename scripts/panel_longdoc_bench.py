#!/usr/bin/env python
"""Quality-panel cost at multi-KB document lengths (r6 third session).

Every panel/cleanup operator is a zero-shuffle narrow map whose cost
should be LINEAR in document bytes (the per-row line lambdas are
quadratic only in LINE count, and the longdoc corpus is single-line);
this measures that claim on the planted longdoc corpus (300-char /
3 KB / 20 KB regimes, sources/longdocs_gen.py) instead of assuming
it from the ~300-char synthetic documents table.

Each query is timed REPS times interleaved, best kept (tenant-noise
rule). Appends a section to BENCH/BASELINE.md and prints one JSON
line.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCALE = int(os.environ.get("LONGDOC_SCALE", "4"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = 2


def main() -> None:
    from pyspark.sql import SparkSession

    from pdftotext_spark.operators import dedup, textstats
    from pdftotext_spark.plans.pipeline import session_confs
    from pdftotext_spark.sources.longdocs_gen import make_longdocs

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("panel-longdoc-bench")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    )
    for k, v in session_confs().items():
        b = b.config(k, v)
    spark = b.getOrCreate()

    tmp = tempfile.mkdtemp(prefix="panel_longdocs_")
    make_longdocs(tmp, scale=SCALE)
    docs = spark.read.parquet(f"{tmp}/documents.parquet")
    n_docs = docs.count()
    total_chars = docs.selectExpr("sum(length(text))").first()[0]

    queries = {
        "gopher_quality": textstats.gopher_quality,
        "gopher_repetition": textstats.gopher_repetition,
        "c4_quality": textstats.c4_quality,
        "fineweb_quality": textstats.fineweb_quality,
        "encoding_quality": textstats.encoding_quality,
        "text_normalize": textstats.text_normalize,
        "strip_repeated_lines": textstats.strip_repeated_lines,
        "quality_vote_panels": None,  # composed below
        "ngram_decontamination": dedup.ngram_decontamination,
    }

    def run(name):
        if name == "quality_vote_panels":
            from pdftotext_spark.operators import curation

            t0 = time.monotonic()
            curation.quality_vote(spark, tmp).collect()
            return time.monotonic() - t0
        t0 = time.monotonic()
        queries[name](spark, tmp).collect()
        return time.monotonic() - t0

    best: dict[str, float] = {}
    for rep in range(REPS):
        for name in queries:
            w = run(name)
            best[name] = min(best.get(name, w), w)

    result = {
        "metric": "panel_longdoc_wall",
        "unit": "sec",
        "scale": SCALE,
        "n_docs": n_docs,
        "total_chars": int(total_chars),
        "queries": {k: round(v, 3) for k, v in best.items()},
    }
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    lines = [
        f"\n## Quality-panel cost on the longdoc corpus {stamp}\n",
        f"\n{n_docs} docs, {total_chars:,} chars "
        f"(300-char/3KB/20KB regimes, scale {SCALE}), local[{CPUS}], "
        f"best-of-{REPS} interleaved:\n",
        "\n| query | wall (s) |\n|---|---|\n",
    ]
    for k, v in best.items():
        lines.append(f"| {k} | {v:.2f} |\n")
    with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
        f.writelines(lines)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
