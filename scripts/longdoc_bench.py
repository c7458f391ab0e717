#!/usr/bin/env python
"""KEEP16 rate curve on the long-document corpus (VERDICT r6 #1).

Generates the planted multi-KB corpus (longdocs_gen: 300-char / 3 KB /
20 KB regimes), then measures the SAMPLED shingle family at
SPARK_GRAFT_SHINGLE_KEEP16 ∈ {4, 2, 1}:

- sampled shingle volume (the downstream cost driver),
- minhash_lsh_pairs wall + recall against the planted pairs per
  (J level × regime) + unplanted-pair count,
- containment_pairs wall + planted-containment recall,
- ngram_jaccard_pairs wall,

and the UNSAMPLED family once (rate lever does not apply):
duplicated_span_fraction (+ exact truth equality), strip_duplicated_
spans, winnowing_shared_pairs (+ planted span-pair recall).

Each (rate × query) is timed twice interleaved and the best kept
(tenant-noise rule from BENCH/BASELINE.md).  Results append to
BENCH/BASELINE.md and print as one JSON line.
"""

from __future__ import annotations

import datetime
import importlib
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
RATES = (4, 2, 1)
REPS = 2


def _spark():
    from pyspark.sql import SparkSession

    from pdftotext_spark.plans.pipeline import session_confs

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("longdoc_bench")
        .config("spark.ui.enabled", "false")
    )
    for k, v in session_confs().items():
        b = b.config(k, v)
    return b.getOrCreate()


def _timed(fn, reps: int = REPS) -> tuple[float, object]:
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2), out


def main() -> None:
    from pdftotext_spark.sources.longdocs_gen import J_LEVELS, REGIMES, make_longdocs

    out_dir = tempfile.mkdtemp(prefix="longdoc_bench_")
    truth = make_longdocs(out_dir, scale=SCALE, seed=13)
    total_chars = sum(truth.n_chars.values())
    planted = set(truth.pairs)
    spark = _spark()
    docs = spark.read.parquet(f"{out_dir}/documents.parquet")
    n_docs = docs.count()

    rate_rows = []
    recall_grid: dict[tuple[int, str, float], str] = {}
    for rate in RATES:
        os.environ["SPARK_GRAFT_SHINGLE_KEEP16"] = str(rate)
        from pdftotext_spark.operators import dedup as _d

        dedup = importlib.reload(_d)
        assert dedup.SHINGLE_KEEP16 == rate
        vol = dedup._shingles(docs, distinct=False).count()

        lsh_w, lsh_pairs = _timed(
            lambda: {
                (r.doc_a, r.doc_b)
                for r in dedup.minhash_lsh_pairs(spark, out_dir).collect()
            }
        )
        exact = truth.pairs_of("exact")
        rec_exact = len(exact & lsh_pairs) / len(exact)
        for regime in REGIMES:
            for j in J_LEVELS:
                cell = truth.pairs_of("neardup", regime=regime, j=j)
                recall_grid[(rate, regime, j)] = (
                    f"{len(cell & lsh_pairs)}/{len(cell)}"
                )
        unplanted = len(lsh_pairs - planted)

        cont_w, cont_pairs = _timed(
            lambda: {
                (r.doc_a, r.doc_b)
                for r in dedup.containment_pairs(spark, out_dir).collect()
            }
        )
        cont = truth.pairs_of("containment")
        rec_cont = len(cont & cont_pairs) / len(cont)

        ng_w, _ = _timed(
            lambda: dedup.ngram_jaccard_pairs(spark, out_dir).count()
        )
        rate_rows.append(
            {
                "keep16": rate,
                "shingles": vol,
                "lsh_wall": lsh_w,
                "recall_exact": rec_exact,
                "unplanted_lsh_pairs": unplanted,
                "containment_wall": cont_w,
                "recall_containment": rec_cont,
                "ngram_wall": ng_w,
            }
        )
    del os.environ["SPARK_GRAFT_SHINGLE_KEEP16"]
    from pdftotext_spark.operators import dedup as _d

    dedup = importlib.reload(_d)

    # unsampled family (rate-independent), plus exact truth equality
    span_w, got = _timed(
        lambda: {
            r.doc_id: r.dup_chars
            for r in dedup.duplicated_span_fraction(spark, out_dir).collect()
        }
    )
    truth_ok = got == truth.dup_chars
    strip_w, _ = _timed(
        lambda: dedup.strip_duplicated_spans(spark, out_dir).count()
    )
    win_w, win_pairs = _timed(
        lambda: {
            (r.doc_a, r.doc_b)
            for r in dedup.winnowing_shared_pairs(spark, out_dir).collect()
        }
    )
    spans = truth.pairs_of("span", regime="medium") | truth.pairs_of(
        "span", regime="long"
    )
    rec_span = len(spans & win_pairs) / len(spans)

    summary = {
        "metric": "longdoc_keep16_curve",
        "unit": "sec",
        "scale": SCALE,
        "n_docs": n_docs,
        "total_chars": total_chars,
        "rates": rate_rows,
        "recall_grid": {
            f"k{r}_{reg}_j{j}": v for (r, reg, j), v in recall_grid.items()
        },
        "unsampled": {
            "duplicated_span_fraction_wall": span_w,
            "exact_truth_match": truth_ok,
            "strip_duplicated_spans_wall": strip_w,
            "winnowing_shared_pairs_wall": win_w,
            "recall_span_pairs": rec_span,
        },
    }
    print(json.dumps(summary))

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    lines = [
        f"\n## Long-document KEEP16 rate curve {stamp}",
        "",
        f"Corpus: longdocs_gen scale={SCALE} seed=13 — {n_docs} docs,",
        f"{total_chars:,} chars across 300-char / 3 KB / 20 KB regimes,",
        "planted exact/near-dup/span/containment truth, collision-free",
        f"vocabulary; local[{CPUS}], best-of-{REPS} interleaved.",
        "",
        "| KEEP16 | sampled shingles | LSH wall (s) | exact recall | unplanted pairs | containment wall (s) | containment recall | ngram wall (s) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rate_rows:
        lines.append(
            f"| {r['keep16']}/16 | {r['shingles']:,} | {r['lsh_wall']} | "
            f"{r['recall_exact']:.2f} | {r['unplanted_lsh_pairs']} | "
            f"{r['containment_wall']} | {r['recall_containment']:.2f} | "
            f"{r['ngram_wall']} |"
        )
    lines += [
        "",
        "Near-dup LSH recall per (regime × target J), found/planted",
        "(analytic band ceiling p = 1-(1-J²)⁴: 1.00 / 0.93 / 0.68):",
        "",
        "| KEEP16 | " + " | ".join(
            f"{reg} J={j}" for reg in REGIMES for j in J_LEVELS
        ) + " |",
        "|---|" + "---|" * 9,
    ]
    for rate in RATES:
        lines.append(
            f"| {rate}/16 | " + " | ".join(
                recall_grid[(rate, reg, j)] for reg in REGIMES for j in J_LEVELS
            ) + " |"
        )
    u = summary["unsampled"]
    lines += [
        "",
        "Unsampled family (rate-independent): duplicated_span_fraction",
        f"{u['duplicated_span_fraction_wall']} s (exact planted-truth match:",
        f"{u['exact_truth_match']}), strip_duplicated_spans",
        f"{u['strip_duplicated_spans_wall']} s, winnowing_shared_pairs",
        f"{u['winnowing_shared_pairs_wall']} s (planted span-pair recall",
        f"{u['recall_span_pairs']:.2f}).",
    ]
    with (REPO / "BENCH" / "BASELINE.md").open("a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
