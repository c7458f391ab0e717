#!/usr/bin/env python
"""Measure the batched-retrieval amortization claim with data.

bm25_batch_topk and cosine_batch_topk's 100 TB story is that corpus-
side work is independent of the batch width Q — this script times the
one-pass batch against Q independent single-query runs at sf0.1 and
prints seconds-per-query for both, for Q in {1, 4, 8, 16}. Results go
to BENCH/BASELINE.md (best-of-N on this tenant-noisy host).

Query sets are synthesized from the fixture vocabulary (lexical) and
low vec_ids (dense) — deterministic, no randomness.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

# 16 terms present in the synthetic vocabulary, grouped in 2s/3s
_TERMS = (
    "window spark join stream filter batch vector hash "
    "sort merge scan group agg key row table"
).split()


def _lex_queries(q: int):
    """Q queries of EXACTLY 3 terms each (cycling the vocabulary):
    per-query work must stay constant as Q grows, or a flat batch
    curve is guaranteed by construction instead of measured (review
    r6s7 — the first version split a FIXED 16 terms across Q)."""
    return tuple(
        (
            f"q{i}",
            tuple(_TERMS[(3 * i + j) % len(_TERMS)] for j in range(3)),
        )
        for i in range(q)
    )


def main() -> None:
    import bench

    from pdftotext_spark.operators import retrieval, similarity

    spark = bench.build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    def timed(fn):
        best = None
        for _ in range(REPS):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    print(f"# batch amortization @ {SF}, best-of-{REPS}")
    print("| Q | bm25 batch s | bm25 single-sum s | dense batch s | dense single-sum s |")
    print("|---|---|---|---|---|")
    for q in (1, 4, 8, 16):
        queries = _lex_queries(q)

        def run_batch():
            retrieval.bm25_batch_topk_for(docs, queries=queries).count()

        def run_singles():
            postings, stats = retrieval.bm25_index_for(docs)
            for _, terms in queries:
                retrieval.bm25_topk_indexed_for(
                    postings, stats, terms=terms
                ).count()

        # warm BOTH shapes (an unwarmed side pays first-run planning
        # and read-cache cost, inflating its column)
        run_batch()
        run_singles()
        b = timed(run_batch)
        s = timed(run_singles)

        vec_ids = tuple(range(q))

        def run_dbatch():
            similarity.cosine_batch_topk_for(emb, query_ids=vec_ids).count()

        def run_dsingles():
            # one single-query JOB per qid (the batch machinery with
            # Q=1 — the query-id-faithful baseline; cosine_scan_for
            # pins vec 0 and cannot express queries 1..Q-1)
            for qid in vec_ids:
                similarity.cosine_batch_topk_for(
                    emb, query_ids=(qid,)
                ).count()

        run_dbatch()
        run_dsingles()
        db = timed(run_dbatch)
        ds = timed(run_dsingles)
        print(f"| {q} | {b:.2f} | {s:.2f} | {db:.2f} | {ds:.2f} |")


if __name__ == "__main__":
    main()
