#!/usr/bin/env python
"""Regenerate PLANS.md: captured .explain("formatted") op-trees for a
representative slice of the registry, annotated with the plan property
each one evidences (the properties themselves are enforced by
tests/test_plan_quality.py — this is the human-readable capture)."""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PICKS = {
    "pricing_summary": "classic OLAP agg: partial (map-side) HashAggregate under the shuffle, pushed filter, pruned scan",
    "segment_revenue": "broadcast dim join: BroadcastHashJoin, no shuffle of the fact side beyond the agg",
    "cosine_topk": "top-k: TakeOrderedAndProject, 1-row broadcast query vector, no sort of the full table",
    "minhash_lsh_pairs": "banded LSH: equi-join on (band_idx, band_hash) — no cartesian anywhere",
    "simhash_neardup_pairs": "pigeonhole banding: equi-join + popcount filter",
    "kmeans_ivf_topk": "seeds via TakeOrderedAndProject; assignment joins broadcast centroids",
    "repetition_signals": "zero-shuffle: one WholeStageCodegen scan, array expressions only",
    "cube_activity": "CUBE: single Expand + partial aggregate, no per-grouping rescans",
    "knn_graph_srp": "ANN graph (r4, 64-plane 16x4 bands): WindowGroupLimit partial top-k per union side; the ExistingRDD scans are the materialized banded-join candidates (join shape asserted pre-cut by test_plan_quality)",
    "dedup_groups_multi": "fused CC (r4): the ExistingRDD is the converged label fixed point (one CC run for all three families); candidate generation shapes are the banded plans above",
    "semdedup": "SemDeDup (r5): ExistingRDD scans are the materialized Lloyd assignment/centroid-cos frames (broadcast-centroid assignment, see kmeans_ivf_topk); within-cluster pairs are chunk-keyed equi-joins, rank joins ship ids+rank only",
    "dsir_select": "DSIR (r5): the ExistingRDD is the ONCE-materialized per-doc weight table (its upstream: ONE fused constant-key count aggregate — raw + conditional target counts — broadcast-joined back onto the token scan); both the top-N (TakeOrderedAndProject) and the final selected-flag join reuse it — no window, no SMJ, no duplicate token scan",
    "bpe_learn_merges": "BPE training (r5): unioned 1-row argmax frames, each an ExistingRDD (the materialized per-round TakeOrdered(1) over the vocab pair counts); the fold applies are broadcast-scalar projections between rounds — the corpus is scanned once, every round operates on the vocabulary table",
    "winnowing_shared_pairs": "MOSS pairs (r6): ONE corpus position explode (the count-window df guard) and ONE shuffle by fp; the second Generate is the bounded in-bucket pair fan-out (buckets capped at WINNOW_MAX_DF docs) — no join operator, the old self-join re-ran the corpus scan per side",
    "duplicated_span_fraction": "ExactSubstr islands (r6): the corpus-sized positional-shingle frame is generated ONCE (one Generate posexplode, one Exchange by sh); duplicate marking is a count window over that single shuffle — the old groupBy+left_semi form scanned it twice (VERDICT r5 #2, 1.8x measured)",
    "strip_duplicated_spans": "ExactSubstr apply (r6): ZERO Generate nodes in the final plan — the slim merged-span frame is materialized before its two consumers (pieces join + tails agg), so the corpus-sized shingle scan in its lineage ran exactly once, inside the checkpoint job",
    "dedup_incremental_exact": "Incremental exact (r6): ONE corpus-sized shuffle on the digest — the window reuses the partitioning the index join needs; corpus index arrives as a distinct projection (broadcast at test scale, AQE decides at 100 TB); source split predicates pushed to both scans",
    "dedup_incremental_minhash": "Incremental near-dup (r6): corpus band index and increment bands are separate scans (production reads the index, not the corpus); both collision checks are equi-joins on (band_idx, band_hash); increment bands materialized once for their three consumers",
    "ann_topk_quantized": "Quantized ANN (r6): cosine_topk's shape + one quantization projection — broadcast single-row query join, TakeOrderedAndProject, zero exchanges",
    "training_order": "Training order (r6): corpus row_number window PARTITIONED by the 256-value hash-prefix bucket; the only SinglePartition exchange is above the 256-row count aggregate; offsets join back broadcast",
    "top_duplicated_spans": "Boilerplate report (r6): the ExactSubstr single-scan island subtree (one Generate) + join back to text + TakeOrderedAndProject on total_dup_chars",
    "fineweb_quality": "FineWeb panel (r6s3): zero-shuffle narrow map — every line-shape signal is an array expression inside one WholeStageCodegen scan (the whole panel family shares this shape; c4/gopher_quality/encoding/text_normalize/strip_repeated_lines pinned identical by test)",
    "quality_vote": "Five-policy vote (r6s3): each panel is its own pruned scan; verdicts join on slim (doc_id, flag) frames — gopher_repetition is the only subtree with an exchange",
    "ngram_decontamination": "Token-13-gram decontamination (r6s3): ONE window explode over the training side, benchmark gram set distinct-bounded and joined left-semi (AQE broadcasts while small), per-doc counts from one partial-agg groupBy; the window-total side is a narrow pruned re-scan, not a second explode",
    "boilerplate_lines": "Boilerplate miner (r6s4): ONE posexplode of the prose frame, df + example via one aggregate on the line hash, TakeOrderedAndProject on (df, line) — no self-join",
    "paragraph_dedup_newline": "Real-segmenter CCNet (r6s4): ONE posexplode, ONE exchange, first-copy keep via a min-struct window on md5(seg_text) — no groupBy+join-back of the corpus-sized segment frame",
    "bm25_topk": "BM25 brute-force baseline (r6s4): corpus stats = one SinglePartition 1-row aggregate broadcast back; scoring is a zero-shuffle map; TakeOrderedAndProject",
    "bm25_topk_indexed": "BM25 inverted index (r6s5): term IN filter pushed below the postings aggregate (only query-term tokens shuffle), per-term df = count window over filtered postings (ONE corpus Generate — no join-back re-explode), groupBy(doc_id) + TakeOrderedAndProject",
    "semantic_decontamination": "Embedding eval-leak report (r6s5): eval band keys + embeddings force-broadcast (genuinely tiny benchmark side), train side = one narrow band explode + broadcast join; per-vec argmax is a rank-1 window with PARTIAL WindowGroupLimit below its shuffle; two wide shuffles total",
    "hybrid_rrf_topk": "RRF fusion (r6s6): each system bounds the corpus to RRF_POOL rows via TakeOrderedAndProject BEFORE its rank window; the full-outer fusion join and final top-k touch only 2xPOOL rows — constant fusion work at any corpus size",
    "bm25_rerank_cosine": "Retrieve-then-rerank (r6s6): the <=POOL candidate list is the BROADCAST side of a BroadcastHashJoin against embeddings (big side streams once, query-row exclusion propagates into PushedFilters); cosine scoring touches only survivors; TakeOrderedAndProject",
    "bm25_batch_topk": "Batch BM25 (r6s7): ONE pruned posting pass for the whole query set (term IN union-of-terms below the postings aggregate), df once per term, the tiny (query_id, term) map broadcast in; per-query top-k via Partial+Final WindowGroupLimit — never a corpus sort",
    "mixture_weights": "Temperature mixing plan (r6s7): ONE corpus scan map-side-combined to #sources rows; the Σ totals are an unpartitioned window over that tiny frame (an agg+crossJoin-back would re-run the corpus lineage — verified: it planned TWO FileScans)",
    "mixture_rebalance": "Per-doc copy counts (r6s7): stats pass + apply pass (two narrow scans — a window-by-source single-scan would shuffle the corpus into #sources hot partitions); the #sources-row rate frame is the BROADCAST side; md5-Bernoulli copy rule is a zero-shuffle map",
    "mixture_pack": "Mix-expand-pack composition (r6s7): copy counts computed in the SAME apply-side scan that feeds the pack window (still two corpus scans), ONE copy explode, rates broadcast, pack offsets windowed per source — no global sort",
    "quality_lr_scores": "In-Spark LR quality classifier (r6s7): corpus scanned once into the materialized feature table; 8 unrolled GD rounds each ONE map-side-combined aggregate + broadcast-scalar weight update (the BPE/Lloyd shape); scoring reads only the two ExistingRDDs, zero-shuffle",
    "cosine_batch_topk": "Batched dense retrieval (r6s7): the Q-row query frame broadcasts into ONE embeddings scan (corpus I/O independent of Q — the bm25_batch amortization, dense side); per-query top-k via Partial+Final WindowGroupLimit, never a corpus sort",
}


def main() -> None:
    import bench

    import __spark_entry__ as mod

    spark = bench.build_spark(8)
    out = [
        "# PLANS — captured physical-plan evidence (sf0.01, local[8])",
        "",
        "Regenerate: `python scripts/capture_plans.py` (or rerun the snippet in",
        "the git log). The plan-shape PROPERTIES are enforced continuously by",
        "`tests/test_plan_quality.py`; this file is the human-readable capture.",
        "",
    ]
    qs = mod.queries()
    for name, note in PICKS.items():
        df = qs[name](spark, "/root/testdata/sf0.01")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        out += [f"## {name}", f"_{note}_", "```", tree.strip(), "```", ""]
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(PICKS)} plans)")


if __name__ == "__main__":
    main()
