"""Whole-document md5-sampled shingling (VERDICT r4 §next #1).

The r1-r4 default shingled only a 249-char document prefix, making
every dedup/decontamination signal blind to long-document tails. The
r5 policy shingles the WHOLE document and bounds downstream volume by
deterministic md5-threshold shingle sampling (Broder mod-p shingling)
— the SPARK_GRAFT_SHINGLE_KEEP16 rate lever must steer BOTH the Spark
operator and its DuckDB oracle (they share the constant)."""

from __future__ import annotations

import importlib
import os

import duckdb
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _write_docs(tmp_path, spark):
    # two docs: DISTINCT first 250 chars, IDENTICAL 1500-char tail —
    # a true near-dup pair that the old prefix bound could not see
    tail = ("the shared body of the document continues here " * 40)[:1500]
    doc_a = ("alpha " * 50)[:250] + tail
    doc_b = ("omega " * 50)[:250] + tail
    df = spark.createDataFrame(
        [(1, doc_a, "s"), (2, doc_b, "s")], "doc_id long, text string, source string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _reload_dedup():
    from pdftotext_spark.operators import dedup

    return importlib.reload(dedup)


def test_default_catches_tail_duplicates(spark, tmp_path):
    """The r4 VERDICT's long-document-blindness fixture: duplicated
    content sits ENTIRELY past char 249; the default whole-document
    sampled shingling must detect the pair (the old prefix cap
    provably could not — it returned 0 pairs on this fixture)."""
    sf_dir = _write_docs(tmp_path, spark)
    from pdftotext_spark.operators import dedup

    assert dedup.SHINGLE_KEEP16 == 4
    pairs = dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}
    # the oracle string follows the same policy: DuckDB must see the
    # identical pair set on the same parquet
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    orc = con.execute(dedup.MINHASH_LSH_PAIRS_SQL).fetchall()
    assert {(a, b) for a, b, *_ in orc} == {(1, 2)}


def test_keep16_lever_steers_both_engines(spark, tmp_path):
    """SPARK_GRAFT_SHINGLE_KEEP16=16 disables sampling in BOTH the
    Spark expression and the oracle SQL; the per-doc shingle counts
    then equal the exact whole-document k-gram counts, and at the
    default rate the sampled counts sit well below them but above the
    old 249 prefix cap (whole-doc coverage)."""
    sf_dir = _write_docs(tmp_path, spark)
    from pdftotext_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sampled = {
        r.doc_id: r.n
        for r in dedup._shingles(docs, distinct=False)
        .groupBy("doc_id").agg(F.count("*").alias("n"))
        .collect()
    }
    os.environ["SPARK_GRAFT_SHINGLE_KEEP16"] = "16"
    try:
        full = _reload_dedup()
        assert full.SHINGLE_KEEP16 == 16
        n_all = {
            r.doc_id: r.n
            for r in full._shingles(docs, distinct=False)
            .groupBy("doc_id").agg(F.count("*").alias("n"))
            .collect()
        }
        for did in (1, 2):
            assert n_all[did] == 1750 - 8 + 1  # every position, whole doc
            # default rate ≈ 1/4 of positions, far beyond the old cap's
            # 249 but far below everything
            assert 249 < 1750 and sampled[did] < n_all[did] * 0.35
            assert sampled[did] > n_all[did] * 0.15
        # the unsampled oracle matches the unsampled Spark side
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        )
        orc = con.execute(full.MINHASH_SIGNATURES_SQL).fetchall()
        spk = [tuple(r) for r in full.minhash_signatures(spark, sf_dir).collect()]
        assert sorted(orc) == sorted(spk)
    finally:
        del os.environ["SPARK_GRAFT_SHINGLE_KEEP16"]
        restored = _reload_dedup()
        assert restored.SHINGLE_KEEP16 == 4


def test_sampling_is_content_consistent(spark, tmp_path):
    """The md5 keep rule depends only on shingle content (plus the
    always-keep first position), so two docs sharing a substring
    sample it IDENTICALLY — the property that makes sampled Jaccard an
    unbiased estimate of true Jaccard."""
    from pdftotext_spark.operators import dedup

    shared = "an identical long shared paragraph " * 12
    df = spark.createDataFrame(
        [(1, "XSTART" + shared, "s"), (2, "YBEGIN" + shared + "ZEND", "s")],
        "doc_id long, text string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    rows = dedup._shingles(docs, distinct=True).collect()
    by_doc = {1: set(), 2: set()}
    for r in rows:
        by_doc[r.doc_id].add(r.sh)
    # every sampled shingle fully inside the shared region must appear
    # in both docs' samples (positions differ by 6-0 chars, content
    # decides) — excluding boundary shingles that straddle the distinct
    # prefixes/suffix and each doc's always-kept first shingle
    interior = {
        sh
        for sh in by_doc[1]
        if sh in shared and shared.index(sh) >= 8
    }
    missing = {
        sh for sh in interior
        if sh not in by_doc[2] and sh in shared[:-8]
    }
    assert not missing


def test_strip_duplicated_spans_constructed(spark, tmp_path):
    """Hand-checked ExactSubstr apply (the parity gate is blind to
    bugs implemented identically in both engines): two docs share
    exactly one 14-char segment; the merged duplicated island must be
    precisely that segment in each doc, and the rebuilt text must be
    the original minus the segment."""
    from pdftotext_spark.operators import dedup

    shared = "SHAREDSEGMENT!"  # 14 chars -> 7 duplicated 8-grams
    doc_a = "aaaaaa" + shared + "bbbbbb"
    doc_b = "cccccc" + shared + "dddddd"
    df = spark.createDataFrame(
        [(1, doc_a, "s"), (2, doc_b, "s")],
        "doc_id long, text string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.doc_id: r for r in dedup.strip_duplicated_spans(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[1].clean_text == "aaaaaabbbbbb"
    assert rows[2].clean_text == "ccccccdddddd"
    assert rows[1].removed_chars == len(shared) == rows[2].removed_chars

    # consistency invariant with the metric on the same fixture
    met = {
        r.doc_id: r.dup_chars
        for r in dedup.duplicated_span_fraction(spark, str(tmp_path)).collect()
    }
    assert met == {1: 14, 2: 14}


def test_strip_removed_equals_metric_dup_chars(spark):
    """Cross-operator invariant on the real corpus: the apply side
    removes exactly the chars the metric counts (same island algebra)."""
    from pdftotext_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    removed = {
        r.doc_id: r.removed_chars
        for r in dedup.strip_duplicated_spans(spark, sf).collect()
    }
    dup = {
        r.doc_id: r.dup_chars
        for r in dedup.duplicated_span_fraction(spark, sf).collect()
    }
    assert removed == dup
    assert sum(removed.values()) > 0


def test_dedup_keep_best_semantics(spark):
    """Hand-checked: exactly ONE kept doc per group, and it is the
    longest (doc_id-ascending tie-break) — the quality-argmax policy,
    not min-id."""
    from pdftotext_spark.operators import dedup

    rows = dedup.dedup_keep_best(spark, "/root/testdata/sf0.001").collect()
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r.group_id, []).append(r)
    multi = 0
    for members in groups.values():
        kept = [r for r in members if r.kept]
        assert len(kept) == 1
        best = max(members, key=lambda r: (r.n_chars, -r.doc_id))
        assert kept[0].doc_id == best.doc_id
        assert all(r.group_size == len(members) for r in members)
        if len(members) > 1:
            multi += 1
    assert multi > 0  # the corpus has real near-dup clusters


def test_pack_sequences_offsets_exact(spark):
    """Hand-checked: per-source running offsets are exact prefix sums
    in doc_id order and pack_id is the power-of-two floor division."""
    from pdftotext_spark.operators import textstats

    # sf0.01, where per-source token totals (~1.5k) exceed the
    # 256-token budget several times over — the splits assertion below
    # is non-trivial
    rows = textstats.pack_sequences(spark, "/root/testdata/sf0.01").collect()
    by_src: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        by_src.setdefault(r.source, []).append(r)
    n_packs = set()
    for src, members in by_src.items():
        off = 0
        for r in members:
            assert r.start_offset == off
            assert r.pack_id == off // textstats.PACK_BUDGET_TOKENS
            n_packs.add((src, r.pack_id))
            off += r.n_tokens
    assert len(n_packs) > len(by_src)  # budget actually splits sources


def test_dedup_keep_best_constructed(spark, tmp_path):
    """Constructed inputs (independent of the operator's own
    intermediates): A and B are near-dups (shared body dominates both
    whole documents — whole-doc sampled Jaccard ≈ 0.9), B is longer →
    only B kept from that cluster; unrelated C is its own singleton
    group and kept."""
    from pdftotext_spark.operators import dedup

    # non-repetitive body: periodic text collapses to ~period distinct
    # shingles and starves the set-similarity signal
    body = " ".join(f"body{i:03d}" for i in range(75))
    doc_a = body + " short tail"
    doc_b = body + " a much longer tail that makes B the best doc"
    doc_c = "completely unrelated content with its own distinct words here"
    df = spark.createDataFrame(
        [(1, doc_a, "s"), (2, doc_b, "s"), (3, doc_c, "s")],
        "doc_id long, text string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in dedup.dedup_keep_best(spark, str(tmp_path)).collect()}
    assert rows[1].group_id == rows[2].group_id == 1
    assert rows[1].group_size == rows[2].group_size == 2
    assert not rows[1].kept and rows[2].kept          # B is longer
    assert rows[3].group_id == 3 and rows[3].group_size == 1 and rows[3].kept
    assert rows[2].n_chars == len(doc_b)


def test_pack_sequences_constructed(spark, tmp_path):
    """Constructed inputs with hand-counted tokens: 100-token docs
    against the 256 budget pack as 0,0,0,1,1,1,2 by start offset."""
    from pdftotext_spark.operators import textstats

    assert textstats.PACK_BUDGET_TOKENS == 256
    doc = " ".join(["tok"] * 100)  # exactly 100 whitespace tokens
    df = spark.createDataFrame(
        [(i, doc, "s") for i in range(7)],
        "doc_id long, text string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = sorted(
        textstats.pack_sequences(spark, str(tmp_path)).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.n_tokens for r in rows] == [100] * 7
    assert [r.start_offset for r in rows] == [0, 100, 200, 300, 400, 500, 600]
    assert [r.pack_id for r in rows] == [0, 0, 0, 1, 1, 1, 2]


def test_decontaminate_apply_and_report_constructed(spark, tmp_path):
    """Hand-checked decontamination apply/report (the parity gate is
    blind to identical-in-both-engines bugs): a training doc that
    copies benchmark text verbatim is quarantined; a fresh-vocabulary
    doc survives with ~zero overlap; the per-source report counts
    exactly the quarantined doc."""
    from pdftotext_spark.operators import dedup

    bench = "the held out benchmark question about astronomy " * 8
    copycat = bench + " with a tiny suffix"
    fresh = " ".join(f"novel{i:03d}" for i in range(60))
    df = spark.createDataFrame(
        [
            (1, bench, "src0"),
            (2, copycat, "src1"),
            (3, fresh, "src1"),
        ],
        "doc_id long, text string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    scored = {r.doc_id: r for r in dedup.decontamination_overlap(spark, sf).collect()}
    assert set(scored) == {2, 3}          # src0 is the benchmark side
    assert scored[2].contamination_frac > dedup.CONTAMINATION_THRESHOLD
    assert scored[3].contamination_frac < 0.1

    kept = {r.doc_id for r in dedup.decontaminate_apply(spark, sf).collect()}
    assert kept == {3}

    rep = {r.source: r for r in dedup.decontamination_report(spark, sf).collect()}
    assert set(rep) == {"src1"}
    assert rep["src1"].n_docs == 2 and rep["src1"].n_quarantined == 1
    assert rep["src1"].max_frac == round(scored[2].contamination_frac, 4)
    # hand-checked micro-average (review r5: the oracle twin alone is
    # blind to an identical-in-both-engines ratio inversion): exact
    # integer sums over the scored docs, one division
    exp_micro = sum(scored[d].n_contaminated for d in (2, 3)) / sum(
        scored[d].n_shingles for d in (2, 3)
    )
    assert rep["src1"].micro_frac == pytest.approx(exp_micro, abs=1e-12)


def test_source_overlap_matrix_constructed(spark, tmp_path):
    """Hand-checked cross-source overlap matrix: two sources where ONE
    doc pair is a verbatim cross-source duplicate and everything else
    is disjoint vocabulary — exactly one (srcA, srcB) cell with
    n_pairs == 1, n_possible == |A|*|B|, and no within-source cells."""
    from pdftotext_spark.operators import dedup

    dup = " ".join(f"dupword{i:03d}" for i in range(50))
    rows = [
        (1, dup, "srcA"),
        (2, " ".join(f"alpha{i:03d}" for i in range(50)), "srcA"),
        (3, dup + " tail", "srcB"),
        (4, " ".join(f"beta{i:03d}" for i in range(50)), "srcB"),
        (5, " ".join(f"gamma{i:03d}" for i in range(50)), "srcB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    cells = {
        (r.source_a, r.source_b): r
        for r in dedup.source_overlap_matrix(spark, str(tmp_path)).collect()
    }
    assert set(cells) == {("srcA", "srcB")}
    cell = cells[("srcA", "srcB")]
    assert cell.n_pairs == 1
    assert cell.n_possible == 2 * 3
    assert cell.pair_rate == pytest.approx(1 / 6, abs=1e-6)


def test_curation_pipeline_is_intersection_of_standalone_applies(spark):
    """The composed pipeline's survivors must be EXACTLY the
    intersection of the standalone stage survivor sets (each stage
    reports the same policy it applies standalone), minus the
    benchmark source."""
    from pyspark.sql import functions as F

    from pdftotext_spark.operators import curation, dedup, textstats

    sf = "/root/testdata/sf0.001"
    got = {r.doc_id for r in curation.curation_pipeline(spark, sf).collect()}

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    text = F.col("text")
    n_words = (textstats._count_occ(text, " ") + 1).cast("long")
    awl = F.length(F.replace(text, F.lit(" "), F.lit(""))) / n_words
    quality = {
        r.doc_id
        for r in docs.filter(
            (n_words >= textstats.QF_MIN_WORDS)
            & (n_words <= textstats.QF_MAX_WORDS)
            & (awl >= textstats.QF_MIN_AVG_WORD_LEN)
            & (awl <= textstats.QF_MAX_AVG_WORD_LEN)
        ).select("doc_id").collect()
    }
    non_bench = {
        r.doc_id for r in docs.filter("source <> 'src0'").select("doc_id").collect()
    }
    exact_keep = {
        r.canonical_doc_id for r in dedup.dedup_exact(spark, sf).collect()
    }
    lsh_losers = {
        r.doc_b for r in dedup.minhash_lsh_pairs(spark, sf).collect()
    }
    decon_keep = {
        r.doc_id for r in dedup.decontaminate_apply(spark, sf).collect()
    }
    expected = (
        non_bench & quality & exact_keep & decon_keep
    ) - lsh_losers
    assert got == expected
    # the pipeline must both keep a real training set and drop rows
    assert got and len(got) < len(non_bench)


def test_long_documents_sampled_volume_and_detection(spark, tmp_path):
    """Scale evidence for the whole-document sampling policy on
    LONG documents (the corpus tables average ~300 chars; real web
    docs are KBs): at the default rate the downstream shingle volume
    is ~KEEP16/16 of positions (the cost bound), a tail-only
    duplicate's shared content IS visible in the sampled shingle
    sets (identically in both docs — the signal any containment-
    aware consumer reads; banded MinHash itself targets whole-doc
    near-identity, and jaccard ~0.06 containment is below its
    operating point by design), and the rate lever cuts volume
    proportionally."""
    import importlib
    import random

    from pdftotext_spark.operators import dedup

    rng = random.Random(7)
    words = [f"w{rng.randrange(10**6):06d}" for _ in range(3000)]
    body_a = " ".join(words)                       # ~21 KB, non-repetitive
    body_b = " ".join(f"x{rng.randrange(10**6):06d}" for _ in range(3000))
    shared_tail = " ".join(f"t{rng.randrange(10**6):06d}" for _ in range(400))
    rows = [
        (1, body_a + " " + shared_tail, "s"),      # dup ONLY in the tail
        (2, body_b + " " + shared_tail, "s"),
        (3, " ".join(f"z{rng.randrange(10**6):06d}" for _ in range(3000)), "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))

    n_chars = {r.doc_id: len(r.text) for (r) in df.collect()}
    assert min(n_chars.values()) > 20_000          # genuinely long docs

    sampled = {
        r.doc_id: r.n
        for r in dedup._shingles(docs, distinct=False)
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for did, n in sampled.items():
        positions = n_chars[did] - 7
        # md5 keep rate: KEEP16/16 of positions, ±20% tolerance
        assert 0.8 * positions * dedup.SHINGLE_KEEP16 / 16 < n
        assert n < 1.2 * positions * dedup.SHINGLE_KEEP16 / 16

    # the tail-only duplicate pair is detected at the default rate
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(spark, str(tmp_path)).collect()
    }
    # tail is ~12% of each doc -> true containment, not near-identity;
    # the banded MinHash finding it (or not) depends on jaccard ~0.06,
    # so assert on the DIRECT signal instead: the shared tail's
    # sampled shingles are present and identical in both docs
    sh = dedup._shingles(docs, distinct=True)
    both = (
        sh.filter(F.col("doc_id").isin(1, 2))
        .groupBy("sh").agg(F.count("*").alias("k"))
        .filter(F.col("k") == 2).count()
    )
    # shared tail ~2.8 KB -> ~2793 positions, ~1/4 sampled
    assert both > 500
    assert not any(3 in p for p in pairs)  # doc 3 never pairs

    # rate lever: KEEP16=1 cuts sampled volume ~4x vs the default 4
    import os as _os

    _os.environ["SPARK_GRAFT_SHINGLE_KEEP16"] = "1"
    try:
        low = importlib.reload(dedup)
        lowed = {
            r.doc_id: r.n
            for r in low._shingles(docs, distinct=False)
            .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
        }
        for did in lowed:
            ratio = lowed[did] / sampled[did]
            assert 0.15 < ratio < 0.35  # ~1/4 of the 4/16 volume
    finally:
        del _os.environ["SPARK_GRAFT_SHINGLE_KEEP16"]
        restored = importlib.reload(dedup)
        assert restored.SHINGLE_KEEP16 == 4


def test_dedup_apply_srp_constructed(spark, tmp_path):
    """Hand-checked semantic test for the SRP apply (the parity gate
    is blind to a survivor-policy inversion implemented identically in
    both engines): two near-identical embeddings -> the LARGER vec_id
    is dropped; an orthogonal-ish vector survives."""
    import numpy as np

    from pdftotext_spark.operators import similarity

    rng = np.random.default_rng(11)
    base = rng.normal(size=64)
    base /= np.linalg.norm(base)
    near = base + rng.normal(scale=0.01, size=64)
    other = rng.normal(size=64)
    rows = [
        (10, 0, [float(x) for x in base]),
        (20, 0, [float(x) for x in near]),
        (30, 0, [float(x) for x in other]),
    ]
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    pairs = {
        (r.vec_a, r.vec_b)
        for r in similarity.srp_neardup_pairs(spark, str(tmp_path)).collect()
    }
    assert (10, 20) in pairs  # cosine ~1.0: every SRP band collides
    kept = {
        r.vec_id
        for r in similarity.dedup_apply_srp(spark, str(tmp_path)).collect()
    }
    assert 10 in kept and 20 not in kept  # min-id survivor policy
    assert 30 in kept                     # unrelated vector untouched


def test_paragraph_dedup_constructed(spark, tmp_path):
    """Hand-checked CCNet-style segment dedup (PARA_W=40 fixed
    windows): a later doc repeating an EARLIER doc's aligned segment
    loses it (kept=False, first_doc_id points back); within-doc
    repeats keep only the first; the apply rebuild preserves NUMERIC
    segment order (>= 10 segments — the '10' < '2' string-sort trap
    the oracle comment documents) and zero-token docs still emit an
    apply row."""
    from pdftotext_spark.operators import dedup

    assert dedup.PARA_W == 40
    seg = lambda tag: " ".join(f"{tag}{i:02d}" for i in range(40))
    p1, p2 = seg("pa"), seg("pb")
    doc_a = p1 + " " + p2                     # segments: [p1, p2]
    doc_b = p2 + " " + seg("ub")              # [p2 (dup of A#1), unique]
    # 12 segments, #3 and #7 duplicate A's p1, rest distinct
    c_segs = [seg(f"c{k}") for k in range(12)]
    c_segs[3] = p1
    c_segs[7] = p1
    doc_c = " ".join(c_segs)
    rows = [(1, doc_a, "s"), (2, doc_b, "s"), (3, doc_c, "s"), (4, "", "s")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    v = {
        (r.doc_id, r.seg_idx): r
        for r in dedup.paragraph_dedup(spark, sf).collect()
    }
    assert v[(1, 0)].kept and v[(1, 1)].kept
    assert not v[(2, 0)].kept and v[(2, 0)].first_doc_id == 1
    assert v[(2, 1)].kept
    assert not v[(3, 3)].kept and not v[(3, 7)].kept
    assert v[(3, 3)].first_doc_id == 1
    assert all(v[(3, k)].kept for k in range(12) if k not in (3, 7))
    assert (4, 0) not in v  # zero-token docs emit no segment

    a = {r.doc_id: r for r in dedup.paragraph_dedup_apply(spark, sf).collect()}
    assert a[1].clean_text == doc_a and a[1].removed_segments == 0
    assert a[2].clean_text == seg("ub")
    assert a[2].removed_segments == 1 and a[2].removed_tokens == 40
    expect_c = " ".join(s for k, s in enumerate(c_segs) if k not in (3, 7))
    assert a[3].clean_text == expect_c       # numeric order past idx 9
    assert a[3].removed_segments == 2 and a[3].removed_tokens == 80
    assert a[4].clean_text == "" and a[4].removed_segments == 0

    # the DuckDB twins replay the identical verdicts and rebuilds
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    orc_v = {
        (r[0], r[1]): r
        for r in con.execute(dedup.PARAGRAPH_DEDUP_SQL).fetchall()
    }
    assert {k: (r.n_seg_tokens, r.kept, r.first_doc_id) for k, r in v.items()} == {
        k: (r[2], r[3], r[4]) for k, r in orc_v.items()
    }
    orc_a = {
        r[0]: tuple(r[1:])
        for r in con.execute(dedup.PARAGRAPH_DEDUP_APPLY_SQL).fetchall()
    }
    assert orc_a == {
        d: (r.clean_text, r.removed_segments, r.removed_tokens)
        for d, r in a.items()
    }
