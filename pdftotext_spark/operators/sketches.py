"""Frequency sketches over the corpus vocabulary.

``token_cms`` materializes a Count-Min Sketch (Cormode & Muthukrishnan,
J. Algorithms 2005) as a tiny DataFrame: ``depth`` independent hash
rows × ``width`` counters. At 100 TB the sketch is THE way to ask
"how often does token X appear" without shuffling the full token
stream into a vocabulary-sized aggregation: the groupBy key space is
``depth × width`` (constant), map-side partial aggregation does almost
all the work, and the result broadcasts anywhere.

Hash rows derive from md5 — deterministic and engine-portable, so the
DuckDB oracle value-checks every counter. ``heavy_hitters_exact`` is
the exact top-k companion (and the recall baseline for sketch-based
point estimates, pinned in tests: CMS estimate ≥ true count, equal in
the no-collision regime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdftotext_spark.operators.materialize import materialize

CMS_DEPTH = 4
CMS_WIDTH = 1024
TOP_K_TOKENS = 20


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")


def _hex_val_sql(h_expr: str, start: int, n: int) -> str:
    """Integer value of ``n`` md5-hex nibbles starting at 1-based
    ``start`` — the dialect-neutral position/substr arithmetic shared
    by the CMS bucket hash, the HLL registers and the Bloom positions
    (BIGINT casts: 15·16^7 overflows INT). The SimHash per-bit votes
    (dedup._simhash_bit_exprs) are the same idiom specialized to one
    nibble + a bit test."""
    parts = [
        f"CAST(position(substr({h_expr}, {start + j}, 1) "
        f"IN '0123456789abcdef') - 1 AS BIGINT) * {16 ** (n - 1 - j)}"
        for j in range(n)
    ]
    return "(" + " + ".join(parts) + ")"


def _bucket_expr(row: int, tok_expr: str = "tok") -> str:
    """Row hash: three md5 hex nibbles of ('row:' || token) assembled
    into an int mod width."""
    h = f"md5('{row}:' || {tok_expr})"
    return f"({_hex_val_sql(h, 6, 3)} % {CMS_WIDTH})"


def cms_counters(toks: DataFrame) -> DataFrame:
    """Counter table ``(row_idx, bucket, cnt)`` for a ``tok`` column —
    the mergeable CMS state (counters are additive: sum-merge across
    partial sketches is exact, which the streaming variant relies on).
    ONE token scan: each token explodes into its depth × (row, bucket)
    assignments (a union of per-row scans would read the corpus depth
    times)."""
    assigned = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_idx"),
                        F.expr(_bucket_expr(r)).cast("long").alias("bucket"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("rb")
    ).select("rb.row_idx", "rb.bucket")
    return assigned.groupBy("row_idx", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch table: one row per non-empty counter,
    ``(row_idx, bucket, cnt)``. Point estimate for a token =
    min over rows of its counter."""
    return cms_counters(_tokens(spark, sf_dir))


TOKEN_CMS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
nonempty AS (SELECT tok FROM toks WHERE tok <> ''),
assigned AS (
  {" UNION ALL ".join(f"SELECT {r} AS row_idx, {_bucket_expr(r)} AS bucket FROM nonempty" for r in range(CMS_DEPTH))}
)
SELECT row_idx, CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM assigned GROUP BY row_idx, bucket
"""


def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k vocabulary heavy hitters (count desc, token asc for
    a deterministic tie order) — the baseline sketch estimates are
    judged against."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(TOP_K_TOKENS)
    )


HEAVY_HITTERS_EXACT_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks WHERE tok <> ''
GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT {TOP_K_TOKENS}
"""


def cms_point_estimate(cms: DataFrame, token: str) -> int:
    """min over depth rows of the token's counters — the CMS query
    primitive (never underestimates; overestimates only on collision)."""
    safe = token.replace("'", "''")
    conds = [
        (F.col("row_idx") == r)
        & (F.col("bucket") == F.expr(_bucket_expr(r, tok_expr=f"'{safe}'")))
        for r in range(CMS_DEPTH)
    ]
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    row = cms.filter(cond).agg(F.min("cnt").alias("est"), F.count("*").alias("hit")).first()
    if row["hit"] < CMS_DEPTH:
        return 0  # some row has a zero counter → token absent
    return int(row["est"])


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier
# 2007) — portable: registers derive from md5 nibble arithmetic so the
# DuckDB oracle replays every register AND the estimate bit-for-bit
# (the 2^-rho sum is a bounded-span sum of exact binary fractions, so
# double addition is exact in any order; the final multiply/divide is
# deterministic IEEE).
# ---------------------------------------------------------------------------

HLL_M = 64  # 2^6 registers
HLL_ALPHA = 0.709  # bias constant for m = 64


def _hll_rho(items: DataFrame, col: str, keep_item: bool = False) -> DataFrame:
    """Per-item ``(idx, rho[, item])`` HLL assignment for the string
    column ``col`` — the single-source hash/rank rule behind
    :func:`hll_registers` and the fused exact+estimate pass of
    :func:`hll_distinct` (``keep_item=True`` carries the value through
    for a per-register COUNT DISTINCT)."""
    idx = f"({_hex_val_sql(f'md5({col})', 1, 2)} % {HLL_M})"
    w = _hex_val_sql(f"md5({col})", 9, 8)  # 32-bit sample for the rank
    first = [
        F.expr(idx).cast("int").alias("idx"),
        F.expr(w).cast("long").alias("w"),
    ]
    if keep_item:
        first.append(F.col(col).alias("item"))
    # rho = leading zeros of the 32-bit w, + 1  =  33 - bit_length(w)
    rho = F.expr(
        "CASE WHEN w = 0 THEN 33 "
        "ELSE 33 - length(conv(CAST(w AS STRING), 10, 2)) END"
    ).cast("int").alias("rho")
    keep = ["idx", rho] + (["item"] if keep_item else [])
    return items.select(*first).select(*keep)


def hll_registers(items: DataFrame, col: str) -> DataFrame:
    """Per-register max-rank table ``(idx, maxrho)`` for the string
    column ``col`` — the mergeable HLL state (max-merge is commutative,
    associative, AND idempotent, which is what makes the streaming
    variant replay-safe). Duplicate items are harmless (max)."""
    return _hll_rho(items, col).groupBy("idx").agg(
        F.max("rho").alias("maxrho")
    )


def _hll_est_expr() -> str:
    """Raw-HLL estimate over a summary row with ``sum_obs`` /
    ``registers_hit`` — ONE string shared by both consumers below."""
    return (
        f"round(CAST({HLL_ALPHA} AS DOUBLE) * {HLL_M * HLL_M} "
        f"/ (sum_obs + ({HLL_M} - registers_hit)), 4)"
    )


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """One-row raw-HLL estimate from an ``(idx, maxrho)`` register
    table (missing registers count as 2^0)."""
    summary = regs.agg(
        F.count("*").cast("long").alias("registers_hit"),
        F.sum(
            F.expr(
                "CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), maxrho) AS DOUBLE)"
            )
        ).alias("sum_obs"),
    )
    return summary.select(
        F.lit(HLL_M).cast("long").alias("m"),
        "registers_hit",
        F.expr(_hll_est_expr()).cast("double").alias("est_distinct"),
    )


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate of the corpus's distinct char-8-gram shingle count,
    next to the exact answer (the audit baseline, like
    ``heavy_hitters_exact`` for the CMS).

    100 TB shape: the sketch path groups into a CONSTANT key space of
    m=64 registers with map-side partial max — the answer to "how many
    distinct shingles" without shuffling a shingle-cardinality set.
    The exact twin (countDistinct) IS that expensive full shuffle; at
    scale you run only the register path. Raw estimate only (no
    small-range correction: ln() is not bit-portable across engines;
    at shingle cardinalities the raw regime is the operative one).

    r7 fusion: estimate and exact twin share ONE shingle scan — per
    register, ``max(rho)`` and ``COUNT(DISTINCT sh)`` come from the
    same groupBy(idx) (every distinct shingle maps to exactly one
    register, so Σ per-register distinct counts == the global
    distinct count), instead of two independent explode+md5 passes.
    """
    from pdftotext_spark.operators import dedup

    docs = _read(spark, sf_dir, "documents")
    # duplicate-insensitive (register max), so skip the distinct shuffle
    sh = dedup._shingles(docs, distinct=False).select("sh")
    # manual two-level distinct: groupBy (idx, item) first — NOT
    # countDistinct inside the register agg, whose Expand rewrite
    # doubles every exploded row before the partial aggregate; the
    # (idx, item) partial agg instead dedups map-side. max over
    # per-item maxes == max over all rows (same rho per item).
    per_pair = _hll_rho(sh, "sh", keep_item=True).groupBy(
        "idx", "item"
    ).agg(F.max("rho").alias("rho"))
    per_reg = per_pair.groupBy("idx").agg(
        F.max("rho").alias("maxrho"),
        F.count("*").cast("long").alias("nd"),
    )
    summary = per_reg.agg(
        F.count("*").cast("long").alias("registers_hit"),
        F.sum(
            F.expr(
                "CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), maxrho) AS DOUBLE)"
            )
        ).alias("sum_obs"),
        F.sum("nd").cast("long").alias("exact_distinct"),
    )
    return summary.select(
        F.lit(HLL_M).cast("long").alias("m"),
        "registers_hit",
        F.expr(_hll_est_expr()).cast("double").alias("est_distinct"),
        "exact_distinct",
    )


def _hll_sql() -> str:
    from pdftotext_spark.operators import dedup

    idx = f"({_hex_val_sql('md5(sh)', 1, 2)} % {HLL_M})"
    w = _hex_val_sql("md5(sh)", 9, 8)
    return f"""
WITH sh AS ({dedup.sampled_shingle_scan_sql("sh", distinct=False)}),
assigned AS (SELECT {idx} AS idx, {w} AS w FROM sh),
rho AS (
  SELECT idx,
         CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END AS rho
  FROM assigned
),
regs AS (SELECT idx, MAX(rho) AS maxrho FROM rho GROUP BY idx),
summary AS (
  SELECT COUNT(*) AS registers_hit,
         SUM(CAST(1 AS DOUBLE)
             / CAST((CAST(1 AS BIGINT) << maxrho) AS DOUBLE)) AS sum_obs
  FROM regs
),
exact AS (SELECT COUNT(DISTINCT sh) AS exact_distinct FROM sh)
SELECT CAST({HLL_M} AS BIGINT) AS m,
       CAST(registers_hit AS BIGINT) AS registers_hit,
       CAST(round(CAST({HLL_ALPHA} AS DOUBLE) * {HLL_M * HLL_M}
            / (sum_obs + ({HLL_M} - registers_hit)), 4) AS DOUBLE)
         AS est_distinct,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM summary, exact
"""


# ---------------------------------------------------------------------------
# Bloom-filter novelty probe (Bloom 1970): build the bit set over one
# half of the corpus, probe the other half, measure the false-positive
# rate against the exact membership join. At 100 TB the bits table is
# ≤ BLOOM_BITS rows after distinct — ALWAYS broadcastable (size m to
# n·k/ln2 for the target fp; 2^16 here is deliberately tight for the
# test corpus so the measured fp_rate is non-trivial).
# ---------------------------------------------------------------------------

BLOOM_K = 4  # hash functions
BLOOM_NIBBLES = 4  # 16-bit positions -> m = 65536 bits
BLOOM_BITS = 16 ** BLOOM_NIBBLES


def _bloom_pos_sql(salt: int) -> str:
    return _hex_val_sql(f"md5('{salt}:' || sh)", 1, BLOOM_NIBBLES)


def bloom_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split the corpus shingle set by source parity, Bloom-insert the
    even half, probe the odd half; report measured membership vs the
    exact semi-join (no false negatives by construction — pinned in
    tests — and a tunable false-positive rate)."""
    from pdftotext_spark.operators import dedup

    docs = _read(spark, sf_dir, "documents")
    # full-suffix parse on BOTH sides (an 8-char cap here vs the
    # oracle's unbounded substr would split 9+-digit ids differently);
    # non-numeric suffixes -> NULL -> dropped identically (TRY_CAST in
    # the oracle mirrors Spark's non-ANSI NULL-on-bad-cast)
    docs_par = docs.select(
        F.expr("CAST(substring(source, 4) AS INT) % 2").alias("doc_id"),
        "text",
    ).filter(F.col("doc_id").isNotNull())
    # reuse the dedup shingler with parity standing in for doc_id:
    # distinct (par, sh) pairs in one scan, shared by both sides
    s = dedup._shingles(docs_par, distinct=True).withColumnRenamed(
        "doc_id", "par"
    ).transform(materialize)
    train = s.filter("par = 0").select("sh")
    probe = s.filter("par = 1").select("sh")
    bits = (
        train.select(
            F.explode(
                F.array(
                    *[
                        F.expr(_bloom_pos_sql(i)).cast("long")
                        for i in range(BLOOM_K)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    probe_pos = probe.select(
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hi"),
                        F.expr(_bloom_pos_sql(i)).cast("long").alias("pos"),
                    )
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("hp"),
    ).select("sh", "hp.pos")
    hits = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("sh")
        .agg(F.count("*").alias("nhit"))
    )
    bloom_pos = hits.filter(F.col("nhit") == BLOOM_K).agg(
        F.count("*").cast("long").alias("bloom_positives")
    )
    # set sizes + exact membership in ONE grouped pass over s instead
    # of three separate count/semi-join jobs: per sh, flag which sides
    # contain it, then sum the flags
    member_stats = (
        s.groupBy("sh")
        .agg(
            F.max(F.expr("CASE WHEN par = 0 THEN 1 ELSE 0 END")).alias("t"),
            F.max(F.expr("CASE WHEN par = 1 THEN 1 ELSE 0 END")).alias("p"),
        )
        .agg(
            F.sum("t").cast("long").alias("n_train"),
            F.sum("p").cast("long").alias("n_probe"),
            F.sum(F.col("t") * F.col("p")).cast("long").alias("true_members"),
        )
    )
    n_bits = bits.agg(F.count("*").cast("long").alias("bits_set"))
    out = (
        member_stats.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(bloom_pos))
    )
    return out.select(
        "n_train",
        "n_probe",
        "bits_set",
        "bloom_positives",
        "true_members",
        (F.col("bloom_positives") - F.col("true_members"))
        .cast("long")
        .alias("false_positives"),
        F.expr(
            "round(CAST(bloom_positives - true_members AS DOUBLE)"
            " / greatest(n_probe - true_members, 1), 6)"
        ).cast("double").alias("fp_rate"),
    )


def _bloom_sql() -> str:
    from pdftotext_spark.operators import dedup

    pos_train = " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql(i)} AS pos FROM train"
        for i in range(BLOOM_K)
    )
    pos_probe = " UNION ALL ".join(
        f"SELECT sh, {_bloom_pos_sql(i)} AS pos FROM probe"
        for i in range(BLOOM_K)
    )
    return f"""
WITH s AS ({dedup.sampled_shingle_scan_sql(
        "sh, TRY_CAST(substr(source, 4) AS INT) % 2 AS par",
        where="TRY_CAST(substr(source, 4) AS INT) IS NOT NULL",
    )}),
train AS (SELECT DISTINCT sh FROM s WHERE par = 0),
probe AS (SELECT DISTINCT sh FROM s WHERE par = 1),
bits AS (SELECT DISTINCT pos FROM ({pos_train})),
ppos AS (SELECT sh, pos FROM ({pos_probe})),
hits AS (
  SELECT sh, COUNT(*) AS nhit FROM ppos JOIN bits USING (pos) GROUP BY sh
),
agg AS (
  SELECT (SELECT COUNT(*) FROM train) AS n_train,
         (SELECT COUNT(*) FROM probe) AS n_probe,
         (SELECT COUNT(*) FROM bits) AS bits_set,
         (SELECT COUNT(*) FROM hits WHERE nhit = {BLOOM_K}) AS bloom_positives,
         (SELECT COUNT(*) FROM probe
          WHERE sh IN (SELECT sh FROM train)) AS true_members
)
SELECT CAST(n_train AS BIGINT) AS n_train,
       CAST(n_probe AS BIGINT) AS n_probe,
       CAST(bits_set AS BIGINT) AS bits_set,
       CAST(bloom_positives AS BIGINT) AS bloom_positives,
       CAST(true_members AS BIGINT) AS true_members,
       CAST(bloom_positives - true_members AS BIGINT) AS false_positives,
       CAST(round(CAST(bloom_positives - true_members AS DOUBLE)
            / greatest(n_probe - true_members, 1), 6) AS DOUBLE) AS fp_rate
FROM agg
"""


HLL_DISTINCT_SQL = _hll_sql()
BLOOM_NOVELTY_SQL = _bloom_sql()


# ---------------------------------------------------------------------------
# Log2-bucket quantile sketch (DDSketch shape, Masson et al. 2019,
# with gamma = 2): bucket = bit_length of the 2^20-scaled value — an
# EXACT integer computation in both engines (the conv/bin trick the
# HLL rank shares), so unlike t-digest there is zero float-boundary
# risk and the oracle value-checks every bucket. Quantile estimates
# carry the guaranteed relative-error bound of the bucket base
# (here 2x; a production gamma of 1.02 just means more buckets —
# the key-space stays constant-bounded either way).
# ---------------------------------------------------------------------------

QSKETCH_SCALE = 1 << 20  # value scaling before integer bucketing
# shift-safe top bucket: bucket 63 would be 1<<63, which OVERFLOWS in
# DuckDB (error) and WRAPS negative in Spark — values >= 2^42 saturate
# into bucket 62 instead (documented edge of the sketch's range)
QSKETCH_MAX_BUCKET = 62


def qsketch_bucket_col():
    """The log2 bucket expression for a ``value`` column — the single
    source both the batch operator and the streaming fold use (a
    drifted copy would silently split the two sketches).

    GREATEST(scaled, 1): positive values below the 2^-20 resolution
    round to scaled 0 and saturate into bucket 1 (below-resolution
    values lose the relative-error bound, by construction of any
    fixed-resolution log sketch). ROUND before the integer cast:
    Spark's cast truncates where DuckDB's rounds."""
    return F.expr(
        f"least(length(conv(CAST(GREATEST(CAST(ROUND(value * {QSKETCH_SCALE}, 0) "
        f"AS BIGINT), 1) AS STRING), 10, 2)), {QSKETCH_MAX_BUCKET})"
    ).cast("long")


def qsketch_table_from_hist(hist: DataFrame) -> DataFrame:
    """Attach cumulative counts and value bounds to a ``(bucket,
    cnt)`` histogram — shared by the batch operator and the streaming
    merge reader."""
    from pyspark.sql.window import Window

    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum_cnt"),
        F.expr(
            f"CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) - 1) AS DOUBLE)"
            f" / {QSKETCH_SCALE}"
        ).alias("lo"),
        F.expr(
            f"CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) AS DOUBLE)"
            f" / {QSKETCH_SCALE}"
        ).alias("hi"),
    )


def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch table over ``events.value``: one row per occupied
    log2 bucket with count, cumulative count, and the bucket's value
    bounds — everything a quantile query needs without touching the
    event stream again.

    100 TB shape: constant key space (≤ 62 buckets) with map-side
    partial aggregation — the quantile answer at any scale without
    sorting or shuffling values (the exact twin,
    ``median_value_by_type``, IS that expensive full percentile).
    Range: the 2x bound holds for values in [2^-19, 2^42]; outside,
    counts saturate into the edge buckets."""
    events = _read(spark, sf_dir, "events")
    hist = (
        events.filter(F.col("value") > 0)
        .select(qsketch_bucket_col().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return qsketch_table_from_hist(hist)


VALUE_QUANTILE_SKETCH_SQL = f"""
WITH hist AS (
  SELECT CAST(least(length(bin(GREATEST(CAST(ROUND(value * {QSKETCH_SCALE}, 0)
           AS BIGINT), 1))), {QSKETCH_MAX_BUCKET}) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE value > 0 GROUP BY 1
)
SELECT bucket, cnt,
       CAST(SUM(cnt) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_cnt,
       CAST((CAST(1 AS BIGINT) << CAST(bucket - 1 AS INT)) AS DOUBLE)
         / {QSKETCH_SCALE} AS lo,
       CAST((CAST(1 AS BIGINT) << CAST(bucket AS INT)) AS DOUBLE)
         / {QSKETCH_SCALE} AS hi
FROM hist
"""


def qsketch_quantile(sketch_rows, q: float) -> float:
    """Quantile estimate from collected sketch rows: the upper bound
    of the first bucket whose cumulative count reaches rank
    ceil(q * n) — within the bucket's relative-error bound of the
    RANK ORDER STATISTIC (not an interpolated quantile: on gapped
    distributions quantile_cont can land between buckets; compare
    against quantile_disc / sorted(values)[rank-1])."""
    import math

    rows = sorted(sketch_rows, key=lambda r: r["bucket"])
    if not rows:
        return float("nan")
    n = rows[-1]["cum_cnt"]
    rank = max(1, math.ceil(q * n))
    for r in rows:
        if r["cum_cnt"] >= rank:
            return r["hi"]
    return rows[-1]["hi"]
