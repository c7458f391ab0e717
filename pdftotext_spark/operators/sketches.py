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


def _bucket_expr(row: int, tok_expr: str = "tok") -> str:
    """Row hash: three md5 hex nibbles of ('row:' || token) assembled
    into an int mod width — the same dialect-neutral position/substr
    arithmetic the SimHash operator shares between Spark and DuckDB."""
    nibs = [
        f"(position(substr(md5('{row}:' || {tok_expr}), {pos}, 1) "
        f"IN '0123456789abcdef') - 1) * {mult}"
        for pos, mult in ((6, 256), (7, 16), (8, 1))
    ]
    return f"(({' + '.join(nibs)}) % {CMS_WIDTH})"


def token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch table: one row per non-empty counter,
    ``(row_idx, bucket, cnt)``. Point estimate for a token =
    min over rows of its counter."""
    toks = _tokens(spark, sf_dir)
    # ONE token scan: each token explodes into its depth × (row,
    # bucket) assignments (a union of per-row scans would read and
    # shingle the corpus depth times)
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
