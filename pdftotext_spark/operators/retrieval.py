"""Retrieval scoring: BM25 top-k over the documents table.

A training-data pipeline needs keyword retrieval constantly —
pulling eval-adjacent documents for decontamination review, sampling
topical subsets, debugging dedup clusters ("show me everything about
X"). BM25 (Robertson & Zaragoza 2009, the Okapi weighting) is the
standard lexical scorer; this is the brute-force scan variant (the
oracle-checkable baseline — at 100 TB the same scoring expression
runs behind an inverted-index or pruned-posting source, which changes
the scan, not the math).

Portability: the per-term score is ONE shared SQL-dialect expression
(:func:`_bm25_term_sql`) both engines evaluate verbatim — identical
literals, identical operation order — rounded per term to integer
micro-units and integer-summed (the unigram_logloss order-proof
discipline), so cross-engine double drift cannot reorder the top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# fixed benchmark query (terms present in the synthetic vocabulary)
BM25_QUERY_TERMS = ("window", "spark", "join")


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _bm25_term_sql(tf: str, df: str) -> str:
    """Okapi BM25 term contribution in integer micro-units, as a SQL
    expression string valid in BOTH Spark SQL and DuckDB (ln, round,
    CASE, CAST all shared). References columns ``{tf}``, ``{df}``,
    ``n_docs``, ``sum_dl``, ``dl`` — k1=1.2 (so k1+1=2.2) and b=0.75
    (so 1-b=0.25) are baked as literals so the expression text is
    byte-identical across engines. Every literal is spelled in ``e0``
    double notation: a bare ``1.0`` is a DECIMAL literal in both Spark
    SQL and DuckDB, and decimal-scaled division diverges from the IEEE
    doubles the pure-Python replay test computes — in double form all
    THREE engines share the same operation-ordered float semantics."""
    idf = f"ln(1e0 + (n_docs - {df} + 0.5e0) / ({df} + 0.5e0))"
    norm = f"({tf} + 1.2e0 * (0.25e0 + 0.75e0 * (dl * 1e0 * n_docs) / sum_dl))"
    return (
        f"CAST(round(CASE WHEN {tf} > 0 THEN "
        f"{idf} * ({tf} * 2.2e0) / {norm} * 1000000e0 "
        f"ELSE 0e0 END, 0) AS BIGINT)"
    )


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-:data:`BM25_TOPK` documents for the fixed query
    :data:`BM25_QUERY_TERMS` by BM25 (k1=1.2, b=0.75), with per-term
    frequencies observable. Ties break on doc_id.

    100 TB shape: one narrow token scan computes per-doc (dl, tf_t);
    corpus stats (N, Σdl, df_t) are ONE single-row aggregation
    broadcast back via crossJoin (the Lloyd/BPE scalar pattern);
    scoring is a zero-shuffle map and the top-k is
    TakeOrderedAndProject — no full sort, no wide shuffle. The token
    projection is scanned twice (stats + scoring), both narrow."""
    return bm25_topk_for(_read(spark, sf_dir, "documents"))


def bm25_topk_for(docs: DataFrame) -> DataFrame:
    """Core of :func:`bm25_topk` over an arbitrary ``(doc_id, text)``
    frame — the constructed-input surface the pure-Python BM25 replay
    test drives (a third engine the DuckDB-parity blindness can't
    fool)."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr("filter(split(lower(text), ' '), t -> t <> '')").alias("a"),
    )
    m = toks.select(
        "doc_id",
        F.size("a").cast("long").alias("dl"),
        *[
            F.size(F.expr(f"filter(a, x -> x = '{t}')"))
            .cast("long")
            .alias(f"tf_{t}")
            for t in BM25_QUERY_TERMS
        ],
    )
    stats = m.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long"))
            .cast("long")
            .alias(f"df_{t}")
            for t in BM25_QUERY_TERMS
        ],
    )
    score = sum(
        (
            F.expr(_bm25_term_sql(f"tf_{t}", f"df_{t}"))
            for t in BM25_QUERY_TERMS
        ),
        F.lit(0).cast("long"),
    )
    return (
        m.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "dl",
            *[f"tf_{t}" for t in BM25_QUERY_TERMS],
            score.cast("long").alias("bm25_micro"),
        )
        .orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(BM25_TOPK)
    )


_TF_SQL = ", ".join(
    f"CAST(len(list_filter(a, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
    for t in BM25_QUERY_TERMS
)
_DF_SQL = ", ".join(
    f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
    for t in BM25_QUERY_TERMS
)
_SCORE_SQL = " + ".join(
    _bm25_term_sql(f"tf_{t}", f"df_{t}") for t in BM25_QUERY_TERMS
)

BM25_TOPK_SQL = f"""
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(a) AS BIGINT) AS dl, {_TF_SQL}
  FROM (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), t -> t <> '') AS a
    FROM documents
  )
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl, {_DF_SQL}
  FROM m
)
SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in BM25_QUERY_TERMS)},
       CAST({_SCORE_SQL} AS BIGINT) AS bm25_micro
FROM m, stats
ORDER BY bm25_micro DESC, doc_id
LIMIT {BM25_TOPK}
"""
