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

from pyspark.sql import DataFrame, SparkSession, Window
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


def bm25_index_for(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Build the inverted-index representation of a ``(doc_id, text)``
    frame: ``(postings, stats)``.

    ``postings`` is one row per (term, doc_id) with the term frequency
    and the document length denormalized in (``term, doc_id, tf, dl``)
    — the standard posting-list layout: storing ``dl`` beside ``tf``
    means query-time scoring never joins back to a corpus-cardinality
    lengths frame. ``stats`` is the ONE-row corpus frame
    (``n_docs, sum_dl``) aggregated over ALL documents (including
    zero-token ones, matching :func:`bm25_topk_for`'s stats exactly).

    100 TB shape: the index build is one explode + one groupBy on
    (term, doc_id) — the classic one-time indexing shuffle. Persist
    ``postings`` partitioned/bucketed by ``term`` and query-time term
    filters become partition pruning instead of a scan."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr("filter(split(lower(text), ' '), t -> t <> '')").alias("a"),
    )
    ex = toks.select(
        "doc_id",
        F.size("a").cast("long").alias("dl"),
        F.explode("a").alias("term"),
    )
    postings = ex.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf"),
        F.min("dl").cast("long").alias("dl"),
    )
    stats = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("a").cast("long")).cast("long").alias("sum_dl"),
    )
    return postings, stats


def bm25_topk_indexed_for(
    postings: DataFrame,
    stats: DataFrame,
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOPK,
) -> DataFrame:
    """Query-time BM25 over an inverted index from
    :func:`bm25_index_for` — NEXT.md #11's scale path behind the SAME
    per-term scoring expression (:func:`_bm25_term_sql`) as the
    brute-force :func:`bm25_topk_for`.

    Candidate semantics (standard retrieval): only documents
    containing >= 1 query term are ranked — the brute-force scan pads
    with zero-score documents when fewer than k candidates exist; the
    indexed path by construction cannot see them. For every emitted
    doc the integer micro-unit score is IDENTICAL to the brute-force
    value: each posting row is exactly one (doc, term) contribution,
    rounded per term then integer-summed, the same algebra in a
    different order of grouping.

    100 TB shape: the ``term IN (...)`` filter prunes the posting scan
    to the query terms (Catalyst pushes it through the index groupBy
    when composed in-plan; against a persisted term-partitioned index
    it is partition pruning), per-term df is a COUNT WINDOW over the
    filtered postings — not a groupBy+join-back, which would re-run
    the corpus explode lineage a second time (ReusedExchange does NOT
    collapse differently-projected subtrees; the round-6 ExactSubstr
    lesson) — the corpus stats row is the Lloyd/BPE broadcast-scalar
    pattern, and the final ranking is a groupBy over only matching
    postings + TakeOrderedAndProject — ONE Generate of the corpus at
    index-build, no full-corpus work at query time."""
    qp = postings.filter(F.col("term").isin(*terms))
    qp = qp.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("long")
    )
    contrib = F.expr(_bm25_term_sql("tf", "df"))
    scored = qp.join(F.broadcast(stats)).select(
        "doc_id", contrib.alias("contrib")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("contrib").cast("long").alias("bm25_micro"),
        )
        .orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(k)
    )


def bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered inverted-index BM25: build the posting lists over
    ``documents`` in-plan and rank the fixed query
    :data:`BM25_QUERY_TERMS`. Columns: doc_id, n_terms (distinct
    query terms present), bm25_micro."""
    postings, stats = bm25_index_for(_read(spark, sf_dir, "documents"))
    return bm25_topk_indexed_for(postings, stats)


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

_QTERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

BM25_TOPK_INDEXED_SQL = f"""
WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS a
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(a)) AS BIGINT) AS sum_dl
  FROM toks
),
postings AS (
  SELECT term, doc_id,
         CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(MIN(dl) AS BIGINT) AS dl
  FROM (
    SELECT doc_id, CAST(len(a) AS BIGINT) AS dl, unnest(a) AS term
    FROM toks
  )
  GROUP BY term, doc_id
),
qp AS (
  SELECT *, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
  FROM postings WHERE term IN ({_QTERMS_SQL})
),
scored AS (
  SELECT qp.doc_id, {_bm25_term_sql("tf", "df")} AS contrib
  FROM qp, stats
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(contrib) AS BIGINT) AS bm25_micro
FROM scored
GROUP BY doc_id
ORDER BY bm25_micro DESC, doc_id
LIMIT {BM25_TOPK}
"""
