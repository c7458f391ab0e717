"""End-to-end corpus curation: the composed detect→apply chain a
training-data build actually runs, as ONE DataFrame plan.

``curation_pipeline`` intersects four corpus-level policies over the
``documents`` table and returns the surviving training set:

1. benchmark exclusion — the held-out source (``src0``) never trains;
2. shallow quality gates — the Gopher/C4 word-count and mean-word-
   length windows (:mod:`pdftotext_spark.operators.textstats`);
3. exact dedup — only the canonical (min doc_id) copy of each byte-
   identical text survives (:func:`dedup.dedup_exact` semantics);
4. near-dup dedup — banded MinHash-LSH pairs, min-id survivor policy
   (:func:`dedup.apply_dedup` semantics);
5. decontamination — quarantine docs whose benchmark shingle overlap
   exceeds :data:`dedup.CONTAMINATION_THRESHOLD`
   (:func:`dedup.decontaminate_apply` semantics).

Each detector runs over the FULL corpus (detectors are corpus-level
statistics; gating them on each other's survivors would make results
order-dependent), and the applies compose as set intersection — the
same policy every stage reports standalone, so the pipeline output is
exactly the intersection of the standalone survivor sets (pinned by
test).

100 TB shape: one shuffle per detector (all banded/grouped — no
all-pairs anywhere), then three semi/anti joins on narrow doc_id
keys; AQE broadcasts the small survivor/loser sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdftotext_spark.operators import dedup, textstats


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving training set: (doc_id, source, n_tokens) after
    benchmark exclusion, quality gates, exact + near-dup dedup and
    decontamination (see module docstring)."""
    docs = dedup._read(spark, sf_dir, "documents")
    text = F.col("text")
    n_words = (textstats._count_occ(text, " ") + 1).cast("long")
    awl = F.length(F.replace(text, F.lit(" "), F.lit(""))) / n_words
    quality = (
        (n_words >= textstats.QF_MIN_WORDS)
        & (n_words <= textstats.QF_MAX_WORDS)
        & (awl >= textstats.QF_MIN_AVG_WORD_LEN)
        & (awl <= textstats.QF_MAX_AVG_WORD_LEN)
    )
    exact_keep = dedup.dedup_exact(spark, sf_dir).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    lsh_losers = dedup.minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    )
    decon_keep = dedup.decontaminate_apply(spark, sf_dir).select("doc_id")
    return (
        docs.filter(F.col("source") != "src0")
        .filter(quality)
        .select("doc_id", "source", n_words.alias("n_tokens"))
        .join(exact_keep, "doc_id", "left_semi")
        .join(lsh_losers, "doc_id", "left_anti")
        .join(decon_keep, "doc_id", "left_semi")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
    )


CURATION_PIPELINE_SQL = f"""
WITH s AS ({dedup._SHINGLES_SQL}),
sig AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         {dedup._SIG_EXPRS_SQL}
  FROM s GROUP BY doc_id
),
bands AS ({dedup._BANDS_SQL}),
lsh_losers AS (
  SELECT DISTINCT b.doc_id AS doc_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
exact_keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
decon_keep AS (
  SELECT doc_id FROM ({dedup.DECONTAMINATE_APPLY_SQL})
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       d.source,
       CAST({textstats._count_occ_sql('d.text', ' ')} + 1 AS BIGINT)
         AS n_tokens
FROM documents d
WHERE d.source <> 'src0'
  AND {textstats._QF_KEEP_SQL}
  AND d.doc_id IN (SELECT doc_id FROM exact_keep)
  AND d.doc_id NOT IN (SELECT doc_id FROM lsh_losers)
  AND d.doc_id IN (SELECT doc_id FROM decon_keep)
"""
