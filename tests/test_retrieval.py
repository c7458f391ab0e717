"""Constructed-input semantics for BM25 retrieval
(operators/retrieval.py): a pure-Python Okapi replay (the third
engine the DuckDB-parity blindness can't fool — same discipline as
test_incremental_dedup), plus the monotonicity properties the formula
must satisfy. The DuckDB value twin runs in test_oracle_parity."""

import math

import pytest
from pyspark.sql import Row

from pdftotext_spark.operators import retrieval

pytestmark = pytest.mark.spark


def _frame(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _py_bm25(texts):
    """Independent replay of the shared score expression: identical
    literals, identical operation order, half-up integer micro-round
    (SQL round(); Python's round() is banker's)."""
    terms = retrieval.BM25_QUERY_TERMS
    toks = [[w for w in t.lower().split(" ") if w] for t in texts]
    n_docs = len(toks)
    sum_dl = sum(len(a) for a in toks)
    df = {t: sum(1 for a in toks if t in a) for t in terms}
    out = []
    for i, a in enumerate(toks):
        dl = len(a)
        score = 0
        for t in terms:
            tf = a.count(t)
            if tf > 0:
                idf = math.log(
                    1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)
                )
                norm = tf + 1.2 * (0.25 + 0.75 * (dl * 1.0 * n_docs) / sum_dl)
                score += int(math.floor(idf * (tf * 2.2) / norm * 1e6 + 0.5))
        out.append((i, dl, score))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[: retrieval.BM25_TOPK]


def test_bm25_pure_python_replay(spark):
    texts = [
        "spark window join spark",
        "the quick brown fox jumps over the window",
        "join join join and nothing else in here",
        "no query terms at all",
        "spark " + "filler " * 40 + "join",
        "window",
        "spark window join",  # identical tf vector, shorter than 0
    ]
    got = [
        (r.doc_id, r.dl, r.bm25_micro)
        for r in retrieval.bm25_topk_for(_frame(spark, texts)).collect()
    ]
    assert got == _py_bm25(texts)


def test_bm25_semantics(spark):
    texts = [
        "spark alpha beta gamma",            # tf(spark)=1
        "spark spark alpha beta",            # tf(spark)=2, same dl
        "spark alpha beta gamma delta eps",  # tf=1, longer doc
        "alpha beta gamma delta",            # no terms -> 0
    ]
    rows = {
        r.doc_id: r
        for r in retrieval.bm25_topk_for(_frame(spark, texts)).collect()
    }
    assert rows[3].bm25_micro == 0  # term-free doc scores exactly 0
    assert rows[1].bm25_micro > rows[0].bm25_micro  # tf monotone
    assert rows[0].bm25_micro > rows[2].bm25_micro  # dl-normalized
    assert rows[0].tf_spark == 1 and rows[1].tf_spark == 2
    # all-zero tf columns for terms absent from the corpus
    assert rows[0].tf_window == 0 and rows[0].tf_join == 0


def test_bm25_tiebreak_and_limit(spark):
    # 15 identical docs: identical scores, top-10 by doc_id ascending
    texts = ["spark common words here"] * 15
    got = [
        r.doc_id
        for r in retrieval.bm25_topk_for(_frame(spark, texts)).collect()
    ]
    assert got == list(range(retrieval.BM25_TOPK))


def test_bm25_rarer_term_outscores_common(spark):
    # 'join' in 1 of 6 docs, 'window' in 5 of 6: at equal tf and dl
    # the rare term must contribute more (the IDF core of BM25)
    texts = (
        ["join alpha beta gamma"]
        + ["window alpha beta gamma"] * 5
    )
    rows = {
        r.doc_id: r.bm25_micro
        for r in retrieval.bm25_topk_for(_frame(spark, texts)).collect()
    }
    assert rows[0] > rows[1]


def _indexed(spark, texts, k=retrieval.BM25_TOPK):
    postings, stats = retrieval.bm25_index_for(_frame(spark, texts))
    return retrieval.bm25_topk_indexed_for(postings, stats, k=k).collect()


def test_bm25_indexed_equals_bruteforce(spark):
    """The inverted-index path must produce the SAME ranked list with
    the SAME integer micro scores as the brute-force scan whenever >= k
    documents contain a query term (identical per-(doc, term) rounded
    contributions, different grouping order only)."""
    texts = [
        f"spark {'filler ' * (i % 7)}join window doc{i}" for i in range(12)
    ] + ["join only here", "window window twice"]
    brute = [
        (r.doc_id, r.bm25_micro)
        for r in retrieval.bm25_topk_for(_frame(spark, texts)).collect()
    ]
    ix = [(r.doc_id, r.bm25_micro) for r in _indexed(spark, texts)]
    assert ix == brute


def test_bm25_indexed_candidates_only(spark):
    """Documented semantic difference: the index ranks only documents
    containing >= 1 query term — no zero-score padding rows."""
    texts = ["spark alpha", "no terms at all", "also none", "join beta"]
    rows = _indexed(spark, texts)
    assert sorted(r.doc_id for r in rows) == [0, 3]
    assert all(r.bm25_micro > 0 for r in rows)
    assert all(r.n_terms == 1 for r in rows)


def test_bm25_indexed_n_terms_counts_distinct_matches(spark):
    texts = ["spark join window", "spark spark spark", "join window"]
    rows = {r.doc_id: r.n_terms for r in _indexed(spark, texts)}
    assert rows == {0: 3, 1: 1, 2: 2}


def test_bm25_index_shape(spark):
    """Posting-list layout: one row per (term, doc_id), tf counted,
    dl denormalized; the stats row counts ALL docs including
    zero-token ones (must match the brute-force corpus stats)."""
    postings, stats = retrieval.bm25_index_for(
        _frame(spark, ["spark spark join", "  ", "alpha spark"])
    )
    p = {(r.term, r.doc_id): (r.tf, r.dl) for r in postings.collect()}
    assert p[("spark", 0)] == (2, 3) and p[("join", 0)] == (1, 3)
    assert p[("spark", 2)] == (1, 2) and p[("alpha", 2)] == (1, 2)
    assert all(r.doc_id != 1 for r in postings.collect())
    s = stats.collect()[0]
    assert (s.n_docs, s.sum_dl) == (3, 5)


def test_bm25_corpus_fixture_nondegenerate(spark, sf_dir):
    """Registration invariant: the fixed benchmark query must produce
    a full, non-constant top-k on the synthetic corpus."""
    rows = retrieval.bm25_topk(spark, sf_dir).collect()
    assert len(rows) == retrieval.BM25_TOPK
    assert rows[0].bm25_micro > 0
    assert len({r.bm25_micro for r in rows}) > 1
