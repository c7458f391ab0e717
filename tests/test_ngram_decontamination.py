"""Constructed-input semantics for ngram_decontamination (the GPT-3
token-13-gram benchmark-collision rule): exact window boundary, the
distinct-collision count, zero-window docs, and the benchmark-source
exclusion. The DuckDB value twin runs in test_oracle_parity."""

import pytest

from pdftotext_spark.operators import dedup

pytestmark = pytest.mark.spark


def _run(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return {
        r.doc_id: r
        for r in dedup.ngram_decontamination(spark, str(tmp_path)).collect()
    }


def test_ngram_decon_window_boundary(spark, tmp_path):
    toks = [f"t{i:02d}" for i in range(30)]
    bench = " ".join(toks)
    # shares EXACTLY the 13-token run t05..t17 -> one colliding window
    dirty = "x1 x2 " + " ".join(toks[5:18]) + " y1"
    # shares only a 12-token run t05..t16 -> no 13-gram collision
    boundary = "x1 x2 " + " ".join(toks[5:17]) + " y1"
    clean = " ".join(f"u{i}" for i in range(20))
    short = "only four tokens here"
    got = _run(
        spark,
        tmp_path,
        [
            (0, bench, "en", "src0", len(bench)),
            (1, dirty, "en", "src1", len(dirty)),
            (2, boundary, "en", "src1", len(boundary)),
            (3, clean, "en", "src1", len(clean)),
            (4, short, "en", "src2", len(short)),
        ],
    )
    # benchmark docs are scored targets nowhere — not in the report
    assert set(got) == {1, 2, 3, 4}
    assert got[1].dirty and got[1].n_dirty_grams == 1
    assert got[1].n_grams == 16 - 13 + 1  # 16 tokens -> 4 windows
    assert not got[2].dirty and got[2].n_dirty_grams == 0
    assert not got[3].dirty
    # < 13 tokens: zero windows, clean, but the row still exists
    assert got[4].n_grams == 0 and not got[4].dirty


def test_ngram_decon_distinct_collisions_counted_once(spark, tmp_path):
    toks = [f"t{i:02d}" for i in range(40)]
    bench = " ".join(toks)
    # a doc that repeats the same 13-token benchmark run twice counts
    # it ONCE (distinct grams), while a 20-token shared run yields 8
    # distinct colliding windows
    rep = " ".join(toks[0:13]) + " z1 z2 " + " ".join(toks[0:13])
    long_run = "p1 " + " ".join(toks[10:30]) + " q1"
    got = _run(
        spark,
        tmp_path,
        [
            (0, bench, "en", "src0", len(bench)),
            (1, rep, "en", "src1", len(rep)),
            (2, long_run, "en", "src1", len(long_run)),
        ],
    )
    assert got[1].n_dirty_grams == 1 and got[1].dirty
    assert got[2].n_dirty_grams == 20 - 13 + 1 and got[2].dirty
