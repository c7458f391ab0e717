"""Constructed-input semantics for temperature mixture rebalancing
(operators/mixing.py): a pure-Python replay of the sqrt-smoothed
weights and the md5-Bernoulli copy rule (the third engine the
DuckDB-parity blindness can't fool), plus the monotonicity the
temperature must produce. The DuckDB value twin runs in
test_oracle_parity."""

import hashlib
import math

import pytest
from pyspark.sql import Row

from pdftotext_spark.operators import mixing

pytestmark = pytest.mark.spark


def _frame(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t) for i, (s, t) in enumerate(rows)]
    )


def _rh(x: float) -> int:
    """SQL round(x, 0) half-up on the double's EXACT binary value
    (floor(x + 0.5) differs on the 0.49999999999999994 class;
    Decimal matches Spark HALF_UP and DuckDB)."""
    import decimal

    return int(
        decimal.Decimal(x).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )


def _py_weights(rows):
    per: dict[str, list[int]] = {}
    for s, t in rows:
        n = len([w for w in t.lower().split(" ") if w])
        d = per.setdefault(s, [0, 0])
        d[0] += 1
        d[1] += n
    pw = {s: _rh(math.sqrt(v[1] * 1.0) * 1e6) for s, v in per.items()}
    tot_pw = sum(pw.values())
    tot_toks = sum(v[1] for v in per.values())
    out = {}
    for s, (nd, tk) in per.items():
        share = _rh(pw[s] * 1e6 / tot_pw)
        rate = (
            0
            if tk == 0
            else _rh((pw[s] * 1.0 / tot_pw) * (tot_toks * 1.0 / tk) * 1e6)
        )
        out[s] = (nd, tk, pw[s], share, rate)
    return out


def _py_copies(doc_id: int, rate: int) -> tuple[int, int]:
    base = int(math.floor(rate * 1.0 / 1e6))
    frac = rate - base * 1_000_000
    u24 = int(hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:6], 16)
    return u24, base + (1 if u24 * 1_000_000 < frac * 16_777_216 else 0)


ROWS = (
    # big source: lots of tokens -> downsampled under tau=0.5
    [("big", "alpha beta gamma delta " * 12)] * 8
    # small source: few tokens -> upsampled (rate > 1, base epoch + frac)
    + [("small", "omega psi")] * 3
    # mid source with an empty doc mixed in
    + [("mid", "one two three four five six seven")] * 4
    + [("mid", "")]
    # a source with ZERO tokens in total: rate must be exactly 0
    + [("void", ""), ("void", " ")]
)


def test_mixture_pure_python_replay(spark):
    df = _frame(spark, ROWS)
    exp_w = _py_weights(ROWS)
    got_w = {
        r.source: (r.n_docs, r.toks, r.pw_micro, r.share_micro, r.rate_micro)
        for r in mixing.mixture_weights_for(df).collect()
    }
    assert got_w == exp_w
    got_c = {
        r.doc_id: (r.source, r.rate_micro, r.u24, r.n_copies)
        for r in mixing.mixture_rebalance_for(df).collect()
    }
    assert len(got_c) == len(ROWS)  # EVERY doc emits a row
    for i, (s, _) in enumerate(ROWS):
        rate = exp_w[s][4]
        u24, n = _py_copies(i, rate)
        assert got_c[i] == (s, rate, u24, n)


def test_temperature_upsamples_small_sources(spark):
    w = {
        r.source: r
        for r in mixing.mixture_weights_for(_frame(spark, ROWS)).collect()
    }
    # tau=0.5 moves mass toward small sources: expected copies per doc
    # strictly higher for the token-poorer source
    assert w["small"].rate_micro > w["mid"].rate_micro > w["big"].rate_micro
    assert w["big"].rate_micro < 1_000_000 < w["small"].rate_micro
    # shares still follow mass order (smoothed, not inverted)
    assert w["big"].share_micro > w["mid"].share_micro > w["small"].share_micro
    assert w["void"].pw_micro == 0 and w["void"].rate_micro == 0


def test_zero_token_source_drops_entirely(spark):
    rows = {
        r.doc_id: r
        for r in mixing.mixture_rebalance_for(_frame(spark, ROWS)).collect()
    }
    for i, (s, _) in enumerate(ROWS):
        if s == "void":
            assert rows[i].n_copies == 0
        if s == "small":
            assert rows[i].n_copies >= 1  # rate > 1: at least one epoch


def test_uniform_masses_give_uniform_rates(spark):
    # equal token mass per source -> shares 1/S and rate exactly 1e6
    rows = [("s1", "a b c d"), ("s2", "e f g h"), ("s3", "i j k l")]
    w = mixing.mixture_weights_for(_frame(spark, rows)).collect()
    assert {r.rate_micro for r in w} == {1_000_000}
    assert all(abs(r.share_micro - 333_333) <= 1 for r in w)


def test_mixture_pack_replay_and_conservation(spark):
    """mixture_pack == replaying rebalance then offset-packing the
    expanded (doc_id, copy_idx) stream per source; row count equals
    Σ n_copies and every copy index 1..n_copies appears exactly
    once."""
    df = _frame(spark, ROWS)
    exp_w = _py_weights(ROWS)
    # expected expanded stream per source, in (doc_id, copy_idx) order
    expected = {}
    per_src_rows: dict[str, list[tuple[int, int, int]]] = {}
    for i, (s, t) in enumerate(ROWS):
        ntok = len([w for w in t.lower().split(" ") if w])
        _, n = _py_copies(i, exp_w[s][4])
        for c in range(1, n + 1):
            per_src_rows.setdefault(s, []).append((i, c, ntok))
    for s, rows in per_src_rows.items():
        off = 0
        for i, c, ntok in sorted(rows):
            expected[(i, c)] = (s, ntok, off, off // 256)
            off += ntok
    got = {
        (r.doc_id, r.copy_idx): (r.source, r.n_tokens, r.start_offset, r.pack_id)
        for r in mixing.mixture_pack_for(df).collect()
    }
    assert got == expected
    total_copies = sum(
        r.n_copies for r in mixing.mixture_rebalance_for(df).collect()
    )
    assert len(got) == total_copies


def test_mixture_pack_upsampled_copies_are_adjacent(spark):
    """An upsampled doc's copies pack consecutively: copy k+1 starts
    where copy k ended (the (doc_id, copy_idx) order contract)."""
    rows = [("tiny", "x y z")] * 2 + [("huge", "a b c d e f g h " * 40)] * 4
    packed = mixing.mixture_pack_for(_frame(spark, rows)).collect()
    by_doc = {}
    for r in packed:
        by_doc.setdefault(r.doc_id, []).append(r)
    multi = [v for v in by_doc.values() if len(v) > 1]
    assert multi  # the tiny source must actually upsample here
    for copies in multi:
        copies.sort(key=lambda r: r.copy_idx)
        for a, b in zip(copies, copies[1:]):
            assert b.start_offset == a.start_offset + a.n_tokens


def test_streaming_mixture_gate_replays_batch_rule(spark, tmp_path):
    """Coherence pin for the streaming gate: it applies EXACTLY the
    batch _NCOPIES_SQL rule with the batch-materialized rates — the
    pure-Python replay (rates from _py_weights, draw from the
    conv:turn did string) predicts the survivor set and copy counts;
    a replayed micro-batch overwrites (never double-appends); an
    unknown source rates 0 and is dropped."""
    from pdftotext_spark.streaming.mixing import (
        mixture_filter_batch,
        write_mixture_rates,
    )

    corpus = _frame(spark, ROWS)
    rates_dir = str(tmp_path / "rates")
    out = str(tmp_path / "out")
    write_mixture_rates(corpus, rates_dir)

    stream_rows = [
        ("c1", 1, "big", "some incoming turn text"),
        ("c1", 2, "small", "tiny source turn"),
        ("c2", 1, "small", "another tiny source turn"),
        ("c2", 2, "mid", "mid source turn"),
        ("c9", 9, "neverseen", "unknown source must drop"),
    ] * 4  # enough rows that both outcomes of the Bernoulli appear
    stream_rows = [
        (f"{c}{i}", t, s, x)
        for i, (c, t, s, x) in enumerate(stream_rows)
    ]
    batch = spark.createDataFrame(
        stream_rows, "conv_id string, turn_idx int, role string, text string"
    )
    fn = mixture_filter_batch(out, rates_dir)
    fn(batch, 0)
    got = {
        (r.conv_id, r.turn_idx): r.n_copies
        for r in spark.read.parquet(f"{out}/batch_id=0").collect()
    }

    exp_w = _py_weights(ROWS)
    expected = {}
    for c, t, s, _ in stream_rows:
        if s not in exp_w:
            continue
        did = f"{c}:{t:012d}"
        rate = exp_w[s][4]
        base = int(math.floor(rate * 1.0 / 1e6))
        frac = rate - base * 1_000_000
        u24 = int(hashlib.md5(f"mix:{did}".encode()).hexdigest()[:6], 16)
        n = base + (1 if u24 * 1_000_000 < frac * 16_777_216 else 0)
        if n >= 1:
            expected[(c, t)] = n
    assert got == expected
    assert expected  # survivors exist
    assert len(expected) < sum(1 for r in stream_rows if r[2] in exp_w)
    # replay idempotence: same batch_id overwrites
    fn(batch, 0)
    again = {
        (r.conv_id, r.turn_idx): r.n_copies
        for r in spark.read.parquet(f"{out}/batch_id=0").collect()
    }
    assert again == got


def test_all_empty_corpus_no_nan_divergence(spark):
    """tot_pw = 0 (every doc tokenizes empty) must yield all-zero
    shares/rates identically in all three engines — Spark evaluates
    the unguarded double 0/0 to NaN→0 where DuckDB returns NULL, so
    the guard in _SHARE_SQL is what keeps the expression shared."""
    import duckdb

    rows = [("a", ""), ("a", " "), ("b", "")]
    w = mixing.mixture_weights_for(_frame(spark, rows)).collect()
    assert [(r.source, r.pw_micro, r.share_micro, r.rate_micro) for r in w] == [
        ("a", 0, 0, 0),
        ("b", 0, 0, 0),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(0, 'a', ''), (1, 'a', ' '), (2, 'b', '')) t(doc_id, source, text)"
    )
    got = con.execute(mixing.MIXTURE_WEIGHTS_SQL).fetchall()
    assert [(r[0], r[3], r[4], r[5]) for r in got] == [
        ("a", 0, 0, 0),
        ("b", 0, 0, 0),
    ]

def test_pack_manifest_consistent_with_mixture_pack(spark):
    """pack_manifest rows re-derive exactly from mixture_pack: entry
    count and token sums per pack match, entries are ordered by
    (doc_id, copy_idx), and within-pack offsets rebase the global
    start offsets by pack_id * budget."""
    from pdftotext_spark.operators.mixing import _PACK_BUDGET

    df = _frame(spark, ROWS)
    packed = {}
    zero_rows = 0
    for r in mixing.mixture_pack_for(df).collect():
        if r.n_tokens == 0:
            zero_rows += 1  # excluded from the manifest (unbounded-
            continue        # pack hazard; nothing for a loader to read)
        packed.setdefault((r.source, r.pack_id), []).append(r)
    assert zero_rows > 0  # the fixture must exercise the exclusion
    got = {
        (r.source, r.pack_id): r
        for r in mixing.pack_manifest_for(df).collect()
    }
    assert set(got) == set(packed)
    for key, rows in packed.items():
        rows.sort(key=lambda r: (r.doc_id, r.copy_idx))
        m = got[key]
        assert m.n_entries == len(rows)
        assert m.pack_tokens == sum(r.n_tokens for r in rows)
        assert m.entries == ",".join(
            f"{r.doc_id}:{r.copy_idx}" for r in rows
        )
        assert m.offsets == ",".join(
            str(r.start_offset - key[1] * _PACK_BUDGET) for r in rows
        )

def test_mixture_incremental_merge_and_admission(spark):
    """mixture_incremental: rate_after equals the full-plan
    mixture_weights rates exactly (the additive count merge is
    lossless); rate_before equals mixture_weights computed over the
    corpus split alone for corpus sources and 0 for plan-absent
    incoming sources (the admission-list policy); deltas reconcile."""
    rows = (
        [("alpha", "one two three four " * 5)] * 4
        + [("beta", "five six " * 3)] * 3
        + [("srcnew", "seven eight nine ten eleven")] * 2
        + [("srznew", "twelve")] * 1
    )
    # split is lexicographic vs MIX_INCREMENTAL_SPLIT: alpha/beta are
    # corpus, srcnew/srznew are incoming
    from pdftotext_spark.operators.mixing import MIX_INCREMENTAL_SPLIT

    assert all(
        (s < MIX_INCREMENTAL_SPLIT) == (s in ("alpha", "beta"))
        for s, _ in rows
    )
    df = _frame(spark, rows)
    inc = {
        r.source: r for r in mixing.mixture_incremental_for(df).collect()
    }
    full = {
        r.source: r.rate_micro
        for r in mixing.mixture_weights_for(df).collect()
    }
    corpus_only = {
        r.source: r.rate_micro
        for r in mixing.mixture_weights_for(
            _frame(spark, [x for x in rows if x[0] < MIX_INCREMENTAL_SPLIT])
        ).collect()
    }
    for s, r in inc.items():
        assert r.rate_after_micro == full[s]
        expect_before = 0 if r.is_incoming else corpus_only[s]
        assert r.rate_before_micro == expect_before
        assert r.rate_delta_micro == r.rate_after_micro - r.rate_before_micro
    assert {s for s, r in inc.items() if r.is_incoming} == {
        "srcnew", "srznew"
    }
