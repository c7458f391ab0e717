"""Semantic tests for training_order: the two-phase distributed
ordinal (bucket window + prefix-sum offsets) must equal the flat
global sort computed by an independent pure-Python replay, pos must be
a permutation, and shards must balance."""

import hashlib
from collections import Counter

import pytest

from pdftotext_spark.operators import textstats

pytestmark = pytest.mark.spark


def _expected_order(doc_ids):
    key = lambda d: (hashlib.md5(f"o:{d}".encode()).hexdigest(), d)
    return {d: i + 1 for i, d in enumerate(sorted(doc_ids, key=key))}


def test_two_phase_ordinal_equals_flat_global_sort(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(1, 501)],
        "doc_id long, source string",
    )
    got = {
        r.doc_id: (r.pos, r.shard)
        for r in textstats.training_order_for(docs).collect()
    }
    exp = _expected_order(range(1, 501))
    assert {d: p for d, (p, _) in got.items()} == exp
    for d, (p, s) in got.items():
        assert s == (p - 1) % textstats.N_ORDER_SHARDS


def test_pos_is_a_permutation_and_shards_balance(spark):
    df = textstats.training_order(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    poss = sorted(r.pos for r in rows)
    assert poss == list(range(1, len(rows) + 1))
    shard_counts = Counter(r.shard for r in rows)
    assert set(shard_counts) == set(range(textstats.N_ORDER_SHARDS))
    assert max(shard_counts.values()) - min(shard_counts.values()) <= 1
    # the hash order decorrelates sources from doc_id order: the first
    # shard must not be a single source (an ingestion-ordered corpus
    # sliced without shuffling would be)
    first_shard_sources = {r.source for r in rows if r.shard == 0}
    assert len(first_shard_sources) > 1
