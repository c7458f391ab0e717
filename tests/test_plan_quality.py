"""Physical-plan assertions: the plans we ship are the plans we want
(broadcasts broadcast, filters push down, top-k avoids global sort).
These guard against regressions that stay correct but stop scaling."""

import pytest

from pdftotext_spark.operators import dedup, relational, similarity

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_segment_revenue_broadcasts_dimension(spark):
    plan = _plan(relational.segment_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    # the big (orders) side must NOT go through a shuffle exchange for
    # the join itself
    assert "SortMergeJoin" not in plan


def test_containment_filter_pushed_to_scan(spark):
    plan = _plan(relational.containment_capture(spark, SF))
    assert "PushedFilters:" in plan
    # quantity bounds reach the parquet reader
    assert "GreaterThanOrEqual(l_quantity,10.0" in plan.replace(" ", "")


def test_containment_scan_prunes_columns(spark):
    plan = _plan(relational.containment_capture(spark, SF))
    read_schema = plan.split("ReadSchema:")[-1].splitlines()[0]
    assert "l_quantity" in read_schema and "l_extendedprice" in read_schema
    # untouched wide columns must not be read
    assert "l_shipdate" not in read_schema and "l_partkey" not in read_schema


def test_topk_uses_take_ordered(spark):
    plan = _plan(relational.fragment_sort_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan  # no global sort materialized


def test_cosine_topk_broadcasts_query_vector(spark):
    plan = _plan(similarity.cosine_topk(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_jaccard_broadcasts_candidates(spark):
    plan = _plan(dedup.ngram_jaccard_pairs(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_aggregations_are_partial(spark):
    # map-side combine: two HashAggregate levels around the exchange
    plan = _plan(relational.pricing_summary(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan.lower() or "partial" in plan
