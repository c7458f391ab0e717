"""Count-Min Sketch semantics: estimates never undercount, match exact
counts in the low-collision regime, and report absence as zero."""

import pytest

from pdftotext_spark.operators import sketches

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def test_cms_point_estimates_vs_exact(spark):
    cms = sketches.token_cms(spark, SF).cache()
    exact = {
        r.tok: r.cnt for r in sketches.heavy_hitters_exact(spark, SF).collect()
    }
    assert exact, "fixture should have tokens"
    for tok, true_cnt in list(exact.items())[:8]:
        est = sketches.cms_point_estimate(cms, tok)
        assert est >= true_cnt  # CMS never undercounts
        assert est <= true_cnt * 2  # sane collision bound at this width
    assert sketches.cms_point_estimate(cms, "zz-not-a-token-zz") == 0
    cms.unpersist()


def test_cms_counter_mass_equals_token_count(spark):
    from pyspark.sql import functions as F

    cms = sketches.token_cms(spark, SF)
    mass = {
        r.row_idx: r.total
        for r in cms.groupBy("row_idx").agg(F.sum("cnt").alias("total")).collect()
    }
    # every depth row counts every token exactly once
    assert len(set(mass.values())) == 1 and len(mass) == sketches.CMS_DEPTH
