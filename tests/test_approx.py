"""Sketch accuracy bounds: estimates must sit within standard error of
exact values, and merged daily sketches must match a global sketch."""

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries.approx import (
    q_approx_distinct_users,
    q_approx_quantiles,
    q_hll_mergeable_distinct,
)

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_error(spark):
    for r in q_approx_distinct_users(spark, SF).collect():
        assert r.approx_users == pytest.approx(r.exact_users, rel=0.05)


def test_merged_sketch_close_to_true_distinct(spark):
    from big_data_crypto_sentiment_spark.queries._util import table
    row = q_hll_mergeable_distinct(spark, SF).first()
    truth = (table(spark, SF, "events")
             .agg(F.countDistinct("user_id")).first()[0])
    assert row.merged_estimate == pytest.approx(truth, rel=0.05)
    # merging deduplicates across days; naive summing does not
    assert row.sum_daily_exact >= truth


def test_approx_median_close_to_exact(spark):
    for r in q_approx_quantiles(spark, SF).collect():
        assert r.approx_median == pytest.approx(r.exact_median, rel=0.01)
