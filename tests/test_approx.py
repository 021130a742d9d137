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


def test_cms_never_underestimates_and_respects_eps_bound(spark):
    from big_data_crypto_sentiment_spark.queries.approx import cms_estimates
    # skewed stream: key k appears 100*(k+1) times, k in 0..9 -> N=5500
    rows = [(k,) for k in range(10) for _ in range(100 * (k + 1))]
    df = spark.createDataFrame(rows, "k long")
    exact = {k: 100 * (k + 1) for k in range(10)}
    est = cms_estimates(df, "k", list(range(10)), eps=0.01)
    n = sum(exact.values())
    for k, e in est.items():
        assert e >= exact[k]                 # CMS never underestimates
        assert e <= exact[k] + 0.01 * n + 1  # eps*N overshoot bound


def test_cms_sketch_merges_across_partitions(spark):
    from big_data_crypto_sentiment_spark.queries.approx import cms_estimates
    # same data, 1 vs 8 partitions: the merged estimate must not depend
    # on how partial sketches were combined
    rows = [(k % 5,) for k in range(1000)]
    a = spark.createDataFrame(rows, "k long").coalesce(1)
    b = spark.createDataFrame(rows, "k long").repartition(8)
    assert cms_estimates(a, "k", [0, 1, 2, 3, 4]) == \
        cms_estimates(b, "k", [0, 1, 2, 3, 4])
