"""Property tests for the numeric drift/cleaning operators: invariants
that hold for ANY input (hypothesis-generated), complementing the
oracle hash checks which pin one dataset."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_crypto_sentiment_spark.queries.relational import (
    KS_DRIFT_THRESHOLD,
    q_ks_drift_events,
    q_winsorize_events,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ks_rows(spark):
    return q_ks_drift_events(spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def wz_rows(spark):
    return q_winsorize_events(spark, SF_DIR).collect()


def test_ks_statistic_is_a_probability_distance(ks_rows):
    assert len(ks_rows) > 0
    for r in ks_rows:
        assert 0.0 <= r.ks <= 1.0
        assert r.n_first > 0 and r.n_second > 0
        assert r.drifted == int(r.ks > KS_DRIFT_THRESHOLD)


def test_winsorize_bounds_come_from_data_and_order(spark, wz_rows):
    from pyspark.sql import functions as F

    from big_data_crypto_sentiment_spark.queries._util import table
    ev = (table(spark, SF_DIR, "events")
          .filter(F.col("value").isNotNull())
          .groupBy("event_type")
          .agg(F.collect_list("value").alias("vals")))
    vals = {r.event_type: sorted(r.vals) for r in ev.collect()}
    assert len(wz_rows) > 0
    for r in wz_rows:
        vs = vals[r.event_type]
        assert r.p_lo in vs and r.p_hi in vs   # discrete: real data points
        assert r.p_lo <= r.p_hi
        assert r.n == len(vs)
        assert r.n_clipped_lo == sum(1 for v in vs if v < r.p_lo)
        assert r.n_clipped_hi == sum(1 for v in vs if v > r.p_hi)
        assert r.p_lo <= r.winsorized_mean <= r.p_hi


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=4, max_size=60),
       st.integers(min_value=1, max_value=59))
def test_ks_pure_math_reference(values, split_at):
    """Driver-side reference of the KS definition the SQL implements:
    max over pooled points of |F_a - F_b| with peers included — always
    in [0,1], and 0 when both halves are identical multisets."""
    a = sorted(values[:split_at]) or [0.0]
    b = sorted(values[split_at:]) or [0.0]

    def cdf(xs, v):
        return sum(1 for x in xs if x <= v) / len(xs)

    ks = max(abs(cdf(a, v) - cdf(b, v)) for v in a + b)
    assert 0.0 <= ks <= 1.0
    same = sorted(a)
    ks_same = max(abs(cdf(same, v) - cdf(same, v)) for v in same)
    assert ks_same == 0.0
