"""Behavioral-analytics semantics pins: the funnel's STRICT ordering
(purchase before the first click never counts), retention offsets, and
transition sequencing — cases fixture statistics might not exercise."""

from datetime import datetime

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(rows, schema)
    sf_dir = str(tmp_path / "ev")
    df.write.parquet(f"{sf_dir}/events.parquet")
    return sf_dir


def _t(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_funnel_requires_purchase_after_first_click(spark, tmp_path):
    rows = [
        # user 1: purchase BEFORE first click -> not converted
        (1, _t(9), 1, "purchase", 1.0, None),
        (2, _t(10), 1, "click", None, None),
        # user 2: click then purchase -> converted, latency 1h
        (3, _t(10), 2, "click", None, None),
        (4, _t(11), 2, "purchase", 2.0, None),
        # user 3: no click -> absent from output
        (5, _t(10), 3, "view", None, None),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    from big_data_crypto_sentiment_spark.queries.behavior import (
        q_funnel_conversion,
    )
    got = {r.user_id: r for r in q_funnel_conversion(spark, sf_dir).collect()}
    assert set(got) == {1, 2}
    assert got[1].converted == 0 and got[1].first_purchase_ts is None
    assert got[2].converted == 1
    assert got[2].latency_us == 3600.0 * 1e6


def test_transitions_ordered_by_ts_then_event_id(spark, tmp_path):
    rows = [
        (1, _t(10), 1, "click", None, None),
        (2, _t(10), 1, "view", None, None),   # same ts: event_id breaks tie
        (3, _t(11), 1, "purchase", None, None),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    from big_data_crypto_sentiment_spark.queries.behavior import (
        q_event_transitions,
    )
    got = {(r.prev_type, r.cur_type): r.n
           for r in q_event_transitions(spark, sf_dir).collect()}
    assert got == {("click", "view"): 1, ("view", "purchase"): 1}


def test_cohort_offsets_are_exact_days(spark, tmp_path):
    rows = [
        (1, datetime(2024, 1, 1, 23), 1, "view", None, None),
        (2, datetime(2024, 1, 2, 1), 1, "view", None, None),  # offset 1
        (3, datetime(2024, 1, 1, 5), 2, "view", None, None),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    from big_data_crypto_sentiment_spark.queries.behavior import (
        q_cohort_retention,
    )
    got = {(r.cohort_day, r.day_offset): r.n_users
           for r in q_cohort_retention(spark, sf_dir).collect()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1}
