"""Behavioral pins for the late-r6 warehouse/profiling additions:
SCD2 interval build, equi-width histogram, linear gap interpolation,
and the deterministic training-shard shuffle. (Oracle parity for the
registered queries is covered by tests/test_deferred_parity.py; these
pin the operator semantics on adversarial shapes the fixtures lack.)"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries.relational import HIST_BINS
from big_data_crypto_sentiment_spark.queries.sampling import shuffle_shards
from big_data_crypto_sentiment_spark.queries.scd import scd2_intervals

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_scd2_compresses_noop_updates_and_versions(spark):
    rows = [
        # user 1: a -> a -> b -> b -> a  => intervals a, b, a
        (1, _ts(0), 10, "a"), (1, _ts(1), 11, "a"),
        (1, _ts(2), 12, "b"), (1, _ts(3), 13, "b"),
        (1, _ts(4), 14, "a"),
        # user 2: single event => one open interval
        (2, _ts(0), 20, "x"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = scd2_intervals(df, "user_id", "event_type", "ts", "event_id")
    got = {(r.user_id, r.version): (r.state, r.valid_from, r.valid_to,
                                    r.is_current)
           for r in out.collect()}
    assert got == {
        (1, 1): ("a", _ts(0), _ts(2), 0),
        (1, 2): ("b", _ts(2), _ts(4), 0),
        (1, 3): ("a", _ts(4), None, 1),
        (2, 1): ("x", _ts(0), None, 1),
    }


def test_scd2_same_ts_ties_break_on_event_id(spark):
    # two state changes at the SAME timestamp: event_id orders them, the
    # first gets a zero-length interval — deterministic, never dropped
    rows = [(1, _ts(0), 5, "a"), (1, _ts(0), 6, "b")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = scd2_intervals(df, "user_id", "event_type", "ts", "event_id")
    got = sorted((r.version, r.state, r.valid_from == r.valid_to)
                 for r in out.collect())
    assert got == [(1, "a", True), (2, "b", False)]


def test_scd2_merge_equals_full_rebuild(spark):
    from big_data_crypto_sentiment_spark.queries.scd import scd2_merge
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    old = [
        (1, _ts(0), 1, "a"), (1, _ts(10), 2, "b"),  # u1 history a->b
        (2, _ts(5), 3, "x"),                        # u2 untouched later
    ]
    new = [
        (1, _ts(20), 10, "b"),  # same state across the boundary: no-op
        (1, _ts(30), 11, "c"),  # real change -> closes b, opens c
        (3, _ts(25), 12, "z"),  # user born in the new batch
    ]
    base = scd2_intervals(spark.createDataFrame(old, schema),
                          "user_id", "event_type", "ts", "event_id")
    merged = scd2_merge(base, spark.createDataFrame(new, schema),
                        "user_id", "event_type", "ts", "event_id")
    full = scd2_intervals(
        spark.createDataFrame(old + new, schema),
        "user_id", "event_type", "ts", "event_id")
    key = lambda r: (r.user_id, r.version)  # noqa: E731
    as_map = lambda df: {key(r): (r.state, r.valid_from, r.valid_to,  # noqa: E731
                                  r.is_current) for r in df.collect()}
    assert as_map(merged) == as_map(full)
    # and the merge really extended/created what it should
    m = as_map(merged)
    assert m[(1, 2)] == ("b", _ts(10), _ts(30), 0)  # no-op event absorbed
    assert m[(1, 3)] == ("c", _ts(30), None, 1)
    assert m[(2, 1)] == ("x", _ts(5), None, 1)      # untouched passthrough
    assert m[(3, 1)] == ("z", _ts(25), None, 1)     # new user


def test_scd2_lookup_point_in_time_semantics(spark):
    from big_data_crypto_sentiment_spark.queries.scd import scd2_lookup
    dim_events = spark.createDataFrame(
        [(1, _ts(10), 1, "a"),
         # two changes at the SAME instant: b is superseded by c at t20,
         # so a lookup at t20+ must see c (zero-length interval dropped)
         (1, _ts(20), 2, "b"), (1, _ts(20), 3, "c")],
        "user_id long, ts timestamp, event_id long, event_type string")
    dim = scd2_intervals(dim_events, "user_id", "event_type",
                         "ts", "event_id")
    facts = spark.createDataFrame(
        [(100, 1, _ts(5)),    # before any state -> NULL
         (101, 1, _ts(10)),   # tie with valid_from -> inclusive
         (102, 1, _ts(15)),
         (103, 1, _ts(20)),   # same-ts run -> the LAST version wins
         (104, 2, _ts(50))],  # unknown user -> NULL
        "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.state
           for r in scd2_lookup(facts, dim).collect()}
    assert got == {100: None, 101: "a", 102: "a", 103: "c", 104: None}


def test_value_histogram_bins_cover_and_clamp(spark, tmp_path):
    # plant a tiny events table: type "u" uniform 0..100 (max lands IN
    # bin 19, not a phantom bin 20), type "c" constant (degenerate span)
    rows = ([(i, "u", float(i)) for i in range(101)]
            + [(200 + i, "c", 7.5) for i in range(3)])
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    import big_data_crypto_sentiment_spark.queries.relational as R
    orig = R.table
    R.table = lambda s, d, n: spark.read.parquet(p)
    try:
        out = R.q_value_histogram(spark, "ignored").collect()
    finally:
        R.table = orig
    u = [r for r in out if r.event_type == "u"]
    c = [r for r in out if r.event_type == "c"]
    assert sum(r.n for r in u) == 101
    assert {r.bin for r in u} == set(range(HIST_BINS))
    assert u[-1].bin == HIST_BINS - 1 and u[-1].n == 6  # 95..100 incl. max
    assert u[0].bin_lo == 0.0 and u[-1].bin_hi == 100.0
    assert len(c) == 1 and c[0].bin == 0 and c[0].n == 3


def test_shuffle_shards_is_a_permutation_and_partition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = shuffle_shards(df, "doc_id", n_shards=8).collect()
    assert len(out) == 500 and len({r.doc_id for r in out}) == 500
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.position)
    for shard, pos in by_shard.items():
        assert sorted(pos) == list(range(1, len(pos) + 1)), shard
    # deterministic under different input partitioning
    out2 = shuffle_shards(df.repartition(13), "doc_id", n_shards=8).collect()
    assert {(r.doc_id, r.shard, r.position) for r in out} == \
           {(r.doc_id, r.shard, r.position) for r in out2}
    # hashes spread docs across shards rather than clumping
    assert len(by_shard) == 8


def test_interpolate_fills_interior_gap_linearly(spark, tmp_path):
    # hourly observations at t=0h (v=10) and t=4h (v=20); buckets 1..3
    # must be 12.5 / 15 / 17.5, flagged interpolated
    rows = [(1, T0, "p", 10.0), (2, T0 + dt.timedelta(hours=4), "p", 20.0)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    import big_data_crypto_sentiment_spark.queries.timeseries as TS
    orig = TS.table
    TS.table = lambda s, d, n: spark.read.parquet(p)
    try:
        out = sorted(TS.q_ts_interpolate(spark, "ignored").collect(),
                     key=lambda r: r.bucket)
    finally:
        TS.table = orig
    assert [r.value_interp for r in out] == [10.0, 12.5, 15.0, 17.5, 20.0]
    assert [r.is_interpolated for r in out] == [0, 1, 1, 1, 0]
