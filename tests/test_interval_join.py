"""Bucketized time-tolerance join (operators/interval_join.py): must be
pair-for-pair identical to the naive inequality join, including
boundary (|dt| == tol) and bucket-edge cases."""

import datetime as dt

from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.operators.interval_join import (
    time_tolerance_join,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def test_matches_naive_inequality_join(spark):
    tol = 10
    # offsets chosen to straddle bucket edges: exactly tol apart,
    # just inside, just outside, and an adjacent-bucket match
    left = spark.createDataFrame(
        [(1, 100, _ts(0.0)), (1, 101, _ts(25.0)), (2, 102, _ts(9.999999)),
         (3, 103, _ts(50.0))],
        "k long, lid long, lts timestamp")
    right = spark.createDataFrame(
        [(1, 200, _ts(10.0)),        # dt == tol exactly: included
         (1, 201, _ts(10.000001)),   # just outside for lid=100
         (1, 202, _ts(19.0)),        # adjacent bucket of lid=101
         (2, 203, _ts(0.0)),         # dt = -9.999999: included
         (9, 204, _ts(50.0))],       # key mismatch: excluded
        "k long, rid long, rts timestamp")
    got = {(r.lid, r.rid, r.dt_us)
           for r in time_tolerance_join(left, right, ["k"], tol,
                                        "lts", "rts").collect()}
    naive = left.join(right, "k").filter(
        F.abs(F.unix_micros("rts") - F.unix_micros("lts"))
        <= tol * 1_000_000)
    want = {(r.lid, r.rid, r.dt_us)
            for r in naive.withColumn(
                "dt_us",
                F.unix_micros("rts") - F.unix_micros("lts")).collect()}
    assert got == want
    assert (100, 200, 10_000_000) in got        # inclusive boundary
    assert (100, 201, 10_000_001) not in got    # one microsecond over
    assert not any(rid == 204 for _, rid, _ in got)


def test_pairs_are_unique_despite_right_triplication(spark):
    left = spark.createDataFrame(
        [(1, i, _ts(i * 3.0)) for i in range(30)],
        "k long, lid long, lts timestamp")
    right = spark.createDataFrame(
        [(1, i, _ts(i * 3.0 + 1.0)) for i in range(30)],
        "k long, rid long, rts timestamp")
    out = time_tolerance_join(left, right, ["k"], 7, "lts", "rts")
    pairs = [(r.lid, r.rid) for r in out.collect()]
    assert len(pairs) == len(set(pairs))  # bucket partitioning: no dups


def test_property_matches_naive_on_random_inputs(spark):
    from hypothesis import given, settings, strategies as st

    ev = st.lists(
        st.tuples(st.integers(0, 2),            # key
                  st.integers(0, 200_000_000)), # offset micros (~200s span)
        min_size=1, max_size=12)

    @settings(max_examples=15, deadline=None)
    @given(left=ev, right=ev, tol=st.integers(1, 60))
    def prop(left, right, tol):
        ldf = spark.createDataFrame(
            [(k, i, _ts(us / 1e6)) for i, (k, us) in enumerate(left)],
            "k long, lid long, lts timestamp")
        rdf = spark.createDataFrame(
            [(k, i, _ts(us / 1e6)) for i, (k, us) in enumerate(right)],
            "k long, rid long, rts timestamp")
        got = {(r.lid, r.rid)
               for r in time_tolerance_join(ldf, rdf, ["k"], tol,
                                            "lts", "rts").collect()}
        want = {(r.lid, r.rid) for r in ldf.join(rdf, "k").filter(
            F.abs(F.unix_micros("rts") - F.unix_micros("lts"))
            <= tol * 1_000_000).collect()}
        assert got == want

    prop()
