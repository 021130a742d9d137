"""Catalog schema-drift absorption (catalog.py). The driver regenerated
the testdata between rounds, switching events.ts from parquet
TIMESTAMP(NANOS) (Spark reads it as long under nanosAsLong) to
TIMESTAMP(MICROS) (read natively); `load`/`load_events_range` branch on
the scanned dtype so BOTH generations work. The live micros path is
exercised by every events query; these tests keep the legacy nanos
branch honest with a synthetic nanos file, including the row-group
pushdown contract."""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_crypto_sentiment_spark import catalog


@pytest.fixture(scope="module")
def nanos_sf_dir(tmp_path_factory):
    """A fake sf dir whose events.parquet stores TIMESTAMP(NANOS)."""
    d = tmp_path_factory.mktemp("nanos_sf")
    base = datetime.datetime(2024, 1, 1)
    ts = [base + datetime.timedelta(minutes=m) for m in range(10)]
    t = pa.table({
        "event_id": pa.array(range(10), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array([i % 3 for i in range(10)], pa.int64()),
        "event_type": pa.array(["a"] * 10),
        "value": pa.array([float(i) for i in range(10)]),
        "props": pa.array(["{}"] * 10),
    })
    pq.write_table(t, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_load_absorbs_nanos_generation(spark, nanos_sf_dir):
    df = catalog.load(spark, "events", nanos_sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got[0] == datetime.datetime(2024, 1, 1, 0, 0)
    assert got[-1] == datetime.datetime(2024, 1, 1, 0, 9)


def test_load_reads_micros_generation_natively(spark):
    df = catalog.load(spark, "events", "/root/testdata/sf0.001")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_events_range_nanos_branch_filters_and_converts(spark, nanos_sf_dir):
    start = datetime.datetime(2024, 1, 1, 0, 5)
    start_ns = int(start.replace(
        tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000_000
    df = catalog.load_events_range(spark, nanos_sf_dir, start_ns)
    rows = df.select("ts").collect()
    assert len(rows) == 5
    assert min(r.ts for r in rows) == start
    # the bound must reach the scan as a raw-long comparison (pushable)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(ts," in plan


def test_events_range_micros_branch_pushes_timestamp_predicate(spark):
    start_ns = 1_704_153_600 * 1_000_000_000  # 2024-01-02 UTC
    df = catalog.load_events_range(spark, "/root/testdata/sf0.001",
                                   start_ns, start_ns + 86_400 * 10 ** 9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(ts," in plan and "LessThan(ts," in plan
    assert df.count() > 0


def test_table_diff_statuses_and_null_handling(spark):
    from big_data_crypto_sentiment_spark.queries.relational import table_diff
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, None, 40)],
        "id long, txt string, v int")
    new = spark.createDataFrame(
        [(1, "a", 10),          # unchanged -> absent from output
         (2, "b", 20),          # NULL -> 20: changed
         (4, None, 40),         # unchanged (NULL fingerprints equal)
         (5, "e", 50)],         # added
        "id long, txt string, v int")
    got = {r.id: r.status
           for r in table_diff(old, new, "id", ["txt", "v"]).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_events_range_micros_branch_unaligned_bounds_exact(spark, tmp_path):
    """Non-microsecond-aligned nanosecond bounds must act exactly like
    the raw-nanos comparisons `ts_ns >= start_ns` / `ts_ns < end_ns` on
    micro-resolution data — ceiling division, not floor (a floored start
    admits rows in [floor(start/1000)µs, start); a floored end wrongly
    drops the row at exactly floor(end/1000)µs)."""
    us = [1_000_000, 1_000_001, 1_000_002, 1_000_003]
    t = pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array(us, pa.timestamp("us")),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))

    def got(start_ns, end_ns):
        df = catalog.load_events_range(spark, str(tmp_path),
                                       start_ns, end_ns)
        return sorted(round(r.ts.timestamp() * 1_000_000)
                      for r in df.select("ts").collect())

    def want(start_ns, end_ns):
        return [u for u in us
                if u * 1000 >= start_ns and u * 1000 < end_ns]

    cases = [
        (1_000_000_500, 1_000_002_500),   # both unaligned, mid-gap
        (1_000_001_000, 1_000_003_000),   # exactly aligned
        (1_000_000_001, 1_000_003_001),   # 1ns past alignment
        (999_999_999, 1_000_002_999),
    ]
    for s, e in cases:
        assert got(s, e) == want(s, e), (s, e)


def test_register_repaired_view_converts_epoch_columns(spark):
    """The Milestone3 type-repair analog: an integer epoch-ms column is
    exposed through a temp view as a proper TIMESTAMP, queryable via
    spark.sql; unknown units raise."""
    import datetime as dt

    import pytest

    from big_data_crypto_sentiment_spark.catalog import (
        register_repaired_view,
    )
    raw = spark.createDataFrame(
        [(1, 1704067200000, "a"), (2, 1704070800000, "b")],
        "id long, timestamp long, v string")
    out = register_repaired_view(spark, raw, "repaired",
                                 {"timestamp": "ms"})
    assert dict(out.dtypes)["timestamp"] == "timestamp"
    got = spark.sql(
        "SELECT id, timestamp, v FROM repaired ORDER BY id").collect()
    assert got[0].timestamp == dt.datetime(2024, 1, 1, 0, 0)
    assert got[1].timestamp == dt.datetime(2024, 1, 1, 1, 0)
    assert [r.v for r in got] == ["a", "b"]  # passthrough intact
    with pytest.raises(ValueError, match="unit"):
        register_repaired_view(spark, raw, "bad", {"timestamp": "ns"})
