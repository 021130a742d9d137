"""hh_mg_vs_exact's graduated per-shard surface pinned on a PLANTED
events table with real heavy hitters: at the driver's sf0.01 (and at
sf0.1) no user exceeds the n/(C+1) presence threshold, so the hashed
n_heavy column is all zeros and the all_heavy_survived flag is
vacuous. This corpus plants two dominant users (one >20% of its
shard, one just past the threshold) among a uniform tail, runs the
real Spark surface and the real ORACLE SQL side by side, and checks
exact agreement plus that the heavy arms fired under live MG
decrements."""

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_crypto_sentiment_spark.queries.approx import (
    ORACLE,
    q_hh_mg_vs_exact,
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted_hh")
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    eid = 0

    def add(user, n):
        nonlocal eid
        for _ in range(n):
            rows.append((eid, t0 + datetime.timedelta(seconds=eid),
                         user, "click", 1.0, "{}"))
            eid += 1

    add(900001, 300)                    # dominant heavy hitter
    add(900002, 90)                     # near-threshold heavy hitter
    for u in range(120):                # uniform tail, ~8 events each
        add(1000 + u, 8)
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": [r[3] for r in rows],
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": [r[5] for r in rows],
    })
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_hh_mg_oracle_agrees_with_planted_heavy_hitters(
        spark, planted_dir):
    got = {r["shard"]: r.asDict()
           for r in q_hh_mg_vs_exact(spark, planted_dir).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{planted_dir}/events.parquet')")
    want = con.sql(ORACLE["hh_mg_vs_exact"]).df()
    assert len(want) == len(got)
    for _, row in want.iterrows():
        g = got[row["shard"]]
        for k in want.columns:
            assert int(g[k]) == int(row[k]), (row["shard"], k)
    # the heavy arm fired, under real decrement pressure (the tail has
    # far more distinct keys than the capacity)
    assert sum(g["n_heavy"] for g in got.values()) >= 2
    assert all(g["all_heavy_survived"] and g["mg_size_le_capacity"]
               and g["all_est_le_exact"] and g["all_est_within_bound"]
               and g["n_shard_consistent"] for g in got.values())
