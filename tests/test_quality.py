"""Data-quality suite (queries/quality.py): a clean table yields
all-pass, and each check counts exactly its own violation class.
(The registered query's planted-dirty parity vs DuckDB is covered by
tests/test_deferred_parity.py.)"""

import datetime as dt

from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries.quality import (
    VALUE_HI,
    dq_events_checks,
    dq_fk_orphans,
)

T0 = dt.datetime(2024, 1, 1)
EV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
             "event_type string, value double, props string")


def test_clean_events_all_pass(spark):
    rows = [(i, T0, 100 + i, "click", 1.0, None) for i in range(10)]
    out = dq_events_checks(spark.createDataFrame(rows, EV_SCHEMA)).collect()
    assert len(out) == 5
    assert all(r.n_violations == 0 for r in out)


def test_each_check_counts_its_own_violation(spark):
    rows = [
        (1, T0, 100, "click", 1.0, None),
        (1, T0, 101, "click", 1.0, None),         # duplicate id
        (2, None, 102, "click", 1.0, None),       # null ts
        (3, T0, None, "click", 1.0, None),        # null user
        (4, T0, 104, "click", VALUE_HI * 3, None),  # out of range
        (5, T0, 105, "bogus", 1.0, None),         # off-domain type
    ]
    got = {r.check_name: r.n_violations
           for r in dq_events_checks(
               spark.createDataFrame(rows, EV_SCHEMA)).collect()}
    assert got == {
        "events.event_id_unique": 1,
        "events.ts_not_null": 1,
        "events.user_id_not_null": 1,
        "events.value_in_range": 1,
        "events.event_type_in_domain": 1,
    }


def test_fk_orphans_counts_and_ignores_null_keys(spark):
    facts = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long")
    dim = spark.createDataFrame([(10,), (20,)], "k long")
    r = dq_fk_orphans(facts, "fk", dim, "k", "t.fk").collect()[0]
    # NULL fk is a completeness problem, not a referential one
    assert (r.n_rows, r.n_violations) == (3, 1)


def test_streaming_dq_monitor(spark, tmp_path):
    """The foreachBatch monitor audits every microbatch: per-batch check
    rows land in parquet, violations attributed to the batch that
    carried them."""
    from big_data_crypto_sentiment_spark.streaming.sinks import (
        start_dq_monitor,
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "audit")
    clean = [(i, T0, 100 + i, "click", 1.0, None) for i in range(5)]
    dirty = [(9, None, None, "bogus", VALUE_HI * 3, None)]
    spark.createDataFrame(clean, EV_SCHEMA).coalesce(1) \
         .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(EV_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_dq_monitor(stream, out, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        spark.createDataFrame(dirty, EV_SCHEMA).coalesce(1) \
             .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    audit = spark.read.parquet(out)
    got = {(r.batch_id, r.check_name): r.n_violations
           for r in audit.collect()}
    clean_batches = {b for (b, _) in got}
    assert len(clean_batches) == 2
    b0, b1 = sorted(clean_batches)
    assert all(got[(b0, c)] == 0 for c in
               ("events.ts_not_null", "events.user_id_not_null",
                "events.value_in_range", "events.event_type_in_domain"))
    assert got[(b1, "events.ts_not_null")] == 1
    assert got[(b1, "events.value_in_range")] == 1
    assert got[(b1, "events.event_type_in_domain")] == 1
