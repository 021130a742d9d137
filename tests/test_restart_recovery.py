"""Checkpoint restart recovery: kill a streaming query mid-stream,
restart it against the SAME checkpoint, and prove exactly-once output —
no rows lost from pre-kill batches, none duplicated on replay, and new
files drained after the restart. This is the T9 discipline tested at
the query-lifecycle level (the sink tests cover idempotent file
naming; this covers the checkpoint's source-offset replay)."""

from datetime import datetime, timedelta

from big_data_crypto_sentiment_spark.streaming.sinks import (
    start_capture_sink,
    start_jsonl_sink,
)

SCHEMA = "event_time timestamp, symbol string, price double"
T0 = datetime(2024, 1, 1, 12, 0, 0)


def _rows(lo, hi):
    return [(T0 + timedelta(seconds=i), "BTC", float(i))
            for i in range(lo, hi)]


def _drop(spark, src, lo, hi):
    spark.createDataFrame(_rows(lo, hi), SCHEMA).coalesce(1) \
         .write.mode("append").parquet(src)


def test_capture_sink_survives_restart_exactly_once(spark, tmp_path):
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    _drop(spark, src, 0, 10)

    def start():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return start_capture_sink(stream, out, ck, trigger_once=False)

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # "crash" between drops

    _drop(spark, src, 10, 25)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r.price for r in spark.read.parquet(out).collect())
    assert got == [float(i) for i in range(25)]  # no loss, no dups


def test_jsonl_sink_replays_idempotently_after_restart(spark, tmp_path):
    import glob
    import json
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    _drop(spark, src, 0, 8)

    def start():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return start_jsonl_sink(stream, out, ck)

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _drop(spark, src, 8, 12)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    prices = sorted(
        json.loads(line)["price"]
        for p in glob.glob(f"{out}/*.jsonl") for line in open(p))
    assert prices == [float(i) for i in range(12)]
