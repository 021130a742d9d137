"""Anchored streaming debounce (streaming/debounce.py): last-KEPT
anchoring (one survivor per gap window in a burst — the semantics the
batch lag-form cannot express), state carried across micro-batches,
verified against a pure-Python reference."""

from datetime import datetime, timedelta

from big_data_crypto_sentiment_spark.streaming.debounce import debounce_stream

SCHEMA = "event_id long, user_id long, event_type string, ts timestamp"
T0 = datetime(2024, 1, 1, 9, 0, 0)


def _t(minutes):
    return T0 + timedelta(minutes=minutes)


def _reference(rows, gap_min):
    last, kept = {}, []
    for eid, uid, et, ts in sorted(rows, key=lambda r: (r[3], r[0])):
        k = (uid, et)
        if k not in last or (ts - last[k]) > timedelta(minutes=gap_min):
            kept.append(eid)
            last[k] = ts
    return sorted(kept)


def _rows():
    # burst at t=0,3,6,9,12 for (1, click): anchored keeps 0 and 12
    # (gap-form would keep only t=0); second key independent
    return ([(i, 1, "click", _t(3 * i)) for i in range(5)]
            + [(100, 2, "view", _t(1)), (101, 2, "view", _t(4))])


def test_anchored_semantics_differ_from_gap_form(spark, tmp_path):
    rows = _rows()
    assert _reference(rows, 10) == [0, 4, 100]  # t=12 event has id 4


def test_stream_matches_reference_across_batches(spark, tmp_path):
    rows = _rows()
    late = [(200, 1, "click", _t(25)), (201, 1, "click", _t(26))]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
         .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = debounce_stream(stream, "10 minutes")
    q = (out.writeStream.format("memory").queryName("debounced")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start())
    try:
        q.processAllAvailable()
        # second batch: the t=25 event is >10 min after last kept (t=12)
        # -> kept; t=26 is 1 min after the NEW anchor -> suppressed.
        # Requires state to have survived the batch boundary.
        spark.createDataFrame(late, SCHEMA).coalesce(1) \
             .write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(r.event_id for r in spark.table("debounced").collect())
    finally:
        q.stop()
    assert got == _reference(rows + late, 10) == [0, 4, 100, 200]


def test_gap_parser_units_and_errors():
    """Singular, plural, and abbreviated units all parse; bad input
    raises ValueError (not KeyError) naming the accepted forms."""
    import pytest

    from big_data_crypto_sentiment_spark.streaming.debounce import (
        parse_gap_us,
    )
    assert parse_gap_us("1 minute") == 60_000_000
    assert parse_gap_us("10 minutes") == 600_000_000
    assert parse_gap_us("30 secs") == 30_000_000
    assert parse_gap_us("30 seconds") == 30_000_000
    assert parse_gap_us("2 hours") == 7_200_000_000
    assert parse_gap_us("1 h") == 3_600_000_000
    with pytest.raises(ValueError, match="accepted"):
        parse_gap_us("5 fortnights")
    with pytest.raises(ValueError, match="expected"):
        parse_gap_us("soon")
