"""Source-reader edge paths the oracle can't see: corrupt JSON lines,
wrapped-shape tolerance, and the warehouse fallback error path."""

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.sources import (
    normalize_tweets,
    read_tweets_jsonl,
    read_warehouse,
)


def test_corrupt_json_line_becomes_null_row_not_crash(spark, tmp_path):
    d = tmp_path / "tweets"
    d.mkdir()
    (d / "ETH_x.jsonl").write_text(
        '{"id": "1", "text": "ok", "crypto_key": "ETH", '
        '"created_at_iso": "2024-01-01T00:00:00Z"}\n'
        'this is not json at all\n'
        '{"id": "2", "text": "also ok", "crypto_key": "ETH", '
        '"created_at_iso": "2024-01-01T00:01:00Z"}\n')
    out = normalize_tweets(read_tweets_jsonl(spark, str(d))).collect()
    assert len(out) == 3  # defensive: malformed row survives as nulls
    ids = {r.id for r in out}
    assert ids == {"1", "2", None}
    # every row still carries the filename-derived symbol
    assert {r.symbol for r in out} == {"ETH"}


def test_symbol_fixup_and_tags(spark):
    df = read_tweets_jsonl(spark, "tests/fixtures/tweets")
    syms = {r.symbol for r in df.select("symbol").distinct().collect()}
    assert syms == {"ETH", "SOL", "SHIB"}  # SHI_*.jsonl → SHIB


def test_timestamp_chain_fallback_order(spark):
    df = normalize_tweets(read_tweets_jsonl(spark, "tests/fixtures/tweets"))
    rows = {r.id: r for r in df.collect()}
    # id 1002: bad ISO, valid ms → ms fallback
    assert rows["1002"].event_ts.isoformat() == "2024-01-01T10:01:00"
    # id 1003: null ISO, junk ms, valid Twitter raw → raw fallback
    assert rows["1003"].event_ts.isoformat() == "2024-01-01T10:02:00"
    assert rows["1003"].ts_ms is None  # "12abc" try_cast → null
    # id 1004: everything unparseable → null, never an exception
    assert rows["1004"].event_ts is None


def test_warehouse_fallback_reads_parquet(spark):
    df = read_warehouse(spark, "/root/testdata/sf0.001/part.parquet",
                        fmt="avro")
    assert df.count() > 0


def test_warehouse_no_fallback_raises_not_implemented(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="avro"):
        read_warehouse(spark, str(tmp_path / "nope.avro"), fmt="avro")
