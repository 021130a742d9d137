"""Declared StructTypes for every logical dataset in the reference
(SURVEY.md §1.4). The reference declares schemas only at the edges
(BigQuery JSON schemas terraform/storage.tf:30-222, MongoDB $jsonSchema
validators terraform/vm.tf:141-261) and parses untyped dicts in flight;
here every dataset has an explicit StructType so ingestion is
`from_json(col, schema)` + `try_cast` — bad values become NULL, never a
crash, matching the reference's swallow-everything parsing
(dataflow/stream_join.py:212-214,226-228).
"""

from __future__ import annotations

from pyspark.sql import types as T

SYMBOLS = ("ETH", "SOL", "FTM", "SHIB")  # dataflow/stream_join.py:26

# tweets stream — twitter/BigData.py:57-66; terraform/storage.tf:34-79
TWEET_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("author_id", T.StringType()),
    T.StructField("crypto_key", T.StringType()),
    T.StructField("created_at_raw", T.StringType()),
    T.StructField("created_at_iso", T.StringType()),
    T.StructField("timestamp_ms", T.LongType()),
    T.StructField("timestamp_sec", T.LongType()),
])

# wide price stream — coincap/main.py:26-51; one column per symbol
PRICES_WIDE_SCHEMA = T.StructType(
    [T.StructField("timestamp", T.LongType())]
    + [T.StructField(s, T.DoubleType()) for s in SYMBOLS]
)

# normalized long prices — terraform/scripts/batch_to_mongo.py:186-198
PRICES_LONG_SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("timestamp", T.LongType()),
])

# TA indicator stream — coincap/main.py:97-108
TA_SCHEMA = T.StructType([
    T.StructField("timestamp", T.LongType()),
    T.StructField("symbol", T.StringType()),
    T.StructField("sma", T.DoubleType()),
    T.StructField("rsi", T.DoubleType()),
    T.StructField("macd", T.DoubleType()),
    T.StructField("macd_signal", T.DoubleType()),
    T.StructField("macd_hist", T.DoubleType()),
    T.StructField("vwap24", T.DoubleType()),
    T.StructField("time", T.LongType()),
    T.StructField("date", T.StringType()),
])

# windowed-join output — terraform/storage.tf:131-167 / vm.tf:192-210
PRICES_WITH_TWEETS_SCHEMA = T.StructType([
    T.StructField("event_timestamp", T.TimestampType()),
    T.StructField("symbol", T.StringType()),
    T.StructField("tweet_volume", T.LongType()),
    T.StructField("avg_price", T.DoubleType()),
    T.StructField("last_price", T.DoubleType()),
    T.StructField("tweet_texts", T.ArrayType(T.StringType())),
])

# sentiment output — terraform/vm.tf:212-227
TWEET_SENTIMENT_SCHEMA = T.StructType([
    T.StructField("event_timestamp", T.TimestampType()),
    T.StructField("symbol", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("sentiment_score", T.DoubleType()),
    T.StructField("sentiment_magnitude", T.DoubleType()),
    T.StructField("sentiment_label", T.StringType()),
    T.StructField("action_signal", T.StringType()),
])

# forecast output — terraform/vm.tf:229-242
PRICE_FORECAST_SCHEMA = T.StructType([
    T.StructField("event_timestamp", T.TimestampType()),
    T.StructField("symbol", T.StringType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("price_timestamp", T.LongType()),
    T.StructField("arima_next_price_forecast", T.DoubleType()),
])

# multimodal: opaque payload + typed metadata (extension surface)
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image|audio|video
    T.StructField("payload", T.BinaryType()),       # opaque bytes
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])
