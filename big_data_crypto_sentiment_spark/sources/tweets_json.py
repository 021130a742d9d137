"""JSON tweet-corpus source (SURVEY.md S13/P1/P5-P7/P16).

The reference loads a directory of per-symbol JSON files, tags the
symbol from the filename (first 3 chars, SHI→SHIB fixup —
twitter/stream_simulator_continuous.py:38-82, :50-51), parses tweets
tolerantly (swallow anything malformed — dataflow/stream_join.py:206-214),
derives an event timestamp through a fallback chain of formats
(stream_join.py:34-61; terraform/scripts/batch_to_mongo.py:154-166), and
coerces numerics defensively (stream_join.py:64-79).

Spark-first form: files are JSON Lines read with `spark.read.text` (the
scalable shape — line-splittable, no whole-file parse), `from_json` with
an all-string schema (P1), `input_file_name()` + `regexp_extract` for
the symbol tag (P16), `coalesce(try_to_timestamp(...), ...)` for the
tolerant timestamp chain (P5/P6), and `try_cast` for numeric coercion
(P7) — bad values become NULL, never an exception.

Scale notes: one narrow scan, zero shuffles, all JVM expressions; file
listing parallelizes on the driver and parsing on executors. Schema is
fixed (never inferSchema — inference would scan the data twice and race
schema drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_TWEET_FIELDS = (
    "id", "text", "author_id", "crypto_key",
    "created_at_raw", "created_at_iso", "timestamp_ms", "timestamp_sec",
)

# all-string parse schema; typing happens in normalize (defensive P7)
TWEET_JSON_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType()) for f in RAW_TWEET_FIELDS]
)

SYMBOL_FIXUPS = {"SHI": "SHIB"}  # stream_simulator_continuous.py:50-51

# "Mon Jan 01 10:00:00 +0000 2024" minus the day name (Spark can't parse
# day-of-week); both engines strip the first 4 chars and parse the rest
TWITTER_FMT_SPARK = "MMM dd HH:mm:ss Z yyyy"
TWITTER_FMT_DUCKDB = "%b %d %H:%M:%S %z %Y"


def read_tweets_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Directory of JSONL files → parsed string columns + symbol tag."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.from_json("value", TWEET_JSON_SCHEMA).alias("t"),
        F.regexp_extract(F.input_file_name(), r"([A-Z]{3})[^/]*\.jsonl$", 1)
         .alias("sym3"),
    )
    fixup = F.col("sym3")
    for bad, good in SYMBOL_FIXUPS.items():
        fixup = F.when(F.col("sym3") == bad, good).otherwise(fixup)
    return parsed.select("t.*", fixup.alias("symbol"))


MIN_YEAR, MAX_YEAR = 1900, 2100  # defensive: "0000" parses to year 0,
# which is a valid Spark timestamp but crashes Python datetime on collect


def clamp_ts(ts):
    """NULL out timestamps outside the plausible domain range."""
    return F.when(F.year(ts).between(MIN_YEAR, MAX_YEAR), ts)


def _event_ts():
    """P5/P6 tolerant chain: RFC3339 → epoch-ms → Twitter format."""
    return clamp_ts(F.coalesce(
        F.try_to_timestamp(F.col("created_at_iso")),
        F.timestamp_millis(F.col("timestamp_ms").try_cast("long")),
        F.try_to_timestamp(F.substring("created_at_raw", 5, 100),
                           F.lit(TWITTER_FMT_SPARK)),
    ))


def normalize_tweets(df: DataFrame) -> DataFrame:
    """Typed projection with defensive coercion; drops nothing — null
    event_ts rows survive so downstream filters stay explicit."""
    return df.select(
        "symbol", "id", "text", "author_id", "crypto_key",
        _event_ts().alias("event_ts"),
        F.col("timestamp_ms").try_cast("long").alias("ts_ms"),
        F.col("timestamp_sec").try_cast("long").alias("ts_sec"),
    )
