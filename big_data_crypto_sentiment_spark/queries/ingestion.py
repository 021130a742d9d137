"""Ingestion-source queries (SURVEY.md §2.1 S13/S14/S9, §2.2 P1/P5-P7/
P16) over committed deterministic fixtures in tests/fixtures/.

Each query drives a real source reader from `..sources` end-to-end —
file listing, schema-fixed parse, filename→symbol tagging, tolerant
timestamp chain, try_cast coercion — and every one has a DuckDB oracle
twin that reads the SAME fixture files with read_json/read_csv, so the
whole ingestion path (not just the transforms) is value-checked.

Fixture dirt (per FIXTURES.md §1): null ids, null crypto_key, invalid
ISO timestamps with epoch-ms fallback, Twitter-format-only rows, fully
unparseable rows (→ NULL event_ts), junk numerics for try_cast, empty
text, CJK text, URL/mention/cashtag/CTA texts, and the SHI→SHIB
filename fixup.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import normalize_tweets, read_prices_csv, read_tweets_jsonl, read_warehouse
from .tweets_json_sql import TWEETS_ORACLE_SELECT  # split for readability

REPO_ROOT = Path(__file__).resolve().parents[2]
TWEETS_DIR = str(REPO_ROOT / "tests" / "fixtures" / "tweets")
PRICES_CSV = str(REPO_ROOT / "tests" / "fixtures" / "prices.csv")


# --- S13 + P1 + P5/P6/P7 + P16: JSON-dir tweet normalizer ---
def q_src_tweets_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_tweets(read_tweets_jsonl(spark, TWEETS_DIR))


# --- derived: per-symbol tweet volume through the same source ---
def q_src_tweets_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = normalize_tweets(read_tweets_jsonl(spark, TWEETS_DIR))
    return (df.filter(F.col("crypto_key").isNotNull())
              .groupBy("symbol")
              .agg(F.count("*").alias("n_tweets"),
                   F.count("event_ts").alias("n_with_ts"),
                   F.count("id").alias("n_with_id")))


# --- S14: CSV price source with coercion + null filter ---
def q_src_csv_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_prices_csv(spark, PRICES_CSV)


# --- SURVEY §1.3 faithful-decimal mode: DecimalType(38,18) prices kept
#     exact end-to-end through the flagship per-symbol aggregates. The
#     fixture plants quotes that differ BELOW double precision (two BTC
#     prices apart by 1e-18), so this query's hash only matches when no
#     stage lossily rounds. Exact payloads travel as full-scale decimal
#     STRINGS (both engines format DECIMAL(38,18) with all 18 places,
#     and string hashing is canonicalization-proof); the avg is the
#     deterministic double derived from the exact sum via a
#     CORRECTLY-ROUNDED conversion on both engines — Spark's
#     BigDecimal→double is correctly rounded, while DuckDB's
#     DECIMAL→DOUBLE double-rounds and its decimal rescale TRUNCATES
#     (both observed on this fixture), so the oracle goes
#     DECIMAL→VARCHAR→DOUBLE (strtod, correctly rounded) instead. ---
PRICES_HP_CSV = str(REPO_ROOT / "tests" / "fixtures" / "prices_hp.csv")


def q_src_csv_prices_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_prices_csv(spark, PRICES_HP_CSV, decimal_mode=True)
    return (p.groupBy("symbol")
             .agg(F.count("*").alias("n"),
                  F.sum("price").alias("_sum"),
                  F.max_by("price", F.col("ts_ms")).alias("_last"))
             .select("symbol", "n",
                     F.col("_sum").cast("decimal(38,18)").cast("string")
                      .alias("sum_price"),
                     F.col("_last").cast("string").alias("last_price"),
                     (F.col("_sum").cast("double") / F.col("n"))
                     .alias("avg_price")))


# --- S9: warehouse source with format fallback (avro → parquet) ---
def q_src_warehouse_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_warehouse(spark, f"{sf_dir}/part.parquet", fmt="avro")
    return df.select("p_partkey", "p_name", "p_retailprice")


# --- S5 live: REAL Avro container bytes through the warehouse source.
#     The bounded `nation` dimension is captured to an Avro OCF (pure-
#     Python writer, public spec) and read back DISTRIBUTED via the
#     binaryFile+mapInPandas decoder — oracle-checked against the same
#     rows from parquet, so the whole encode→decode path is value-proven
#     (reference: batch_to_mongo.py:364's spark.read.format("avro")). ---
def q_src_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.avro_io import read_avro, to_avro_schema, write_avro
    from ._util import table
    nation = table(spark, sf_dir, "nation")
    avro_schema = to_avro_schema(nation.schema, "nation")
    d = tempfile.mkdtemp(prefix="avro_rt_")
    # 25-row dimension: driver-side capture is bounded by design
    write_avro(os.path.join(d, "nation.avro"),
               [r.asDict() for r in nation.collect()], avro_schema,
               codec="deflate")
    return read_avro(spark, d, avro_schema)


# NB: src_avro_roundtrip registers in queries/avro_rt.py (the LAST
# module) so it sits at position 51 of the oracle-first registry — the
# driver's correctness window is a fixed 50-entry prefix, and the 50
# long-green rows must keep their slots; the roundtrip is additionally
# value-proven by tools/check.py and the pytest roundtrip suite.
QUERIES = {
    "src_tweets_normalize": q_src_tweets_normalize,
    "src_tweets_volume": q_src_tweets_volume,
    "src_csv_prices": q_src_csv_prices,
    "src_csv_prices_decimal": q_src_csv_prices_decimal,
    "src_warehouse_fallback": q_src_warehouse_fallback,
}

_READ_TWEETS = f"""
read_json('{TWEETS_DIR}/*.jsonl', format='newline_delimited',
  columns={{'id': 'VARCHAR', 'text': 'VARCHAR', 'author_id': 'VARCHAR',
           'crypto_key': 'VARCHAR', 'created_at_raw': 'VARCHAR',
           'created_at_iso': 'VARCHAR', 'timestamp_ms': 'VARCHAR',
           'timestamp_sec': 'VARCHAR'}}, filename=true)
"""

ORACLE = {
    "src_tweets_normalize": f"""
SELECT {TWEETS_ORACLE_SELECT}
FROM {_READ_TWEETS}
""",
    "src_tweets_volume": f"""
WITH n AS (
  SELECT {TWEETS_ORACLE_SELECT}
  FROM {_READ_TWEETS}
)
SELECT symbol, COUNT(*) AS n_tweets, COUNT(event_ts) AS n_with_ts,
       COUNT(id) AS n_with_id
FROM n WHERE crypto_key IS NOT NULL GROUP BY symbol
""",
    "src_csv_prices": f"""
SELECT symbol,
       TRY_CAST(price AS DOUBLE) AS price,
       TRY_CAST("timestamp" AS BIGINT) AS ts_ms,
       epoch_ms(TRY_CAST("timestamp" AS BIGINT)) AS event_ts
FROM read_csv('{PRICES_CSV}', header=true, all_varchar=true)
WHERE TRY_CAST(price AS DOUBLE) IS NOT NULL
""",
    "src_csv_prices_decimal": f"""
WITH p AS (
  SELECT symbol,
         TRY_CAST(price AS DECIMAL(38,18)) AS price,
         TRY_CAST("timestamp" AS BIGINT) AS ts_ms
  FROM read_csv('{PRICES_HP_CSV}', header=true, all_varchar=true)
  WHERE TRY_CAST(price AS DECIMAL(38,18)) IS NOT NULL
)
SELECT symbol, COUNT(*) AS n,
       CAST(CAST(SUM(price) AS DECIMAL(38,18)) AS VARCHAR) AS sum_price,
       CAST(arg_max(price, ts_ms) AS VARCHAR) AS last_price,
       CAST(CAST(CAST(SUM(price) AS DECIMAL(38,18)) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS avg_price
FROM p GROUP BY symbol
""",
    "src_warehouse_fallback": """
SELECT p_partkey, p_name, p_retailprice FROM part
""",
}
