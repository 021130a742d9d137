"""CSV price-export source (SURVEY.md S14, P7, P8).

Mirrors the reference's pandas `read_csv` of price exports
(eda/Data_Minions_EDA_Milestone4.ipynb cell 5) with an explicit schema
(no inferSchema — a second full scan at scale), try_cast numeric
coercion, and the standard null-price filter
(terraform/scripts/batch_to_mongo.py:194).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PRICES_CSV_SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType()),
    T.StructField("price", T.StringType()),      # typed defensively below
    T.StructField("timestamp", T.StringType()),
])


def read_prices_csv(spark: SparkSession, path: str,
                    decimal_mode: bool = False) -> DataFrame:
    """``decimal_mode=False`` (default) mirrors the reference exactly:
    CoinCap-style 18-decimal price strings are parsed LOSSILY to double
    (coincap/main.py:49-51). ``decimal_mode=True`` is the SURVEY §1.3
    faithful option: prices keep DecimalType(38,18) end-to-end, so two
    quotes differing below double precision stay distinct and sums are
    exact — the mode a financial-grade pipeline runs."""
    price_type = "decimal(38,18)" if decimal_mode else "double"
    raw = spark.read.csv(path, header=True, schema=PRICES_CSV_SCHEMA)
    return (raw.select(
                "symbol",
                F.col("price").try_cast(price_type).alias("price"),
                F.col("timestamp").try_cast("long").alias("ts_ms"),
                F.timestamp_millis(F.col("timestamp").try_cast("long"))
                 .alias("event_ts"))
               .filter(F.col("price").isNotNull()))
