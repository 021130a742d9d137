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


def read_prices_csv(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.csv(path, header=True, schema=PRICES_CSV_SCHEMA)
    return (raw.select(
                "symbol",
                F.col("price").try_cast("double").alias("price"),
                F.col("timestamp").try_cast("long").alias("ts_ms"),
                F.timestamp_millis(F.col("timestamp").try_cast("long"))
                 .alias("event_ts"))
               .filter(F.col("price").isNotNull()))
