"""TA-indicator queries (SURVEY.md W6) over `events` as the tick table:
price = value, symbol = event_type, deterministic synthetic volume
(event_id % 7 + 1) since the fixture has no volume column."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ta import SMA_N, sma_vwap, ta_indicators
from ._util import table


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (ev.filter(F.col("value").isNotNull())
              .select(F.col("event_type").alias("symbol"),
                      "ts", "event_id",
                      F.col("value").alias("price"),
                      (F.col("event_id") % 7 + 1).cast("double")
                       .alias("volume")))


def q_ta_sma_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sma_vwap(_ticks(spark, sf_dir), n=SMA_N,
                    order_cols=("event_id",))


def q_ta_ema_rsi_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir).select("symbol", "ts", "price")
    out = ta_indicators(t)
    rounded = [F.round(c, 6).alias(c) for c in
               ("ema_fast", "ema_slow", "macd", "macd_signal",
                "macd_hist", "rsi")]
    return out.select("symbol", "ts", "price", *rounded)


QUERIES = {
    "ta_sma_vwap": q_ta_sma_vwap,
    "ta_ema_rsi_macd": q_ta_ema_rsi_macd,  # rows-only: recursive, pytest-pinned
}

ORACLE = {
    "ta_sma_vwap": f"""
WITH ticks AS (
  SELECT event_type AS symbol, ts, event_id, value AS price,
         CAST(event_id % 7 + 1 AS DOUBLE) AS volume
  FROM events WHERE value IS NOT NULL
)
SELECT symbol, ts, event_id, price, volume,
       CAST(SUM(CAST(price AS DECIMAL(27,6))) OVER w AS DOUBLE)
         / COUNT(price) OVER w AS sma,
       CAST(SUM(CAST(price * volume AS DECIMAL(27,6))) OVER w AS DOUBLE)
         / NULLIF(CAST(SUM(CAST(volume AS DECIMAL(27,6))) OVER w AS DOUBLE), 0.0)
         AS vwap
FROM ticks
WINDOW w AS (PARTITION BY symbol ORDER BY ts, event_id
             ROWS BETWEEN {SMA_N - 1} PRECEDING AND CURRENT ROW)
""",
}
