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


# registered-query tick cap: the recursive-CTE oracle is O(steps)
# ITERATIONS in DuckDB (20k steps at sf0.1 ran >5 min), so the paired
# query computes indicators over the first TA_MAX_TICKS ticks per
# symbol — covers every tick at sf0.001/0.01 and keeps the oracle
# tractable at sf0.1. The operator itself (ta_indicators) is unbounded;
# its Spark cost is one shuffle + one Arrow batch per symbol at any
# length.
TA_MAX_TICKS = 2500


def q_ta_ema_rsi_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    t = _ticks(spark, sf_dir).select("symbol", "ts", "price")
    w = Window.partitionBy("symbol").orderBy("ts")
    t = (t.withColumn("_rn", F.row_number().over(w))
          .filter(F.col("_rn") <= TA_MAX_TICKS).drop("_rn"))
    out = ta_indicators(t)
    rounded = [F.round(c, 6).alias(c) for c in
               ("ema_fast", "ema_slow", "macd", "macd_signal",
                "macd_hist", "rsi")]
    return out.select("symbol", "ts", "price", *rounded)


# --- TWAP: TIME-weighted average price per (symbol, day) — VWAP's
#     sibling for thin/no-volume feeds: each tick's price is weighted
#     by how long it remained the live quote (next tick ts − ts within
#     the day; the day's last tick carries zero weight rather than
#     crossing midnight). Exact arithmetic end-to-end: price as
#     decimal(12,6) × integer micro-duration = decimal(32,6), summed
#     exactly, ONE double division at the end — identical IEEE tree on
#     both engines, no rounding step. One (symbol) window pass + one
#     hash agg. ---
def q_ta_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    t = _ticks(spark, sf_dir).select("symbol", "ts", "event_id", "price")
    day = F.to_date("ts").cast("string")
    w = Window.partitionBy("symbol", day).orderBy("ts", "event_id")
    dt_us = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
    weighted = (t.select("symbol", day.alias("day"),
                         F.col("price").cast("decimal(12,6)").alias("p"),
                         F.coalesce(dt_us, F.lit(0)).alias("dt"))
                 .select("symbol", "day",
                         (F.col("p") * F.col("dt")).alias("pw"), "dt"))
    return (weighted.groupBy("symbol", "day")
            .agg(F.count("*").alias("n_ticks"),
                 F.sum("dt").cast("long").alias("span_us"),
                 (F.sum("pw").cast("double")
                  / F.sum("dt").cast("double")).alias("twap"))
            .orderBy("symbol", "day"))  # bounded: symbols × days


QUERIES = {
    "ta_sma_vwap": q_ta_sma_vwap,
    "ta_ema_rsi_macd": q_ta_ema_rsi_macd,
    "ta_twap": q_ta_twap,
}

# exact double literals for the EMA alphas — the recursive-CTE oracle
# must run the IDENTICAL recurrence (1-α)·e + α·x in the same op order
# as operators/ta.py:ta_pandas (see its docstring)
_AF = repr(2.0 / (12 + 1))   # EMA_FAST
_AS = repr(2.0 / (26 + 1))   # EMA_SLOW
_AG = repr(2.0 / (9 + 1))    # EMA_SIGNAL
_AR = repr(1.0 / 14)         # RSI Wilder alpha

_EF = f"((1.0 - {_AF}) * r.ef + {_AF} * t.price)"
_ES = f"((1.0 - {_AS}) * r.es + {_AS} * t.price)"
_MACD = f"({_EF} - {_ES})"
_G = "GREATEST(t.price - r.price, 0.0)"
_L = "GREATEST(r.price - t.price, 0.0)"
_AGN = f"(CASE WHEN r.ag IS NULL THEN {_G} " \
       f"ELSE (1.0 - {_AR}) * r.ag + {_AR} * {_G} END)"
_ALN = f"(CASE WHEN r.al IS NULL THEN {_L} " \
       f"ELSE (1.0 - {_AR}) * r.al + {_AR} * {_L} END)"

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
    # the recursion (one row per (symbol, step)) iterates all symbols in
    # lockstep — same shape as the dedup_components recursive oracle.
    # Hash-exact vs the Spark side at sf0.001/sf0.01 (1k/10k rows); at
    # sf0.1 the ORACLE side itself (20k CTE iterations) takes minutes —
    # a DuckDB recursion cost, not a Spark-side limit; the Spark plan is
    # one shuffle + one Arrow batch per symbol at any scale.
    "ta_ema_rsi_macd": f"""
WITH RECURSIVE ticks AS (
  SELECT * FROM (
    SELECT event_type AS symbol, ts, value AS price,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts) AS rn
    FROM events WHERE value IS NOT NULL)
  WHERE rn <= {TA_MAX_TICKS}
), rec AS (
  SELECT symbol, rn, ts, price,
         price AS ef, price AS es,
         CAST(0.0 AS DOUBLE) AS macd, CAST(0.0 AS DOUBLE) AS sig,
         CAST(NULL AS DOUBLE) AS ag, CAST(NULL AS DOUBLE) AS al,
         CAST(NULL AS DOUBLE) AS rsi
  FROM ticks WHERE rn = 1
  UNION ALL
  SELECT t.symbol, t.rn, t.ts, t.price,
         {_EF} AS ef, {_ES} AS es, {_MACD} AS macd,
         (1.0 - {_AG}) * r.sig + {_AG} * {_MACD} AS sig,
         {_AGN} AS ag, {_ALN} AS al,
         CASE WHEN {_ALN} > 0
              THEN 100.0 - 100.0 / (1.0 + {_AGN} / {_ALN})
              ELSE 100.0 END AS rsi
  FROM ticks t JOIN rec r ON t.symbol = r.symbol AND t.rn = r.rn + 1
)
SELECT symbol, ts, price,
       ROUND(ef, 6) AS ema_fast, ROUND(es, 6) AS ema_slow,
       ROUND(macd, 6) AS macd, ROUND(sig, 6) AS macd_signal,
       ROUND(macd - sig, 6) AS macd_hist, ROUND(rsi, 6) AS rsi
FROM rec
""",
}


# identical decimal widths and single final division; VARCHAR hop on
# the decimal sum avoids DuckDB's DECIMAL->DOUBLE double-rounding
ORACLE["ta_twap"] = """
WITH t AS (
  SELECT event_type AS symbol, ts, event_id,
         CAST(value AS DECIMAL(12,6)) AS p,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS day
  FROM events WHERE value IS NOT NULL
), d AS (
  SELECT symbol, day, p,
         COALESCE(epoch_us(LEAD(ts) OVER (
           PARTITION BY symbol, day ORDER BY ts, event_id))
           - epoch_us(ts), 0) AS dt
  FROM t
)
SELECT symbol, day, COUNT(*) AS n_ticks,
       CAST(SUM(dt) AS BIGINT) AS span_us,
       CAST(CAST(SUM(p * dt) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(dt) AS VARCHAR) AS DOUBLE) AS twap
FROM d GROUP BY symbol, day
ORDER BY symbol, day
"""
