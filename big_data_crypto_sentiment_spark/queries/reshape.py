"""Reshape / group-collect queries filling the remaining §2 rows:

  * P14 KV flatten — parse payload to a struct then `kv.*`
    (dataflow/stream_join_old.py:314's `{"symbol": k, **v}`).
  * J4 zip-join of parallel arrays — `arrays_zip` + `posexplode`
    (coincap/main.py:49-50's `zip(SYMBOLS, raw_prices)`).
  * A5 group-collect for training — `collect_list(struct(ts, price))`
    per symbol (analytical_module/arima.py:482-484); the checked
    projection encodes the sorted list as one string (the driver's
    canonicalizer can't hash list cells) plus its length.
  * A9 binned last-price + text features per (symbol, bin)
    (eda Milestone4 cell 10).
  * W-extension log-return — `ln(p_t / p_{t-1})` per symbol
    (Milestone4 cell 8), the one §2.8 scalar (log) not yet exercised.

Scale notes: all single-scan; the group-collects shuffle once on their
group key. A5's full-history-per-symbol collect is the reference's
trainer input shape — bounded by per-symbol history; the applyInPandas
trainer (ml.q_ml_ar1_train) is the form that avoids materializing the
list at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import table

SEP = "\x1f"


# --- P14: payload → struct → kv.* flatten ---
def q_kv_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", "event_type",
        F.from_json("props", "struct<k:long>").alias("kv"))
    return parsed.select("event_id", "event_type", "kv.*")


# --- J4: zip-join of parallel arrays (wide record → long rows) ---
def q_zip_explode_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    zipped = F.arrays_zip(
        F.array(F.lit("qty"), F.lit("price"), F.lit("disc")).alias("name"),
        F.array("l_quantity", "l_extendedprice", "l_discount").alias("val"),
    )
    return (li.select("l_orderkey", "l_linenumber",
                      F.posexplode(zipped).alias("pos", "z"))
              .select("l_orderkey", "l_linenumber", "pos",
                      F.col("z.name").alias("name"),
                      F.col("z.val").alias("val")))


# --- A5: per-symbol training collect (checked as encoded string) ---
def q_group_collect_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # value is 2-decimal data → integer cents encode it losslessly and
    # identically in both engines (float formatting rounding modes differ)
    pair = F.concat(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                    F.lit("@"),
                    F.round(F.col("value") * 100).cast("long").cast("string"))
    return (ev.filter(F.col("value").isNotNull())
              .groupBy("event_type")
              .agg(F.count("*").alias("n_points"),
                   F.array_join(F.sort_array(F.collect_list(pair)), SEP)
                    .alias("series_enc")))


# --- A9: binned last-price + per-bin text features ---
def q_binned_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
              .agg(F.max_by("value", "ts").alias("last_value"),  # ts unique per (bin, symbol) in fixture
                   F.count("*").alias("n_events"),
                   (F.sum(F.length("props").cast("decimal(27,6)")).cast("double")
                    / F.count("props")).alias("avg_text_len"),
                   F.round(F.avg((F.length("props") > 9).cast("int")), 6)
                    .alias("share_long_text"))
              .select(F.col("w.start").alias("bin_ts"), "event_type",
                      "last_value", "n_events", "avg_text_len",
                      "share_long_text"))


# --- log-return per symbol (Milestone4 cell 8) ---
def q_log_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id", "event_type", "value",
        # ln() differs by ~1 ulp between JVM and libm — round on both sides
        F.round(F.log(F.col("value") / prev), 8).alias("log_ret"))


# --- as-of join: last price at-or-before each tweet-role event ---
def q_asof_price_at_tweet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof_join import asof_join
    ev = table(spark, sf_dir, "events")
    tweets = (ev.filter((F.col("event_id") % 3 != 0)
                        & F.col("props").isNotNull())
                .select("event_id", F.col("event_type").alias("symbol"),
                        "ts"))
    prices = (ev.filter((F.col("event_id") % 2 != 0)
                        & F.col("value").isNotNull())
                .select(F.col("event_type").alias("symbol"), "ts",
                        F.col("value").alias("price")))
    return asof_join(tweets, prices, key="symbol", ts="ts",
                     value_cols=("price",))


# --- interval join: clicks within ±5 min of an error, per user ---
INTERVAL_TOL_S = 300


def q_interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.interval_join import time_tolerance_join
    ev = table(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
                .select("user_id", F.col("event_id").alias("error_id"),
                        F.col("ts").alias("error_ts")))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", F.col("event_id").alias("click_id"),
                        F.col("ts").alias("click_ts")))
    return time_tolerance_join(errors, clicks, ["user_id"],
                               INTERVAL_TOL_S, "error_ts", "click_ts")


QUERIES = {
    "asof_price_at_tweet": q_asof_price_at_tweet,
    "interval_join_events": q_interval_join_events,
    "kv_flatten": q_kv_flatten,
    "zip_explode_measures": q_zip_explode_measures,
    "group_collect_training": q_group_collect_training,
    "binned_features": q_binned_features,
    "log_return": q_log_return,
}

ORACLE = {
    "asof_price_at_tweet": """
WITH tweets AS (
  SELECT event_id, event_type AS symbol, ts FROM events
  WHERE event_id % 3 <> 0 AND props IS NOT NULL
), prices AS (
  SELECT event_type AS symbol, ts, value AS price FROM events
  WHERE event_id % 2 <> 0 AND value IS NOT NULL
)
SELECT t.event_id, t.symbol, t.ts, p.price
FROM tweets t ASOF LEFT JOIN prices p
  ON t.symbol = p.symbol AND t.ts >= p.ts
""",
    "interval_join_events": """
SELECT e.user_id, e.event_id AS error_id, e.ts AS error_ts,
       c.event_id AS click_id, c.ts AS click_ts,
       epoch_us(c.ts) - epoch_us(e.ts) AS dt_us
FROM events e JOIN events c
  ON e.user_id = c.user_id
WHERE e.event_type = 'error' AND c.event_type = 'click'
  AND abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 300000000
""",
    "kv_flatten": """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
    "zip_explode_measures": """
SELECT l_orderkey, l_linenumber, pos, name, val FROM (
  SELECT l_orderkey, l_linenumber, 0 AS pos, 'qty' AS name, l_quantity AS val
  FROM lineitem WHERE l_orderkey % 10 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 1, 'price', l_extendedprice
  FROM lineitem WHERE l_orderkey % 10 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 2, 'disc', l_discount
  FROM lineitem WHERE l_orderkey % 10 = 0
)
""",
    "group_collect_training": """
SELECT event_type, COUNT(*) AS n_points,
       array_to_string(list_sort(list(
         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '@' ||
         CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR))), chr(31)) AS series_enc
FROM events WHERE value IS NOT NULL
GROUP BY event_type
""",
    "binned_features": """
SELECT time_bucket(INTERVAL '6 hours', ts) AS bin_ts, event_type,
       arg_max(value, ts) AS last_value,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(length(props) AS DECIMAL(27,6))) AS DOUBLE)
         / COUNT(props) AS avg_text_len,
       ROUND(AVG(CAST(length(props) > 9 AS INT)), 6) AS share_long_text
FROM events
GROUP BY 1, 2
""",
    "log_return": """
SELECT event_id, event_type, value,
       ROUND(LN(value / LAG(value) OVER (PARTITION BY event_type
                                         ORDER BY ts, event_id)), 8) AS log_ret
FROM events WHERE value IS NOT NULL AND value > 0
""",
}
