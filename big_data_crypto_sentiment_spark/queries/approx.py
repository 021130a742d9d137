"""Approximate / sketch-based aggregates — the 100 TB cardinality
toolkit (no reference twin; the reference's EDA computes exact
value_counts at notebook scale, which doesn't survive 1000 executors).

  * approx_count_distinct (HyperLogLog++) vs exact — rows-only entries
    (sketch estimates are engine-specific); the pytest pins relative
    error.
  * hll_sketch_agg / hll_union_agg (Spark 3.5+ Datasketches) — the
    MERGEABLE form: per-partition/day sketches union into a global
    estimate without re-touching raw data, which is what makes
    incremental distinct-counting possible at scale.
  * percentile_approx vs exact percentile — same pattern for quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import table


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
              .agg(F.approx_count_distinct("user_id").alias("approx_users"),
                   F.countDistinct("user_id").alias("exact_users")))


def q_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day sketches → union → global estimate, next to the exact
    count: the pre-aggregate-then-merge shape."""
    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
               .agg(F.hll_sketch_agg("user_id").alias("sketch"),
                    F.countDistinct("user_id").alias("daily_exact")))
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
         .alias("merged_estimate"),
        F.sum("daily_exact").alias("sum_daily_exact"),  # > true distinct
        F.count("*").alias("n_days"))


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.percentile_approx("l_extendedprice", 0.5, 10000)
                    .alias("approx_median"),
                   F.expr("percentile(l_extendedprice, 0.5)")
                    .alias("exact_median")))


def cms_estimates(df: DataFrame, key_col: str, probe_keys: list[int],
                  eps: float = 0.001, confidence: float = 0.99,
                  seed: int = 42) -> dict[int, int]:
    """Distributed count-min sketch over `key_col`, probed for the given
    bounded key set. The sketch agg is MERGEABLE — per-partition
    sketches combine associatively inside the agg (one O(width·depth)
    blob to the driver, regardless of key cardinality or row count) —
    and over-estimates only: est >= true, est <= true + eps·N with the
    given confidence. Spark ships no SQL-side point-estimate function,
    so the bounded probe runs through the JVM sketch API driver-side."""
    blob = df.agg(F.count_min_sketch(
        key_col, F.lit(float(eps)), F.lit(float(confidence)),
        F.lit(int(seed))).alias("cms")).collect()[0].cms
    jvm = df.sparkSession._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(blob))
    return {k: sk.estimateCount(int(k)) for k in probe_keys}


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (top users by event count) with exact counts next
    to their count-min-sketch estimates — the streaming-friendly
    frequency shape (the pytest pins the never-underestimates and
    eps·N-bound properties). The candidate set here is an exact bounded
    top-k (TakeOrderedAndProject); a pure one-pass pipeline would keep
    a candidate heap beside the sketch instead."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    top = (ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
             .orderBy(F.desc("exact_n"), "user_id").limit(10).collect())
    est = cms_estimates(ev, "user_id", [r.user_id for r in top])
    return spark.createDataFrame(
        [(r.user_id, r.exact_n, est[r.user_id],
          est[r.user_id] - r.exact_n) for r in top],
        "user_id long, exact_n long, cms_n long, overestimate long")


QUERIES = {
    "approx_distinct_users": q_approx_distinct_users,    # rows-only: sketch
    "hll_mergeable_distinct": q_hll_mergeable_distinct,  # rows-only: sketch
    "approx_quantiles": q_approx_quantiles,              # rows-only: sketch
    "cms_heavy_hitters": q_cms_heavy_hitters,            # rows-only: sketch
}

ORACLE = {}
