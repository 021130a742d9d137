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


QUERIES = {
    "approx_distinct_users": q_approx_distinct_users,    # rows-only: sketch
    "hll_mergeable_distinct": q_hll_mergeable_distinct,  # rows-only: sketch
    "approx_quantiles": q_approx_quantiles,              # rows-only: sketch
}

ORACLE = {}
