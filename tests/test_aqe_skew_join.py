"""AQE skew-join (Spark's runtime answer to hot join keys): when one
shuffle partition of a sort-merge join dwarfs the median, AQE splits it
into advisory-sized sub-partitions and replicates the matching build
side — the final adaptive plan shows ``SortMergeJoin(skew=true)``.
SCALING.md leans on this ("salted_join splits hot keys; AQE skew-join
handles the rest"); these tests pin the mechanism the way
test_runtime_bloom.py pins runtime filtering: thresholds lowered at
fixture scale (the defaults are sized for multi-GB partitions), result
identity with the optimization off, and agreement with the explicit
salted_join operator."""

import pytest
from pyspark.sql import functions as F

from conftest import conf_gates

_GATES = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",   # force sort-merge
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


@pytest.fixture
def gated(spark):
    with conf_gates(spark, _GATES) as s:
        yield s


def _skewed_sides(spark):
    # hot key 0 carries 90% of the fact; pad widens rows so the hot
    # shuffle partition crosses the lowered 64KB threshold
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
         .otherwise(F.col("id") % 1000).alias("k"),
        F.col("id").alias("v"),
        F.concat(F.lit("pad-"), F.col("id").cast("string"),
                 F.lit("x" * 64)).alias("pad"))
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w"))
    return fact, dim


def test_aqe_splits_the_skewed_partition(gated):
    fact, dim = _skewed_sides(gated)
    j = fact.join(dim, "k").select("k", "v", "w")
    assert len(j.collect()) == 200_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan           # the split actually happened


def test_results_identical_with_skew_join_disabled(gated):
    fact, dim = _skewed_sides(gated)
    agg = (fact.join(dim, "k")
               .groupBy("k")
               .agg(F.count("*").alias("n"),
                    F.sum(F.col("v") + F.col("w")).alias("s")))
    on = sorted(tuple(r) for r in agg.collect())
    gated.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        off = sorted(tuple(r) for r in agg.collect())
    finally:
        gated.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert on == off and len(on) > 0


def test_salted_join_agrees_with_aqe_path(gated):
    from big_data_crypto_sentiment_spark.operators.salted_join import (
        salted_join,
    )
    fact, dim = _skewed_sides(gated)
    plain = sorted(tuple(r) for r in
                   fact.join(dim, "k").select("k", "v", "w").collect())
    salted = sorted(tuple(r) for r in
                    salted_join(fact, dim, "k").select("k", "v", "w")
                    .collect())
    assert plain == salted


def test_aqe_coalesces_small_shuffles(spark):
    """The other half of the AQE story (SCALING.md): a shuffle whose
    output is tiny collapses below spark.sql.shuffle.partitions — the
    final plan reads the shuffle through a coalesced AQEShuffleRead.
    No gates needed: coalescing is on at the session defaults."""
    from pyspark.sql import functions as F
    agg = (spark.range(1000)
                .groupBy((F.col("id") % 50).alias("k")).count())
    assert len(agg.collect()) == 50
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan
