"""Salted join must be row-for-row identical to the plain join, while
actually splitting hot keys across salt partitions."""

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.operators.salted_join import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one hot key — the salting target
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
         .otherwise((F.col("id") % 50) + 2).alias("k"),
        F.col("id").alias("v"))
    dim = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(1, 60)], ["k", "name"])
    return fact, dim


def test_salted_equals_plain_inner(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, "k").select("k", "v", "name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_equals_plain_left(skewed):
    fact, dim = skewed
    # drop some dim keys so the left join has real null rows
    dim2 = dim.filter(F.col("k") % 3 != 0)
    plain = fact.join(dim2, "k", "left").select("k", "v", "name")
    salted = salted_join(fact, dim2, "k", how="left").select("k", "v", "name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salt_actually_splits_hot_key(spark, skewed):
    fact, _ = skewed
    n_salts = 8
    salts = (fact.filter(F.col("k") == 1)
             .select(F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                            F.lit(n_salts)).cast("int").alias("s"))
             .groupBy("s").count().collect())
    assert len(salts) == n_salts  # hot key spread over every salt
    counts = [r["count"] for r in salts]
    assert max(counts) < 2 * min(counts)  # roughly uniform
