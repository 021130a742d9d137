"""Spearman rank correlation (queries/timeseries.py:spearman). The
registry query is hash-checked against DuckDB at three SFs; these pin
the rank semantics scipy-style on constructed frames."""

from big_data_crypto_sentiment_spark.queries.timeseries import spearman


def _rho(spark, pairs):
    df = spark.createDataFrame([("k", float(x), float(y)) for x, y in pairs],
                               "key string, x double, y double")
    return spearman(df, "key", "x", "y").collect()[0].spearman


def test_monotone_nonlinear_is_exactly_one(spark):
    # y = x**3 is monotone: Spearman 1.0 even though Pearson < 1
    assert _rho(spark, [(x, x ** 3) for x in range(1, 9)]) == 1.0


def test_reversed_is_minus_one(spark):
    assert _rho(spark, [(x, -x) for x in range(1, 9)]) == -1.0


def test_ties_get_average_ranks(spark):
    # x = [1,2,2,3] -> avg ranks [1, 2.5, 2.5, 4]; y = [1,2,3,4] ->
    # ranks [1..4]; Pearson on ranks = 4.5/sqrt(4.5*5) = 0.948683
    got = _rho(spark, [(1, 1), (2, 2), (2, 3), (3, 4)])
    assert abs(got - 0.948683) < 1e-6


def test_outlier_moves_pearson_not_spearman(spark):
    from pyspark.sql import functions as F
    base = [(float(x), float(x)) for x in range(1, 10)] + [(10.0, 1000.0)]
    df = spark.createDataFrame([("k", x, y) for x, y in base],
                               "key string, x double, y double")
    rho = spearman(df, "key", "x", "y").collect()[0].spearman
    pearson = df.groupBy("key").agg(F.corr("x", "y").alias("p")) \
                .collect()[0].p
    assert rho == 1.0 and pearson < 0.8
