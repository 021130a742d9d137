"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship windowed dual-stream join (the
reference's crypto_prices_with_tweets pipeline,
dataflow/stream_join.py:401-428 / terraform/scripts/batch_to_mongo.py:201-238,
re-expressed Spark-first) on sf0.001. ``queries()`` / ``oracle_sql()``
expose every oracle-checked operator from SURVEY.md §2 plus the
large-scale pipeline extensions (dedup / similarity / text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_crypto_sentiment_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from big_data_crypto_sentiment_spark.queries.flagship import q_flagship_windowed_join
    return q_flagship_windowed_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.all_queries()


def oracle_sql() -> dict[str, str]:
    return Q.all_oracle_sql()
