"""Warehouse source with fallback (SURVEY.md S5/S9).

The reference reads Avro batch captures (`spark.read.format("avro")`,
terraform/scripts/batch_to_mongo.py:364) and has a BigQuery-connector
source that falls back to a client read on failure (arima.py:430-469).
This build has no spark-avro jar available, so the Avro path is gated:
`read_warehouse` tries the requested format and falls back to parquet —
same shape as the reference's connector-with-fallback. When the Avro
jar IS on the classpath the avro branch works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def read_warehouse(spark: SparkSession, path: str,
                   fmt: str = "avro",
                   fallback_path: str | None = None) -> DataFrame:
    """Try `fmt` (e.g. avro); on a missing-datasource error fall back to
    parquet at `fallback_path` (or `path`). Raises NotImplementedError
    with a clear message if neither path is readable."""
    try:
        return spark.read.format(fmt).load(path)
    except AnalysisException:
        try:
            return spark.read.parquet(fallback_path or path)
        except AnalysisException as ex:
            raise NotImplementedError(
                f"format {fmt!r} unavailable (no spark-{fmt} jar) and no "
                f"parquet fallback at {fallback_path or path!r}") from ex
