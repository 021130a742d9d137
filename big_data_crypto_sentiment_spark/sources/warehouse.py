"""Warehouse source with fallback (SURVEY.md S5/S9).

The reference reads Avro batch captures (`spark.read.format("avro")`,
terraform/scripts/batch_to_mongo.py:364) and has a BigQuery-connector
source that falls back to a client read on failure (arima.py:430-469).
`read_warehouse` keeps that connector-with-fallback shape with THREE
tiers: the native DataSource if a spark-avro jar is on the classpath,
then the repo's pure-Python Avro container reader (avro_io.read_avro —
distributed binaryFile + mapInPandas decode of the public OCF format),
then parquet fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def read_warehouse(spark: SparkSession, path: str,
                   fmt: str = "avro",
                   fallback_path: str | None = None) -> DataFrame:
    """Try the native `fmt` DataSource; for avro, fall back to the
    pure-Python container reader; finally fall back to parquet at
    `fallback_path` (or `path`). Raises NotImplementedError with a
    clear message if nothing is readable."""
    try:
        return spark.read.format(fmt).load(path)
    except AnalysisException:
        pass
    if fmt == "avro":
        from .avro_io import read_avro
        try:
            return read_avro(spark, path)
        except (AnalysisException, ValueError):
            # path missing, or files aren't avro containers → next tier
            pass
    try:
        return spark.read.parquet(fallback_path or path)
    except AnalysisException as ex:
        raise NotImplementedError(
            f"format {fmt!r} unavailable (no spark-{fmt} jar) and no "
            f"parquet fallback at {fallback_path or path!r}") from ex
