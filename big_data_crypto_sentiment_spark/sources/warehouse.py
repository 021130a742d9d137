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


def read_evolved(spark: SparkSession, path: str,
                 required: dict[str, str] | None = None) -> DataFrame:
    """Read a parquet directory whose files were written under DIFFERENT
    schema versions (columns added over time) into one unified frame —
    the schema-evolution reality of any long-lived warehouse directory.

    ``mergeSchema`` unions the per-file schemas (absent columns become
    NULL for old files); ``required`` then pins {column: type} so
    downstream code sees a stable contract even if TODAY's directory
    happens to contain only old files — missing columns are
    materialized as typed NULLs, present ones are cast.

    Scale note: schema merging reads FOOTERS of every file (a driver/
    job-side metadata pass, not a data scan); at 100 TB you'd pin the
    unified schema explicitly (the `required` path) and skip the merge
    — both forms are exercised in tests."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    from pyspark.sql import functions as F
    for col, typ in (required or {}).items():
        if col in df.columns:
            df = df.withColumn(col, F.col(col).cast(typ))
        else:
            df = df.withColumn(col, F.lit(None).cast(typ))
    return df
