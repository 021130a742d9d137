"""Shared helpers for oracle-checked queries."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Plain parquet scan — keeps pushdown/pruning with Catalyst.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as long nanos (legacy conf, runtime-safe)
    and truncate to microseconds — exactly what DuckDB does when it reads
    the same file, so oracle comparisons line up.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # oracle parity, driver-session safe
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def dsum(col: str | Column, scale: int = 6) -> Column:
    """Order-independent double sum: exact decimal sum, cast back to double.

    Spark and DuckDB then produce bit-identical doubles regardless of
    partitioning/aggregation order (plain double sums differ in final ulps
    between engines, which breaks the driver's value-hash)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 6) -> Column:
    """Order-independent double mean: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(27,{scale})")).cast("double")
            / F.count(c)).alias("avg")


def sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return (f"(CAST(SUM(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"
            f" / COUNT({expr}))")
