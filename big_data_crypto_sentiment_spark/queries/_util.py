"""Shared helpers for oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Catalog read with (sf_dir-last) argument order queries find handy."""
    from ..catalog import load
    return load(spark, name, sf_dir)


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
