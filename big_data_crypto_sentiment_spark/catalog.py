"""Dataset catalog over the driver's parquet testdata.

Mirrors the reference's logical datasets (SURVEY.md §1.4) onto the
TPC-H-ish tables plus `events` / `documents` / `embeddings`
(TESTDATA.md, FIXTURES.md §6). Every reader is a plain
`spark.read.parquet` so predicate pushdown / column pruning / partition
pruning stay Catalyst's job — no eager materialization, no driver-side
listing state (the reference hand-rolled incremental file state,
terraform/scripts/batch_to_mongo.py:22-57; Structured Streaming's file
source replaces that wholesale, see streaming/).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Plain parquet scan — keeps pushdown/pruning with Catalyst.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as long nanos (legacy conf, runtime-safe
    even on sessions not built by our factory) and truncate to
    microseconds — exactly what DuckDB does when it reads the same file,
    so oracle comparisons line up.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # oracle parity
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def load_events_range(spark: SparkSession, sf_dir: str,
                      start_ns: int, end_ns: int | None = None) -> DataFrame:
    """Events scan with the time bounds PUSHED to parquet row groups.

    A filter on the converted column — `timestamp_micros(ts DIV 1000)
    >= X` — is a DataFilter but never a PushedFilter: parquet stats
    can't evaluate the expression, so every row group is read. Applying
    the bounds to the RAW int64 nanos column before the conversion
    turns them into plain long comparisons the reader prunes with
    row-group min/max stats — at 100 TB the difference between scanning
    a day and scanning the archive. Bounds are epoch NANOseconds
    (the file's physical unit, so no precision games at the edge)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    df = df.filter(F.col("ts") >= F.lit(int(start_ns)))
    if end_ns is not None:
        df = df.filter(F.col("ts") < F.lit(int(end_ns)))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() queries mirror
    the DuckDB oracle's pre-registered views one-to-one."""
    for name in TABLES:
        load(spark, name, sf_dir).createOrReplaceTempView(name)
