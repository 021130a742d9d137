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

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() queries mirror
    the DuckDB oracle's pre-registered views one-to-one."""
    for name in TABLES:
        load(spark, name, sf_dir).createOrReplaceTempView(name)
