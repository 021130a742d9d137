"""SparkSession factory.

The reference pins UTC everywhere (terraform/scripts/batch_to_mongo.py:118,
analytical_module/arima.py:424) and runs Spark 3.5 local mode on a VM
(terraform/vm.tf:88). We pin UTC, enable Arrow for every pandas exchange,
and enable AQE so shuffle partition counts / skew joins are re-planned at
runtime — the knobs that matter when the same plan runs on a 1000-executor
cluster instead of local[32].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")


def _default_driver_mem() -> str:
    """~60% of physical RAM, floored at 2g and capped at 32g (the
    measured sweet spot for the long-session bench). Falls back to 8g
    when physical memory can't be detected."""
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        return "8g"
    gb = max(2, min(32, int(total * 0.6 / (1 << 30))))
    return f"{gb}g"


def get_spark(app_name: str = "big-data-crypto-sentiment-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session with scale-aware defaults.

    All settings are safe on a real cluster: AQE coalesces the static
    shuffle-partition number down at small scale and splits skewed
    partitions at large scale, so the same code is correct at sf0.001
    and at 100 TB.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet timestamps read as plain TIMESTAMP (UTC session), not
        # NTZ — literals compare/push down without coercion and schemas
        # match DuckDB's view of the same files (catalog._ts_confs)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # older testdata stored TIMESTAMP(NANOS); read as long + truncate
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.files.maxPartitionBytes", "128MB")
        # local-mode driver == the whole executor JVM: a long session
        # (the 150-query bench) accumulates caches/broadcasts/codegen
        # classes, and an 8g heap turns the tail of the run GC-bound
        # (measured: the LAST bench entry inflated 7x at 8g, back to
        # its solo time at 32g). -Xmx is lazily committed, but a heap
        # bigger than the box invites the OS OOM-killer instead of
        # graceful GC pressure, so the default clamps to ~60% of
        # detected physical RAM (floor 2g, cap 32g); override with
        # SPARK_GRAFT_DRIVER_MEM. On a real cluster executors get
        # their own spark.executor.memory; this only sizes the driver.
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                               _default_driver_mem()))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
