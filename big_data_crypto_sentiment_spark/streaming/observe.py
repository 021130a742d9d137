"""Streaming observability: turn a running query's progress history
into a queryable DataFrame, and attach named row-level metrics to any
(batch or streaming) DataFrame with Spark's `observe` API — the
monitoring surface an operations team reads next to the DQ audit trail
(streaming/sinks.py:start_dq_monitor).

  * progress_frame — parse StreamingQuery.recentProgress (the last ~100
    micro-batch reports) into rows of (batch_id, input rows, rates,
    event-time watermark, state rows): the throughput/lag dashboard
    feed. Driver-side by nature (progress lives on the driver) and
    bounded (Spark caps retained progress reports).
  * observed — wrap df.observe(name, exprs): metrics are computed BY
    THE RUNNING JOB at no extra pass (they piggyback on the action),
    and surface per micro-batch in each progress report's
    `observedMetrics` — unlike a separate count() which re-runs the
    plan. The listener-free way to read them is progress_frame.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, *metrics: Column) -> DataFrame:
    """Attach named aggregate metrics computed inline with the job
    (no second pass); read them from progress_frame's observed column
    (streaming) or Observation (batch)."""
    return df.observe(name, *metrics)


def progress_frame(spark: SparkSession, query) -> DataFrame:
    """(batch_id, num_input_rows, input_rps, process_rps, watermark,
    state_rows, observed) — one row per retained micro-batch report."""
    reports = []
    for p in query.recentProgress:
        j = getattr(p, "json", None)
        if j is not None:  # StreamingQueryProgress object
            reports.append(j if isinstance(j, str) else j())
        else:  # plain dict (older API); default=str for timestamps
            reports.append(json.dumps(p, default=str))
    raw = spark.createDataFrame([(r,) for r in reports], "j string")
    g = lambda p, t: F.get_json_object("j", p).cast(t)  # noqa: E731
    return raw.select(
        g("$.batchId", "long").alias("batch_id"),
        g("$.numInputRows", "long").alias("num_input_rows"),
        g("$.inputRowsPerSecond", "double").alias("input_rps"),
        g("$.processedRowsPerSecond", "double").alias("process_rps"),
        g("$.eventTime.watermark", "string").alias("watermark"),
        g("$.stateOperators[0].numRowsTotal", "long").alias("state_rows"),
        F.get_json_object("j", "$.observedMetrics").alias("observed"),
    )
