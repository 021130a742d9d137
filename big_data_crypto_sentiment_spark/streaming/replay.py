"""File-source replay (SURVEY.md S1/S2/S4/S15 analog).

The reference's unbounded inputs are Pub/Sub topics; its batch layer
hand-rolls incremental file listing with a processed-names JSON state
(terraform/scripts/batch_to_mongo.py:22-57,315-357). Structured
Streaming's file source replaces both for the rebuild: a directory of
chunk files is an arriving stream (`maxFilesPerTrigger=1` replays one
chunk per micro-batch), and exactly-once file tracking lives in the
checkpoint — zero custom state code.

Scale notes: the file source lists incrementally and tracks seen files
in the checkpoint log; chunk files written in event-time order give the
replay the arrival order the reference's simulators produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_replay_chunks(df: DataFrame, out_dir: str, n_chunks: int,
                        order_col: str = "event_time") -> StructType:
    """Split a batch DataFrame into n_chunks files by event-time range so
    a file-source replay sees time-ordered arrivals. Returns the schema
    for the reader. Chunk boundaries come from one percentile_approx
    aggregate (range partitioning by quantile cut points) — no global
    window/sort anywhere, so this holds at any input size; ties at a
    boundary merely make chunks slightly uneven."""
    fracs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = (df.select(F.percentile_approx(order_col, fracs, 10_000)
                        .alias("b")).first().b
              if n_chunks > 1 else [])
    chunk = F.lit(1)
    for b in bounds:
        chunk = chunk + (F.col(order_col) > F.lit(b)).cast("int")
    chunked = df.withColumn("_chunk", chunk)
    for i in range(1, n_chunks + 1):
        (chunked.filter(F.col("_chunk") == i).drop("_chunk")
                .coalesce(1)
                .write.mode("append").parquet(out_dir))
    return df.schema


def replay_dir(spark: SparkSession, path: str, schema: StructType,
               files_per_trigger: int = 1) -> DataFrame:
    """Streaming read of a replay directory, one chunk per micro-batch."""
    return (spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(path))
