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
    for the reader.

    One pass: repartitionByRange(order_col) gives range-partitioned
    output (partition i holds earlier times than i+1) in a SINGLE write
    job — no per-chunk filtered re-scans, no global sort, and empty
    input is a no-op instead of a crash. Part-file names carry the
    partition index, so path order == event-time order; mtimes are
    restamped in that order because the file streaming source replays
    oldest-modified first and a single write job stamps near-identical
    times."""
    (df.repartitionByRange(n_chunks, F.col(order_col))
       .write.mode("append").parquet(out_dir))
    import glob
    import os
    import time
    parts = sorted(glob.glob(os.path.join(out_dir, "part-*")))
    base = time.time() - len(parts)
    for i, p in enumerate(parts):
        os.utime(p, (base + i, base + i))
    return df.schema


def replay_dir(spark: SparkSession, path: str, schema: StructType,
               files_per_trigger: int = 1) -> DataFrame:
    """Streaming read of a replay directory, one chunk per micro-batch."""
    return (spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(path))
