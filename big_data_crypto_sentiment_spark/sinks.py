"""Batch sinks (SURVEY.md S7/S12).

  * `write_warehouse` — the BigQuery-table analog: partitioned parquet
    (`partitionBy(date[, symbol])` reproduces the reference's BQ
    day-partitioning + symbol clustering, terraform/storage.tf:81-88),
    which is what makes partition pruning work on the read side.
  * `bulk_jsonl` — the MongoDB bulk writer analog
    (terraform/scripts/batch_to_mongo.py:262-291): `foreachPartition`,
    documents chunked CHUNK-at-a-time per partition exactly like the
    reference's 1000-doc insert_many batches, no driver involvement.

Scale notes: both sinks write from executors; `write_warehouse` keeps
Catalyst in charge of file sizing (coalesce only if the caller asks).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK = 1000  # batch_to_mongo.py:268 insert_many batch size


def write_warehouse(df: DataFrame, path: str,
                    partition_cols: tuple[str, ...] = (),
                    date_col: str | None = None,
                    mode: str = "overwrite") -> None:
    """Partitioned parquet write; pass date_col to derive a `date`
    partition column from a timestamp (BQ day-partitioning analog)."""
    cols = list(partition_cols)
    if date_col is not None:
        df = df.withColumn("date", F.to_date(F.col(date_col)))
        cols = ["date"] + cols
    w = df.write.mode(mode)
    if cols:
        w = w.partitionBy(*cols)
    w.parquet(path)


def write_bucketed(df: DataFrame, table_name: str,
                   bucket_cols: tuple[str, ...], n_buckets: int = 32,
                   sort_cols: tuple[str, ...] = (),
                   mode: str = "overwrite") -> None:
    """Bucketed (hash-clustered) table write — the co-located-join
    primitive: two tables bucketed on the same key with the same bucket
    count join with ZERO exchanges (Catalyst reuses the bucketing as
    the join distribution). This is the at-rest layout a 100 TB
    deployment uses for its hot join keys; requires saveAsTable
    (bucket metadata lives in the catalog)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bulk_jsonl(df: DataFrame, out_dir: str, chunk: int = CHUNK,
               prefix: str = "") -> None:
    """foreachPartition bulk writer: each partition writes its documents
    in `chunk`-sized groups to one JSONL file (atomic rename). Callers
    writing repeatedly into one dir pass a distinct `prefix` per run —
    rewriting the SAME prefix is idempotent (replay-safe), a new prefix
    appends."""
    os.makedirs(out_dir, exist_ok=True)
    cols = df.columns

    def write_partition(idx: int, rows) -> None:
        buf, n_chunks, opened = [], 0, None
        final = os.path.join(out_dir, f"{prefix}part-{idx:05d}.jsonl")
        tmp = final + ".tmp"

        def flush():
            nonlocal opened, n_chunks
            if not buf:
                return
            if opened is None:
                opened = open(tmp, "w")
            for r in buf:
                opened.write(json.dumps(dict(zip(cols, r)), default=str))
                opened.write("\n")
            buf.clear()
            n_chunks += 1

        for r in rows:
            buf.append(r)
            if len(buf) >= chunk:
                flush()
        flush()
        if opened is not None:
            opened.close()
            os.replace(tmp, final)

    df.rdd.mapPartitionsWithIndex(
        lambda i, it: iter([write_partition(i, it)])).count()
