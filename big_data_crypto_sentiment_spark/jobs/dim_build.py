"""Dimension-maintenance job: the SCD2 lifecycle composed end-to-end —
initial build, partitioned write, incremental refresh from a new event
batch, and a point-in-time fact enrichment read — the warehouse-side
sibling of the speed/batch layers (no reference twin; the reference has
no dimension management, SURVEY.md §2.3 notes no temporal joins).

Steps (each a checked operator from queries/scd.py):
  1. build   — scd2_intervals over the seed events (one exchange+sort).
  2. persist — parquet partitioned by is_current: the hot `is_current=1`
     slice is what lookup joins read (partition-pruned), history stays
     queryable.
  3. refresh — scd2_merge of an append-only batch: only affected users
     rebuild (from their compressed intervals), untouched users
     pass through; the refreshed dimension atomically replaces the old
     via write-to-new-dir (the compact_parquet swap discipline).
  4. enrich  — scd2_lookup joins facts to the state valid at their
     timestamp (as-of tag-union, no range join).

Run: python -m big_data_crypto_sentiment_spark.jobs.dim_build \
       --sf-dir /root/testdata/sf0.001 --out-dir /tmp/dim
"""

from __future__ import annotations

import argparse
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.scd import DIM_TYPES, FACT_TYPE, scd2_intervals, scd2_lookup, scd2_merge


def _dim_events(events: DataFrame) -> DataFrame:
    return (events
            .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()
                    & F.col("event_type").isNotNull())
            .select("user_id", "ts", "event_id", "event_type"))


def build_dimension(events: DataFrame) -> DataFrame:
    return scd2_intervals(_dim_events(events)
                          .filter(F.col("event_type").isin(*DIM_TYPES)),
                          "user_id", "event_type", "ts", "event_id")


def write_dimension(dim: DataFrame, path: str) -> None:
    """Partitioned by is_current so current-state lookups prune to the
    hot partition."""
    dim.write.mode("overwrite").partitionBy("is_current").parquet(path)


def read_current(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).filter(F.col("is_current") == 1)


def refresh_dimension(spark: SparkSession, path: str,
                      new_events: DataFrame, out_path: str) -> DataFrame:
    """Incremental SCD2 refresh: merge the batch into the stored
    dimension and write the result to out_path (write-new-then-swap is
    the caller's atomicity discipline, as in sinks.compact_parquet)."""
    dim = spark.read.parquet(path)
    merged = scd2_merge(dim,
                        _dim_events(new_events)
                        .filter(F.col("event_type").isin(*DIM_TYPES)),
                        "user_id", "event_type", "ts", "event_id")
    write_dimension(merged, out_path)
    return merged


def enrich_facts(events: DataFrame, dim: DataFrame) -> DataFrame:
    facts = (_dim_events(events)
             .filter(F.col("event_type") == FACT_TYPE)
             .select("event_id", "user_id", "ts"))
    return scd2_lookup(facts, dim)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--split", default="2024-01-15",
                    help="seed/batch boundary (events before build the "
                         "seed dimension; the rest arrive as the batch)")
    args = ap.parse_args()
    from ..catalog import load
    from ..session import get_spark
    spark = get_spark()
    events = load(spark, "events", args.sf_dir)
    cut = F.lit(args.split).cast("timestamp")
    seed_path = f"{args.out_dir}/dim_v1"
    new_path = f"{args.out_dir}/dim_v2"
    write_dimension(build_dimension(events.filter(F.col("ts") < cut)),
                    seed_path)
    merged = refresh_dimension(spark, seed_path,
                               events.filter(F.col("ts") >= cut), new_path)
    enriched = enrich_facts(events, merged)
    print(f"dimension rows: {merged.count()}, "
          f"enriched facts: {enriched.count()}, "
          f"current states: {read_current(spark, new_path).count()}")


if __name__ == "__main__":
    main()


def recover_current(dim_dir: str) -> None:
    """Heal the swap crash window: if `current` is missing, the
    previous snapshot still exists intact as the newest `_old_<batch>`
    (it was renamed aside BEFORE `current` was removed) — restore it.
    If `current` exists, prune leftover `_old_*` from a crash after
    publish but before cleanup (they would block the next swap's
    rename). `_next_*` leftovers need no handling: a partial one is
    overwritten by the replayed batch's mode("overwrite") write."""
    cur = f"{dim_dir}/current"
    olds = sorted((d for d in os.listdir(dim_dir)
                   if d.startswith("_old_")),
                  key=lambda d: int(d.rsplit("_", 1)[1]))
    if os.path.isdir(cur):
        for d in olds:
            shutil.rmtree(f"{dim_dir}/{d}")
    elif olds:
        os.rename(f"{dim_dir}/{olds[-1]}", cur)
        for d in olds[:-1]:
            shutil.rmtree(f"{dim_dir}/{d}")


def start_dim_maintenance(spark: SparkSession, stream: DataFrame,
                          dim_dir: str, checkpoint: str):
    """Streaming SCD2 maintenance: every micro-batch merges into the
    stored dimension with scd2_merge (affected users only) and swaps
    the published version atomically (write to _next, rename). The
    streaming half of the batch refresh above — state lives in the
    dimension itself, so the query carries no Spark state store; the
    checkpoint's source offsets make redelivered batches re-merge
    idempotently (a replayed batch's users rebuild to the same
    intervals — scd2_merge is idempotent for already-absorbed events
    because consecutive-duplicate compression drops them).

    `stream`: the raw events stream (event_id, ts, user_id,
    event_type, ...). Dimension versions are directories under
    dim_dir: `current` is always a complete published snapshot.

    Swap discipline (crash-safe): the old snapshot is renamed ASIDE
    (`_old_<batch>`) before the new one is renamed into place, so at
    every instant a complete snapshot exists under either `current` or
    `_old_*` — never a window with neither. recover_current() restores
    the newest `_old_*` if a crash landed between the two renames, and
    prunes leftover `_old_*` once `current` exists; merge idempotence +
    checkpoint offsets make the replayed batch converge."""
    cur = f"{dim_dir}/current"
    recover_current(dim_dir)
    if not os.path.isdir(cur):
        raise ValueError(f"seed dimension missing at {cur} — "
                         "write_dimension(build_dimension(seed), path) first")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        recover_current(dim_dir)  # heal any prior-run crash window
        batch = (_dim_events(batch_df)
                 .filter(F.col("event_type").isin(*DIM_TYPES)))
        nxt = f"{dim_dir}/_next_{batch_id}"
        merged = scd2_merge(spark.read.parquet(cur), batch,
                            "user_id", "event_type", "ts", "event_id")
        merged.write.mode("overwrite").partitionBy("is_current").parquet(nxt)
        old = f"{dim_dir}/_old_{batch_id}"
        os.rename(cur, old)   # complete snapshot preserved aside
        os.rename(nxt, cur)   # publish (single atomic rename)
        shutil.rmtree(old)

    return (stream.writeStream.foreachBatch(apply_batch)
                  .option("checkpointLocation", checkpoint)
                  .start())
