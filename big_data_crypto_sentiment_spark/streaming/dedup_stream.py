"""Streaming near-duplicate dedup: foreachBatch over the on-disk
MinHash index (SURVEY T9 composed with the dedup family).

The daily-crawl shape, continuous: each micro-batch of documents is
verdicted against everything indexed so far (dup-of-indexed /
dup-of-earlier-in-batch / new) and then appended to the index so the
NEXT batch dedups against it too. Exact streaming dedup
(`dropDuplicatesWithinWatermark`, streaming/windowed.py) catches
byte-identical replays inside the watermark; this sink catches
NEAR-duplicates across the whole corpus lifetime, because its state is
the persistent index, not a bounded state store.

Delivery semantics (T9): the checkpoint gives at-least-once foreachBatch
invocations; both effects are keyed by the epoch id, so replays are
idempotent —
  * the index append commits generation ``gen_b_<epoch>`` (atomic
    rename; a replay sees it and skips — jobs/dedup_index.py),
  * verdicts overwrite ``verdict_dir/epoch=<epoch>`` (same rows on
    replay, since the index state the replayed batch sees is the same:
    its own generation is excluded from nothing it joined before —
    the batch's docs were never in the index when first verdicted, and
    on replay the batch_id-keyed read below excludes them again).

Scale: per batch the work is O(|batch|) shingling + an equality-keyed
(band, bh) join against the index parquet — the indexed corpus TEXT is
never re-read. Index growth is one generation per batch; run
``compact_index`` on a maintenance cadence to pay down the small-files
tax.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..queries.dedup import JACCARD_THRESHOLD


def dedup_verdict_batch_writer(index_dir: str, verdict_dir: str,
                               threshold: float = JACCARD_THRESHOLD):
    """The foreachBatch function: verdict against the stored index,
    write verdicts for this epoch (overwrite = replay-safe), append
    the batch's artifacts under the epoch-keyed generation (skip =
    replay-safe). Exposed separately so tests can drive replays
    deterministically."""
    from ..jobs.dedup_index import (
        _gen_dirs,
        append_artifacts,
        verdict_batch,
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        out = os.path.join(verdict_dir, f"epoch={epoch_id}")
        gen = os.path.join(index_dir, f"gen_b_{epoch_id}")
        if os.path.isdir(gen):
            # replayed epoch: its generation is already committed. Do
            # NOT re-verdict against an index that now contains the
            # batch itself (every doc would self-match); the verdicts
            # for this epoch were already written, and the overwrite
            # below happened-before the append commit, so they exist
            # unless the crash hit the tiny window between — in which
            # case recompute against the index MINUS this generation.
            # "Already written" means the commit marker exists, not the
            # bare directory: a crash mid-write (notably in THIS replay
            # branch) leaves a partial epoch dir with no _SUCCESS, and
            # skipping on isdir would freeze that corrupt output forever.
            if os.path.exists(os.path.join(out, "_SUCCESS")):
                return
            keep = [d for d in _gen_dirs(index_dir) if d != gen]
            sh = spark.read.parquet(*[os.path.join(d, "shingles")
                                      for d in keep])
            bands = spark.read.parquet(*[os.path.join(d, "bands")
                                         for d in keep])
            from ..queries.dedup import incremental_minhash_verdicts
            v = incremental_minhash_verdicts(sh, bands, batch_df,
                                             threshold)
            v.write.mode("overwrite").parquet(out)
            return
        batch_df.persist()  # consumed twice: verdict join + indexing
        try:
            v = verdict_batch(spark, index_dir, batch_df, threshold)
            v.write.mode("overwrite").parquet(out)
            append_artifacts(spark, index_dir, batch_df,
                             batch_id=epoch_id)
        finally:
            batch_df.unpersist()

    return process


def start_dedup_verdict_sink(docs_stream: DataFrame, index_dir: str,
                             verdict_dir: str, checkpoint: str,
                             threshold: float = JACCARD_THRESHOLD,
                             trigger_once: bool = True) -> StreamingQuery:
    """Stream (doc_id, text) micro-batches through the dedup index.

    The index must already exist (``build_index`` on the base corpus,
    or an empty build on a zero-doc frame for a cold start)."""
    w = (docs_stream.writeStream
         .foreachBatch(dedup_verdict_batch_writer(index_dir, verdict_dir,
                                                  threshold))
         .option("checkpointLocation", checkpoint)
         .outputMode("update"))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def main() -> int:
    """Runnable dedup stream: verdict + index a (doc_id, text) parquet
    directory against a stored MinHash index, one epoch per batch."""
    import argparse

    ap = argparse.ArgumentParser(
        description="streaming near-dup dedup over a stored MinHash index")
    ap.add_argument("--index-dir", required=True,
                    help="existing index (jobs/dedup_index.py build)")
    ap.add_argument("--src", required=True,
                    help="parquet dir to stream (doc_id, text)")
    ap.add_argument("--verdicts", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--threshold", type=float, default=JACCARD_THRESHOLD)
    ap.add_argument("--follow", action="store_true",
                    help="keep running (default: drain available input "
                         "with availableNow and exit)")
    args = ap.parse_args()
    from ..session import get_spark
    spark = get_spark("dedup-stream")
    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .parquet(args.src))
    q = start_dedup_verdict_sink(stream, args.index_dir, args.verdicts,
                                 args.checkpoint,
                                 threshold=args.threshold,
                                 trigger_once=not args.follow)
    q.awaitTermination()
    return 0
