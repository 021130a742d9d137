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
invocations; both effects are keyed by (run id, epoch id), so replays
are idempotent —
  * the index append commits generation ``gen_b_<run>-<epoch>`` (atomic
    rename; a replay sees the committed generation OR — if a compact
    has already folded it — its tombstone, jobs/_genstore.py; the r10
    review finding: without the tombstone a post-fold replay looked
    like a first pass and every replayed doc self-matched),
  * verdicts overwrite ``verdict_dir/epoch=<run>-<epoch>`` (same rows
    on replay: the replayed batch's own doc_ids are excluded from the
    index view BY ID, which survives the fold, and the ``_SUCCESS``
    marker — not bare directory existence — gates the skip so a crash
    mid-write is repaired).

The run id is a random token stored IN the checkpoint directory
(jobs/_genstore.py:run_id_for_checkpoint), binding the generation keys
to the checkpoint INSTANCE whose epoch counter names them: a NEW
checkpoint against an index that already holds ``gen_b_0`` from an old
stream must not mistake its own fresh epoch 0 for a replay (r10 review
finding — bare epoch keys silently dropped every batch in that setup),
and — the r11 refinement — deleting and recreating the checkpoint at
the SAME path (a standard stream reset) destroys the token with it, so
the reset run can't collide with the old run's generations either.
doc_ids are assumed unique across batches (they are ids).

Scale: per batch the work is O(|batch|) shingling + an equality-keyed
(band, bh) join against the index parquet — the indexed corpus TEXT is
never re-read. Index growth is one generation per batch; run
``compact_index`` on a maintenance cadence (not concurrently with
ingest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..jobs._genstore import run_id_for_checkpoint as _run_id_for
from ..queries.dedup import JACCARD_THRESHOLD


def dedup_verdict_batch_writer(index_dir: str, verdict_dir: str,
                               threshold: float = JACCARD_THRESHOLD,
                               run_id: str | None = None):
    """The foreachBatch function: verdict against the stored index,
    write verdicts for this epoch (overwrite = replay-safe), append
    the batch's artifacts under the epoch-keyed generation (skip =
    replay-safe). Exposed separately so tests can drive replays
    deterministically. run_id=None keeps bare-epoch keys (direct/test
    drivers); the streaming sink always passes one."""
    from ..jobs._genstore import epoch_done
    from ..jobs.dedup_index import (
        _gen_dirs,
        append_artifacts,
        verdict_batch,
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_id = (f"{run_id}-{epoch_id}" if run_id is not None
                    else epoch_id)
        gen_base = f"gen_b_{batch_id}"
        gen = os.path.join(index_dir, gen_base)
        out = os.path.join(verdict_dir, f"epoch={batch_id}")
        if epoch_done(index_dir, gen_base):
            # replayed epoch: its artifacts are already in the index
            # (as the committed generation, or folded into a compacted
            # one — the tombstone remembers). Do NOT re-verdict against
            # an index view containing the batch itself (every doc
            # would self-match); the verdicts were already written, and
            # the overwrite below happened-before the append commit, so
            # they exist unless the crash hit the tiny window between —
            # in which case recompute against the index MINUS the
            # batch's own doc_ids. "Already written" means the commit
            # marker exists, not the bare directory: a crash mid-write
            # (notably in THIS replay branch) leaves a partial epoch
            # dir with no _SUCCESS, and skipping on isdir would freeze
            # that corrupt output forever.
            if os.path.exists(os.path.join(out, "_SUCCESS")):
                return
            # consumed three times (two left_anti id joins + the
            # verdict join) — persist like the first-pass branch does,
            # or the streamed batch source is recomputed per action
            # (r10 ADVICE)
            batch_df.persist()
            try:
                keep = [d for d in _gen_dirs(index_dir) if d != gen]
                ids = batch_df.select("doc_id")
                sh = spark.read.parquet(*[os.path.join(d, "shingles")
                                          for d in keep]) \
                    .join(ids, "doc_id", "left_anti")
                bands = spark.read.parquet(*[os.path.join(d, "bands")
                                             for d in keep]) \
                    .join(ids, "doc_id", "left_anti")
                from ..queries.dedup import incremental_minhash_verdicts
                v = incremental_minhash_verdicts(sh, bands, batch_df,
                                                 threshold)
                v.write.mode("overwrite").parquet(out)
            finally:
                batch_df.unpersist()
            return
        batch_df.persist()  # consumed twice: verdict join + indexing
        try:
            v = verdict_batch(spark, index_dir, batch_df, threshold)
            v.write.mode("overwrite").parquet(out)
            append_artifacts(spark, index_dir, batch_df,
                             batch_id=batch_id)
        finally:
            batch_df.unpersist()

    return process


def start_dedup_verdict_sink(docs_stream: DataFrame, index_dir: str,
                             verdict_dir: str, checkpoint: str,
                             threshold: float = JACCARD_THRESHOLD,
                             trigger_once: bool = True) -> StreamingQuery:
    """Stream (doc_id, text) micro-batches through the dedup index.

    The index must already exist (``build_index`` on the base corpus,
    or an empty build on a zero-doc frame for a cold start). Generation
    keys are bound to THIS checkpoint's epoch counter via the derived
    run id."""
    w = (docs_stream.writeStream
         .foreachBatch(dedup_verdict_batch_writer(
             index_dir, verdict_dir, threshold,
             run_id=_run_id_for(checkpoint)))
         .option("checkpointLocation", checkpoint)
         .outputMode("update"))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def main() -> int:
    """Runnable dedup stream: verdict + index a (doc_id, text) parquet
    directory against a stored MinHash index, one epoch per batch.
    Keep --checkpoint paired with --index-dir across runs: the
    checkpoint's epoch counter keys the idempotent appends."""
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
