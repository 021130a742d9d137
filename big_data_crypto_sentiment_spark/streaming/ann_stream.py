"""Streaming vector ingest into the on-disk IVF index: foreachBatch
over jobs/ann_index.py (SURVEY T9 composed with the ANN family — the
embedding twin of streaming/dedup_stream.py).

Each micro-batch of (vec_id, embedding) rows is assigned to the FROZEN
centroids map-side and appended as generation ``gen_b_<run>-<epoch>``;
the next query over the stored index sees it immediately. Optionally
each epoch also writes its own top-k verdicts against everything
indexed BEFORE the batch (the "is this vector near something we
already have" check an ingest pipeline runs before admitting a
vector) — the stream-side analog of dedup_stream's verdict output.

Delivery semantics (T9): the checkpoint gives at-least-once foreachBatch
invocations; both effects are keyed by (run id, epoch id), so replays
are idempotent —
  * the append commits its generation by atomic rename; a replay sees
    the committed generation OR, if maintenance has already folded it
    into the full generation, its tombstone (jobs/_genstore.py) — the
    r10 review finding: without the tombstone a post-fold replay looked
    like a first pass and re-verdicted against an index that already
    contained the batch;
  * verdicts overwrite ``verdict_dir/epoch=<run>-<epoch>``, gated on
    the ``_SUCCESS`` marker (not bare directory existence — the
    dedup_stream r9 lesson), and a replayed epoch excludes the batch's
    own vec_ids from the probe (by id, not by path, so the exclusion
    survives a fold) so self-matches can't appear.

The run id is a random token stored IN the checkpoint directory
(jobs/_genstore.py:run_id_for_checkpoint), binding the generation keys
to the checkpoint INSTANCE whose epoch counter names them: a NEW
checkpoint against an index that already holds ``gen_b_0`` from an old
stream must not mistake its own fresh epoch 0 for a replay (r10 review
finding — bare epoch keys silently dropped every batch in that setup),
and — the r11 refinement — deleting and recreating the checkpoint at
the SAME path (a standard stream reset) destroys the token with it, so
the reset run can't collide with the old run's generations either.
vec_ids are assumed unique across batches (they are ids).

Maintenance cadence (r11, from review): a replay repair recomputes
verdicts against the CURRENT centroids, so a compact/retrain between
the original epoch and its repair would change the repaired verdicts.
Operationally: REPAIR PENDING EPOCHS BEFORE RUNNING MAINTENANCE (one
availableNow drain, which replays any _SUCCESS-less epoch, then
compact/retrain). Each verdict epoch also records the centroid
generation it was computed under (``_CENTROID_GEN`` marker) so an
auditor can detect a cross-maintenance repair after the fact.

Scale: per batch the work is O(|batch|) centroid assignment (the
centroid table is a broadcast closure constant) + one parquet append;
the indexed corpus is only read by the optional verdict join, which
probes n_probe cells per query vector — never a full scan. Run
``compact_index`` / ``retrain_index`` on a maintenance cadence (not
concurrently with ingest — see jobs/ann_index.py's docstring).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..jobs._genstore import run_id_for_checkpoint as _run_id_for

VERDICT_K = 3
CENTROID_GEN_MARKER = "_CENTROID_GEN"


def ann_ingest_batch_writer(index_dir: str,
                            verdict_dir: str | None = None,
                            k: int = VERDICT_K,
                            run_id: str | None = None):
    """The foreachBatch function. Exposed separately so tests can drive
    replays deterministically (the dedup_stream pattern). run_id=None
    keeps bare-epoch keys (direct/test drivers); the streaming sink
    always passes one."""
    from ..jobs.ann_index import (
        _live_gens,
        append_vectors,
        epoch_done,
        ivf_topk_assigned,
        load_centroids,
        read_assignments_dedup,
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_id = (f"{run_id}-{epoch_id}" if run_id is not None
                    else epoch_id)
        gen_base = f"gen_b_{batch_id}"
        gen = os.path.join(index_dir, gen_base)
        replay = epoch_done(index_dir, gen_base)
        out = (os.path.join(verdict_dir, f"epoch={batch_id}")
               if verdict_dir else None)
        if replay and (out is None
                       or os.path.exists(os.path.join(out, "_SUCCESS"))):
            return
        batch_df.persist()  # verdict probe + append both consume it
        try:
            if out is not None:
                # verdict against the index as it stood BEFORE this
                # batch: on the first pass the batch simply isn't
                # appended yet; on a replay its own rows are excluded
                # BY ID (the generation may already be folded away).
                # The dedup pick is deterministic (full generation
                # wins — jobs/ann_index.py:read_assignments_dedup).
                full, _ = _live_gens(index_dir)
                centroids = load_centroids(spark, index_dir)
                from pyspark.sql import functions as F
                queries = batch_df.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qe"))
                assignments = read_assignments_dedup(
                    spark, index_dir, exclude=(gen,))
                if replay:
                    assignments = assignments.join(
                        batch_df.select("vec_id"), "vec_id", "left_anti")
                v = ivf_topk_assigned(queries, assignments,
                                      centroids, k)
                v.write.mode("overwrite").parquet(out)
                # record the centroid generation these verdicts were
                # computed under, so a replay repaired AFTER a
                # compact/retrain (different centroids than the
                # original pass) is detectable post-hoc (r10 ADVICE).
                # Written after the parquet commit: at worst a crash
                # here leaves a _SUCCESS'd epoch without the marker,
                # which reads as "provenance unknown", never as a
                # wrong provenance.
                with open(os.path.join(out, CENTROID_GEN_MARKER),
                          "w") as fh:
                    fh.write(os.path.basename(full))
            if not replay:
                append_vectors(spark, index_dir, batch_df,
                               batch_id=batch_id)
        finally:
            batch_df.unpersist()

    return process


def start_ann_ingest_sink(vec_stream: DataFrame, index_dir: str,
                          checkpoint: str,
                          verdict_dir: str | None = None,
                          k: int = VERDICT_K,
                          trigger_once: bool = True) -> StreamingQuery:
    """Stream (vec_id, embedding) micro-batches into the stored IVF
    index. The index must already exist (``build_index`` on the base
    corpus). Generation keys are bound to THIS checkpoint's epoch
    counter via the derived run id."""
    w = (vec_stream.writeStream
         .foreachBatch(ann_ingest_batch_writer(
             index_dir, verdict_dir, k,
             run_id=_run_id_for(checkpoint)))
         .option("checkpointLocation", checkpoint)
         .outputMode("update"))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def main() -> int:
    """Runnable ingest: stream a (vec_id, embedding) parquet directory
    into a stored index, one committed generation per micro-batch.
    Keep --checkpoint paired with --index-dir across runs: the
    checkpoint's epoch counter keys the idempotent appends."""
    import argparse

    ap = argparse.ArgumentParser(
        description="streaming vector ingest into a stored IVF index")
    ap.add_argument("--index-dir", required=True,
                    help="existing index (jobs/ann_index.py build)")
    ap.add_argument("--src", required=True,
                    help="parquet dir to stream (vec_id, embedding)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--verdicts",
                    help="optional per-epoch pre-admission top-k output")
    ap.add_argument("--k", type=int, default=VERDICT_K)
    ap.add_argument("--follow", action="store_true",
                    help="keep running (default: drain available input "
                         "with availableNow and exit)")
    args = ap.parse_args()
    from ..session import get_spark
    spark = get_spark("ann-ingest")
    stream = (spark.readStream
              .schema("vec_id bigint, embedding array<float>")
              .parquet(args.src))
    q = start_ann_ingest_sink(stream, args.index_dir, args.checkpoint,
                              verdict_dir=args.verdicts, k=args.k,
                              trigger_once=not args.follow)
    q.awaitTermination()
    return 0
