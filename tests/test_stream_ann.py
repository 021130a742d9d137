"""Streaming vector ingest into the stored IVF index
(streaming/ann_stream.py): micro-batched appends must equal the batch
lifecycle over the same vectors, survive a kill/restart on the same
checkpoint, and stay idempotent under foreachBatch replays — the
embedding twin of test_stream_neardup.py. Also covers retrain_index
(jobs/ann_index.py): re-centering folds appends in, queries stay
consistent, and both crash windows (commit-without-pointer,
pointer-without-cleanup) resolve deterministically."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.jobs.ann_index import (
    _gen_dirs,
    append_vectors,
    build_index,
    index_stats,
    load_centroids,
    query_index,
    retrain_index,
)
from big_data_crypto_sentiment_spark.queries.similarity import ivf_topk
from big_data_crypto_sentiment_spark.streaming.ann_stream import (
    ann_ingest_batch_writer,
    start_ann_ingest_sink,
)

SF = "/root/testdata/sf0.001"
VEC_SCHEMA = "vec_id bigint, embedding array<float>"
K = 5


def _corpus(spark):
    from big_data_crypto_sentiment_spark.catalog import load
    return load(spark, "embeddings", SF).select("vec_id", "embedding")


def _queries(spark):
    return (_corpus(spark).filter(F.col("vec_id") < 4)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qe")))


def _ranked(df):
    return sorted((r.query_id, r.rank, r.vec_id, round(r.cos, 9))
                  for r in df.collect())


@pytest.fixture()
def split(spark):
    c = _corpus(spark)
    base = c.filter(F.col("vec_id") < 300)
    b1 = c.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    b2 = c.filter(F.col("vec_id") >= 400)
    return base, b1, b2


def _drop(spark, src, df):
    df.selectExpr("vec_id", "cast(embedding as array<float>) embedding") \
      .coalesce(1).write.mode("append").parquet(src)


def test_streamed_ingest_matches_batch_lifecycle_across_restart(
        spark, split, tmp_path):
    base, b1, b2 = split
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    idx = str(tmp_path / "index")
    build_index(spark, base, idx, k=8, seed=42)

    def start():
        stream = (spark.readStream.schema(VEC_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return start_ann_ingest_sink(stream, idx, ck,
                                     trigger_once=False)

    _drop(spark, src, b1)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()                       # "crash" between batches

    _drop(spark, src, b2)
    q = start()                        # same checkpoint: resumes
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    s = index_stats(spark, idx)
    assert s["vectors"] == 500 and s["rows"] == 500
    # stored-index query == one-shot in-memory operator over the full
    # corpus with the stream index's (frozen) centroids
    centroids = load_centroids(spark, idx)
    got = _ranked(query_index(spark, idx, _queries(spark), K))
    want = _ranked(ivf_topk(_queries(spark), _corpus(spark),
                            centroids, K))
    assert got == want

    # batch-lifecycle twin: same base + same appends
    idx2 = str(tmp_path / "index2")
    build_index(spark, base, idx2, k=8, seed=42)
    append_vectors(spark, idx2, b1, batch_id="a")
    append_vectors(spark, idx2, b2, batch_id="b")
    s2 = index_stats(spark, idx2)
    assert (s2["vectors"], s2["rows"]) == (500, 500)
    assert got == _ranked(query_index(spark, idx2, _queries(spark), K))


def test_replayed_epoch_is_idempotent_and_repairs_partial_verdicts(
        spark, split, tmp_path):
    base, b1, _ = split
    idx, vdir = str(tmp_path / "index"), str(tmp_path / "verdicts")
    build_index(spark, base, idx, k=8, seed=42)
    process = ann_ingest_batch_writer(idx, vdir, k=2)

    process(b1, 0)
    s1 = index_stats(spark, idx)
    out = os.path.join(vdir, "epoch=0")
    v1 = _ranked_verdicts(spark, out)
    # verdicts probe the PRE-batch index only: no self-matches
    assert all(vid < 300 for (_, _, vid) in v1)

    process(b1, 0)                     # plain replay: both effects skip
    assert index_stats(spark, idx) == s1
    assert _ranked_verdicts(spark, out) == v1

    # partial verdict write (no _SUCCESS): replay must repair, not
    # skip, and must NOT re-append (its generation is committed)
    os.remove(os.path.join(out, "_SUCCESS"))
    process(b1, 0)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert _ranked_verdicts(spark, out) == v1
    assert index_stats(spark, idx) == s1


def _ranked_verdicts(spark, out):
    return sorted((r.query_id, r.rank, r.vec_id)
                  for r in spark.read.parquet(out).collect())


def test_retrain_folds_appends_and_queries_stay_consistent(
        spark, split, tmp_path):
    base, b1, b2 = split
    idx = str(tmp_path / "index")
    build_index(spark, base, idx, k=8, seed=42)
    append_vectors(spark, idx, b1, batch_id=1)
    append_vectors(spark, idx, b1, batch_id=None)   # un-keyed dup rows
    append_vectors(spark, idx, b2, batch_id=2)
    assert index_stats(spark, idx)["rows"] == 600   # 100 dup rows

    out = retrain_index(spark, idx, seed=7)
    assert out == {"generations": 1, "clusters": 8}
    s = index_stats(spark, idx)
    assert s == {"generations": 1, "rows": 500, "vectors": 500,
                 "clusters_used": s["clusters_used"]}
    # post-retrain query == fresh in-memory operator with the NEW
    # centroids over the full corpus
    centroids = load_centroids(spark, idx)
    got = _ranked(query_index(spark, idx, _queries(spark), K))
    want = _ranked(ivf_topk(_queries(spark), _corpus(spark),
                            centroids, K))
    assert got == want
    # appends keep working after a retrain (fresh batch ids)
    assert append_vectors(spark, idx, b2.limit(10), batch_id=9) is not None
    assert index_stats(spark, idx)["vectors"] == 500


def test_retrain_crash_windows_are_deterministic(spark, split, tmp_path):
    base, b1, _ = split
    idx = str(tmp_path / "index")
    build_index(spark, base, idx, k=8, seed=42)
    append_vectors(spark, idx, b1, batch_id=1)
    centroids_before = load_centroids(spark, idx)
    want_before = _ranked(query_index(spark, idx, _queries(spark), K))

    # window 1: full generation committed, pointer NEVER written — the
    # unreferenced centroids-bearing generation must be invisible
    from big_data_crypto_sentiment_spark.jobs import ann_index as AI
    orig = AI._swap_in_full_gen
    AI._swap_in_full_gen = lambda *a, **k: None
    try:
        retrain_index(spark, idx, seed=7)
    finally:
        AI._swap_in_full_gen = orig
    assert len(_gen_dirs(idx)) == 3          # build + append + orphan
    assert load_centroids(spark, idx) == centroids_before
    assert _ranked(query_index(spark, idx, _queries(spark), K)) \
        == want_before
    assert index_stats(spark, idx)["vectors"] == 400

    # retry heals: the orphan is swept by the completed retrain
    retrain_index(spark, idx, seed=7)
    assert len(_gen_dirs(idx)) == 1
    assert index_stats(spark, idx)["vectors"] == 400

    # window 2: pointer written, cleanup crashed — stale generations on
    # disk must be excluded by the superseded list, and a later
    # retrain/compact removes them
    append_vectors(spark, idx, b1.limit(20), batch_id=5)
    from big_data_crypto_sentiment_spark.jobs import _genstore as GS
    orig_rmtree = shutil.rmtree
    GS.shutil.rmtree = lambda *a, **k: None  # "crash" during cleanup
    try:
        retrain_index(spark, idx, seed=11)
    finally:
        GS.shutil.rmtree = orig_rmtree
    # stale dirs remain (renamed aside or listed superseded) but stats
    # and queries resolve through the pointer only
    s = index_stats(spark, idx)
    assert s["vectors"] == 400 and s["rows"] == 400
    centroids = load_centroids(spark, idx)
    got = _ranked(query_index(spark, idx, _queries(spark), K))
    want = _ranked(ivf_topk(
        _queries(spark),
        _corpus(spark).filter(F.col("vec_id") < 400), centroids, K))
    assert got == want


def test_index_recall_and_maintenance_policy(spark, split, tmp_path):
    from big_data_crypto_sentiment_spark.jobs.ann_index import (
        index_recall,
        maintenance_due,
    )
    base, b1, b2 = split
    idx = str(tmp_path / "index")
    build_index(spark, base, idx, k=8, seed=42)
    r = index_recall(spark, idx, n_queries=8, k=4)
    assert r["queries"] == 8 and 0.0 <= r["recall_at_k"] <= 1.0
    # full probe set == exact: recall must be 1.0 by construction
    n_clusters = len(load_centroids(spark, idx))
    r_full = index_recall(spark, idx, n_queries=8, k=4,
                          n_probe=n_clusters)
    assert r_full["recall_at_k"] == 1.0
    # recall is deterministic for a fixed seed, and seed changes the
    # sample (not necessarily the value)
    assert index_recall(spark, idx, n_queries=8, k=4) == r

    # maintenance policy: pure function over stats
    append_vectors(spark, idx, b1, batch_id=1)
    append_vectors(spark, idx, b2, batch_id=2)
    s = index_stats(spark, idx, include_full=True)
    assert s["full_rows"] == 300 and s["rows"] == 500
    due = maintenance_due(s, max_append_frac=0.25)
    assert due["retrain"] and not due["compact"]   # 40% appended
    assert maintenance_due(s, max_append_frac=0.5) \
        == {"compact": False, "retrain": False, "reasons": []}
    # crash-window dup debris -> compact
    assert maintenance_due({"generations": 2, "rows": 110,
                            "vectors": 100})["compact"]
    # generation pile-up without append info -> compact proxy
    assert maintenance_due({"generations": 40, "rows": 100,
                            "vectors": 100})["compact"]


def test_crashed_pointer_flip_cannot_resurrect_superseded_appends(
        spark, split, tmp_path):
    """The r10 review window: retrain writes the pointer but crashes
    BEFORE any removal, leaving the superseded dirs on disk under
    their original names. A later retrain (whose fold no longer sees
    them) must not bring a superseded centroid-less append back into
    the live set with cids assigned under long-dead centroids — and a
    no-op compact must sweep the debris."""
    from big_data_crypto_sentiment_spark.jobs import ann_index as AI
    base, b1, _ = split
    idx = str(tmp_path / "index")
    build_index(spark, idx_corpus := base, idx, k=8, seed=42)
    append_vectors(spark, idx, b1, batch_id=1)

    # retrain R1: pointer written, cleanup never ran (the removal
    # primitive "crashes" before touching anything)
    orig = AI.remove_gen
    AI.remove_gen = lambda d: False
    try:
        retrain_index(spark, idx, seed=7)
    finally:
        AI.remove_gen = orig
    assert len(_gen_dirs(idx)) == 3      # build + append + R1, all on disk
    assert index_stats(spark, idx)["vectors"] == 400   # pointer rules

    # retrain R2 over the post-crash state: the old append must stay
    # dead (its rows are already inside R1 -> R2), live set is R2 alone
    retrain_index(spark, idx, seed=11)
    _, live = AI._live_gens(idx)
    assert len(live) == 1 and len(_gen_dirs(idx)) == 1
    s = index_stats(spark, idx)
    assert s["rows"] == 400 and s["vectors"] == 400
    centroids = load_centroids(spark, idx)
    got = _ranked(query_index(spark, idx, _queries(spark), K))
    want = _ranked(ivf_topk(
        _queries(spark),
        _corpus(spark).filter(F.col("vec_id") < 400), centroids, K))
    assert got == want

    # same crash again, then a NO-OP compact (single live gen) must
    # sweep the debris instead of leaving it forever
    append_vectors(spark, idx, b1.limit(10), batch_id=2)
    AI.remove_gen = lambda d: False
    try:
        retrain_index(spark, idx, seed=13)
    finally:
        AI.remove_gen = orig
    assert len(_gen_dirs(idx)) > 1
    from big_data_crypto_sentiment_spark.jobs.ann_index import (
        compact_index,
    )
    compact_index(spark, idx)
    assert len(_gen_dirs(idx)) == 1
    assert index_stats(spark, idx)["vectors"] == 400


def test_fresh_checkpoint_does_not_mistake_old_epochs_for_replays(
        spark, split, tmp_path):
    """r10 review: with bare epoch keys, a NEW checkpoint against an
    index already holding gen_b_0 saw its own fresh epoch 0 as a
    replay and silently dropped every batch. Generation keys are now
    bound to the checkpoint via the run id."""
    base, b1, b2 = split
    idx = str(tmp_path / "index")
    build_index(spark, base, idx, k=8, seed=42)

    def drain(src, ck, df):
        _drop(spark, src, df)
        stream = (spark.readStream.schema(VEC_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_ann_ingest_sink(stream, idx, ck)
        try:
            q.awaitTermination()
        finally:
            q.stop()

    drain(str(tmp_path / "srcA"), str(tmp_path / "ckA"), b1)
    # second stream, DIFFERENT checkpoint, epoch counter restarts at 0
    drain(str(tmp_path / "srcB"), str(tmp_path / "ckB"), b2)
    s = index_stats(spark, idx)
    assert s["vectors"] == 500 and s["rows"] == 500


def test_replay_after_compaction_is_recognized_and_self_match_free(
        spark, split, tmp_path):
    """r10 review: a compact between an epoch's generation commit and
    its checkpoint replay used to delete the replay's evidence — the
    replay then looked like a first pass and re-verdicted against an
    index containing the batch. The tombstone keeps the epoch
    recognized, and the recompute excludes the batch BY ID."""
    from big_data_crypto_sentiment_spark.jobs.ann_index import (
        compact_index,
    )
    base, b1, _ = split
    idx, vdir = str(tmp_path / "index"), str(tmp_path / "verdicts")
    build_index(spark, base, idx, k=8, seed=42)
    process = ann_ingest_batch_writer(idx, vdir, k=2)

    process(b1, 0)
    out = os.path.join(vdir, "epoch=0")
    v1 = _ranked_verdicts(spark, out)
    compact_index(spark, idx)                 # folds gen_b_0 away
    assert index_stats(spark, idx)["generations"] == 1

    # crash window: verdicts lost after the fold; the replay must
    # recompute them WITHOUT re-appending and WITHOUT self/batch-mates
    os.remove(os.path.join(out, "_SUCCESS"))
    process(b1, 0)
    v2 = _ranked_verdicts(spark, out)
    assert v2 == v1
    assert all(vid < 300 for (_, _, vid) in v2)   # no batch members
    assert index_stats(spark, idx)["rows"] == 400  # no duplicate append


def test_append_racing_a_retrain_survives(spark, split, tmp_path):
    """r10 review: the first resurrection fix superseded EVERY on-disk
    generation, which would have silently destroyed an append that
    committed between the retrain's fold and its pointer flip. The
    dead set is fold-time + previously-dead only, so the raced batch
    stays live (with stale cids until the next fold)."""
    from big_data_crypto_sentiment_spark.jobs import ann_index as AI
    base, b1, b2 = split
    idx = str(tmp_path / "index")
    build_index(spark, base, idx, k=8, seed=42)
    append_vectors(spark, idx, b1, batch_id=1)

    orig_swap = AI._swap_in_full_gen

    def racing_swap(index_dir, final, olds):
        append_vectors(spark, index_dir, b2, batch_id=7)  # races in
        orig_swap(index_dir, final, olds)

    AI._swap_in_full_gen = racing_swap
    try:
        retrain_index(spark, idx, seed=7)
    finally:
        AI._swap_in_full_gen = orig_swap
    s = index_stats(spark, idx)
    assert s["vectors"] == 500 and s["rows"] == 500   # nothing lost
    # the raced generation is live on disk, not superseded
    _, live = AI._live_gens(idx)
    assert any(d.endswith("gen_b_7") for d in live)
    # a follow-up retrain folds it under fresh centroids
    retrain_index(spark, idx, seed=11)
    s2 = index_stats(spark, idx)
    assert s2 == {"generations": 1, "rows": 500, "vectors": 500,
                  "clusters_used": s2["clusters_used"]}
