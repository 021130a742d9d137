"""Streaming near-dup dedup (streaming/dedup_stream.py): micro-batches
verdicted against the persistent on-disk MinHash index must equal the
batch lifecycle run over the same batches, stay correct across a
kill/restart on the same checkpoint, and be idempotent under
foreachBatch replays (T9 composed with the dedup family)."""

import os

import pytest

from big_data_crypto_sentiment_spark.jobs.dedup_index import (
    append_batch,
    build_index,
    index_stats,
)
from big_data_crypto_sentiment_spark.streaming.dedup_stream import (
    dedup_verdict_batch_writer,
    start_dedup_verdict_sink,
)
from tests.test_dedup import BASE, _doc

DOC_SCHEMA = "doc_id bigint, text string"


@pytest.fixture()
def parts(spark):
    near = list(BASE)
    near[5] = "leaps"
    near[20] = "quiet"
    fresh = ("completely different content about spark shuffle "
             "partitions and columnar parquet readers with zero "
             "overlap in any shingle of the original text at all "
             "plus more filler words to reach comparable length").split()
    novel = ("totally novel second batch text about watermark "
             "semantics and state stores with ample distinct "
             "words to cross the shingle threshold easily for "
             "sure absolutely definitely").split()
    base = spark.createDataFrame([_doc(1, BASE), _doc(2, fresh)],
                                 DOC_SCHEMA)
    b1 = [_doc(10, near)]                     # dup of indexed 1
    b2 = [_doc(20, near), _doc(21, novel)]    # dup resolves to 1; new
    return base, b1, b2


def _drop(spark, src, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1) \
         .write.mode("append").parquet(src)


def _verdicts(spark, vdir):
    return {r.doc_id: r for r in spark.read.parquet(vdir).collect()}


def test_streamed_batches_match_batch_lifecycle_across_restart(
        spark, parts, tmp_path):
    base, b1, b2 = parts
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    idx, vdir = str(tmp_path / "index"), str(tmp_path / "verdicts")
    build_index(spark, base, idx)

    def start():
        stream = (spark.readStream.schema(DOC_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return start_dedup_verdict_sink(stream, idx, vdir, ck,
                                        threshold=0.5,
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

    got = _verdicts(spark, vdir)
    assert got[10].is_new == 0 and got[10].dup_of == 1
    # batch2's copy resolves via batch1's appended artifacts to the
    # EARLIEST indexed copy (doc 1, not 10) — state crossed the restart
    assert got[20].is_new == 0 and got[20].dup_of == 1
    assert got[21].is_new == 1

    # the batch-lifecycle twin over the same batches agrees exactly
    idx2 = str(tmp_path / "index2")
    build_index(spark, base, idx2)
    want = {}
    for batch in (b1, b2):
        bdf = spark.createDataFrame(batch, DOC_SCHEMA)
        for r in append_batch(spark, idx2, bdf, threshold=0.5).collect():
            want[r.doc_id] = r
    assert set(got) == set(want)
    for k in got:
        assert (got[k].is_new, got[k].dup_of) \
            == (want[k].is_new, want[k].dup_of), k
    # and the two indexes hold identical contents
    s_stream, s_batch = index_stats(spark, idx), index_stats(spark, idx2)
    for f in ("docs", "band_rows", "shingle_rows"):
        assert s_stream[f] == s_batch[f]


def test_replayed_epoch_is_idempotent(spark, parts, tmp_path):
    """Driving the foreachBatch function directly: a replay of an
    already-committed epoch neither re-appends nor changes verdicts —
    even when the crash hit between append and (hypothetically lost)
    verdict output."""
    base, b1, _ = parts
    idx, vdir = str(tmp_path / "index"), str(tmp_path / "verdicts")
    build_index(spark, base, idx)
    process = dedup_verdict_batch_writer(idx, vdir, threshold=0.5)
    bdf = spark.createDataFrame(b1, DOC_SCHEMA)

    process(bdf, 0)
    s1 = index_stats(spark, idx)
    v1 = _verdicts(spark, os.path.join(vdir, "epoch=0"))

    process(bdf, 0)                    # plain replay
    assert index_stats(spark, idx) == s1
    assert {k: (v.is_new, v.dup_of) for k, v in
            _verdicts(spark, os.path.join(vdir, "epoch=0")).items()} \
        == {k: (v.is_new, v.dup_of) for k, v in v1.items()}

    # crash window: generation committed but verdicts lost → the
    # replay recomputes them against the index MINUS the batch's own
    # generation (no self-matches)
    import shutil
    shutil.rmtree(os.path.join(vdir, "epoch=0"))
    process(bdf, 0)
    v2 = _verdicts(spark, os.path.join(vdir, "epoch=0"))
    assert (v2[10].is_new, v2[10].dup_of) == (v1[10].is_new,
                                              v1[10].dup_of)
    assert index_stats(spark, idx) == s1


def test_partial_verdict_write_is_repaired_on_replay(
        spark, parts, tmp_path):
    """A crash DURING the verdict parquet write leaves an epoch dir
    with data files but no _SUCCESS marker. The replay must not treat
    the bare directory as 'already written' — it rewrites the epoch
    (ADVICE r9: streaming/dedup_stream.py skipped on isdir and froze
    the corrupt output forever)."""
    base, b1, _ = parts
    idx, vdir = str(tmp_path / "index"), str(tmp_path / "verdicts")
    build_index(spark, base, idx)
    process = dedup_verdict_batch_writer(idx, vdir, threshold=0.5)
    bdf = spark.createDataFrame(b1, DOC_SCHEMA)

    process(bdf, 0)
    out = os.path.join(vdir, "epoch=0")
    v1 = _verdicts(spark, out)
    s1 = index_stats(spark, idx)

    # simulate the partial write: marker gone, a corrupt part left
    os.remove(os.path.join(out, "_SUCCESS"))
    for f in os.listdir(out):
        if f.endswith(".parquet"):
            with open(os.path.join(out, f), "w") as fh:
                fh.write("torn")
            break

    process(bdf, 0)                    # replay repairs, not skips
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    v2 = _verdicts(spark, out)
    assert {k: (v.is_new, v.dup_of) for k, v in v2.items()} \
        == {k: (v.is_new, v.dup_of) for k, v in v1.items()}
    assert index_stats(spark, idx) == s1


def test_replay_after_compaction_is_recognized_and_self_match_free(
        spark, parts, tmp_path):
    """r10 review: a compact between an epoch's generation commit and
    its checkpoint replay used to delete the replay's evidence — the
    replay then looked like a first pass and every replayed doc
    matched its own indexed copy. The tombstone keeps the epoch
    recognized; the recompute excludes the batch's doc_ids."""
    from big_data_crypto_sentiment_spark.jobs.dedup_index import (
        compact_index,
    )
    base, b1, _ = parts
    idx, vdir = str(tmp_path / "index"), str(tmp_path / "verdicts")
    build_index(spark, base, idx)
    process = dedup_verdict_batch_writer(idx, vdir, threshold=0.5)
    bdf = spark.createDataFrame(b1, DOC_SCHEMA)

    process(bdf, 0)
    out = os.path.join(vdir, "epoch=0")
    v1 = _verdicts(spark, out)
    s1 = index_stats(spark, idx)
    compact_index(spark, idx)                 # folds gen_b_0 away

    # crash window: verdicts lost after the fold; the replay must
    # recompute them WITHOUT re-appending and WITHOUT matching the
    # batch's own indexed copy (doc 10 resolves to doc 1, not itself)
    import shutil
    shutil.rmtree(out)
    process(bdf, 0)
    v2 = _verdicts(spark, out)
    assert (v2[10].is_new, v2[10].dup_of) \
        == (v1[10].is_new, v1[10].dup_of) == (0, 1)
    s2 = index_stats(spark, idx)
    assert (s2["docs"], s2["band_rows"]) == (s1["docs"], s1["band_rows"])
