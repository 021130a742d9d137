"""On-disk dedup-index lifecycle (jobs/dedup_index.py): build from a
base corpus, verdict successive delta batches against the STORED
artifacts (base text never re-read), append each batch, and survive a
crashed append. Complements the batch-operator pytest in
test_dedup.py with the storage lifecycle."""

import os

import pytest

from big_data_crypto_sentiment_spark.jobs.dedup_index import (
    append_batch,
    build_index,
    index_stats,
    verdict_batch,
)
from tests.test_dedup import BASE, _doc


@pytest.fixture()
def corpus_parts(spark):
    near = list(BASE)
    near[5] = "leaps"
    near[20] = "quiet"
    fresh = ("completely different content about spark shuffle "
             "partitions and columnar parquet readers with zero "
             "overlap in any shingle of the original text at all "
             "plus more filler words to reach comparable length").split()
    base = spark.createDataFrame([_doc(1, BASE), _doc(2, fresh)],
                                 ["doc_id", "text"])
    batch1 = spark.createDataFrame(
        [_doc(10, near)], ["doc_id", "text"])          # dup of indexed 1
    batch2 = spark.createDataFrame(
        [_doc(20, near),                               # dup via batch1's 10
         _doc(21, ("totally novel second batch text about watermark "
                   "semantics and state stores with ample distinct "
                   "words to cross the shingle threshold easily for "
                   "sure absolutely definitely").split())],
        ["doc_id", "text"])
    return base, batch1, batch2


def test_lifecycle_build_verdict_append_across_batches(
        spark, corpus_parts, tmp_path):
    base, batch1, batch2 = corpus_parts
    idx = str(tmp_path / "index")
    assert build_index(spark, base, idx)["indexed_docs"] == 2

    v1 = {r.doc_id: r for r in
          append_batch(spark, idx, batch1, threshold=0.5).collect()}
    assert v1[10].dup_of == 1 and v1[10].is_new == 0

    # batch2's copy resolves against batch1's APPENDED artifacts —
    # min-partner rule picks the earliest indexed copy (doc 1, not 10)
    v2 = {r.doc_id: r for r in
          append_batch(spark, idx, batch2, threshold=0.5).collect()}
    assert v2[20].is_new == 0 and v2[20].dup_of == 1
    assert v2[21].is_new == 1

    stats = index_stats(spark, idx)
    assert stats["generations"] == 3                  # base + 2 batches
    assert stats["docs"] == 5


def test_crashed_append_is_invisible_and_retry_safe(
        spark, corpus_parts, tmp_path):
    base, batch1, _ = corpus_parts
    idx = str(tmp_path / "index")
    build_index(spark, base, idx)
    # simulate a crash mid-append: an uncommitted _tmp_* generation
    # root — even one already holding a complete shingles half (the
    # exact state that, pre-atomic-commit, could leave shingles
    # visible with no matching bands)
    crash = os.path.join(idx, "_tmp_gen_000001_deadbeef")
    os.makedirs(os.path.join(crash, "shingles"))
    with open(os.path.join(crash, "shingles", "part-junk.parquet"),
              "w") as f:
        f.write("not parquet")
    # readers never list _tmp_*: verdicts still work, retry appends fine
    v = {r.doc_id: r for r in
         verdict_batch(spark, idx, batch1, threshold=0.5).collect()}
    assert v[10].dup_of == 1
    append_batch(spark, idx, batch1, threshold=0.5)
    assert index_stats(spark, idx)["generations"] == 2


def test_batch_id_keyed_append_retry_is_exactly_once(
        spark, corpus_parts, tmp_path):
    """An at-least-once replay of the same batch (same batch_id, the
    streaming consumer's epoch id) still returns verdicts but skips
    the duplicate append — index contents stay exactly-once."""
    base, batch1, _ = corpus_parts
    idx = str(tmp_path / "index")
    build_index(spark, base, idx)
    append_batch(spark, idx, batch1, threshold=0.5, batch_id=7)
    s1 = index_stats(spark, idx)
    v = {r.doc_id: r for r in
         append_batch(spark, idx, batch1, threshold=0.5,
                      batch_id=7).collect()}
    assert v[10].dup_of == 1                      # replay still verdicts
    assert index_stats(spark, idx) == s1          # but appends nothing


def test_compact_folds_generations_and_preserves_verdicts(
        spark, corpus_parts, tmp_path):
    from big_data_crypto_sentiment_spark.jobs.dedup_index import (
        compact_index,
    )
    base, batch1, batch2 = corpus_parts
    idx = str(tmp_path / "index")
    build_index(spark, base, idx)
    append_batch(spark, idx, batch1, threshold=0.5)
    before = index_stats(spark, idx)
    assert before["generations"] == 2
    assert compact_index(spark, idx) == {"shingles": 1, "bands": 1}
    after = index_stats(spark, idx)
    assert after["generations"] == 1
    assert (after["docs"], after["band_rows"], after["shingle_rows"]) \
        == (before["docs"], before["band_rows"], before["shingle_rows"])
    # verdicts against the compacted index are unchanged
    v = {r.doc_id: r for r in
         verdict_batch(spark, idx, batch2, threshold=0.5).collect()}
    assert v[20].is_new == 0 and v[20].dup_of == 1
    assert v[21].is_new == 1


def test_compact_retry_after_partial_removal_heals_duplication(
        spark, corpus_parts, tmp_path):
    """Crash mid-removal leaves the merged generation plus surviving
    olds; a retried compact folds them on the natural keys, so row
    counts return to the clean single-copy state instead of baking
    the duplication in."""
    import shutil as _sh

    from big_data_crypto_sentiment_spark.jobs.dedup_index import (
        _gen_dirs,
        compact_index,
    )
    base, batch1, _ = corpus_parts
    idx = str(tmp_path / "index")
    build_index(spark, base, idx)
    append_batch(spark, idx, batch1, threshold=0.5)
    clean = index_stats(spark, idx)
    # simulate the crash window: keep a pre-compact copy of gen 0,
    # compact, then restore the old generation beside the merged one
    g0 = _gen_dirs(idx)[0]
    saved = str(tmp_path / "saved_gen")
    _sh.copytree(g0, saved)
    compact_index(spark, idx)
    _sh.copytree(saved, os.path.join(idx, "gen_000000_restored"))
    dup = index_stats(spark, idx)
    assert dup["shingle_rows"] > clean["shingle_rows"]  # duplicated state
    compact_index(spark, idx)                            # the retry
    healed = index_stats(spark, idx)
    assert healed["generations"] == 1
    assert (healed["docs"], healed["band_rows"], healed["shingle_rows"]) \
        == (clean["docs"], clean["band_rows"], clean["shingle_rows"])


def test_empty_delta_batch_is_a_clean_noop(spark, corpus_parts, tmp_path):
    """A batch with no rows (quiet ingest day) verdicts to an empty
    frame and appends empty generations without corrupting stats."""
    base, batch1, _ = corpus_parts
    idx = str(tmp_path / "index")
    build_index(spark, base, idx)
    empty = batch1.filter("doc_id < 0")
    assert verdict_batch(spark, idx, empty, threshold=0.5).count() == 0
    append_batch(spark, idx, empty, threshold=0.5)
    s = index_stats(spark, idx)
    assert s["docs"] == 2 and s["generations"] == 2
