"""On-disk IVF ANN-index lifecycle (jobs/ann_index.py): build from a
corpus, query against the STORED artifacts, append vector batches
under frozen centroids, survive crashed/replayed appends, and compact.
The core contract: querying the stored index is byte-identical to the
in-memory ivf_topk operator with the same centroids."""

import os

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.catalog import load
from big_data_crypto_sentiment_spark.jobs.ann_index import (
    append_vectors,
    build_index,
    compact_index,
    index_stats,
    load_centroids,
    query_index,
)
from big_data_crypto_sentiment_spark.queries.similarity import (
    ivf_topk,
)

SF = "/root/testdata/sf0.001"
K = 8


def _corpus(spark):
    return load(spark, "embeddings", SF).select("vec_id", "embedding")


def _queries(spark):
    return (load(spark, "embeddings", SF).filter(F.col("vec_id") < 5)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qe")))


def _ranked(df):
    return sorted((r.query_id, r.rank, r.vec_id, round(r.cos, 9))
                  for r in df.collect())


@pytest.fixture()
def built(spark, tmp_path):
    idx = str(tmp_path / "ann")
    corpus = _corpus(spark)
    info = build_index(spark, corpus, idx, k=8, seed=42)
    assert info == {"indexed_vectors": 500, "clusters": 8}
    return idx


def test_stored_index_query_equals_fresh_ivf_topk(spark, built):
    centroids = load_centroids(spark, built)
    got = _ranked(query_index(spark, built, _queries(spark), K))
    want = _ranked(ivf_topk(_queries(spark), _corpus(spark),
                            centroids, K))
    assert got == want and got


def test_append_under_frozen_centroids_and_idempotent_replay(
        spark, built):
    corpus = _corpus(spark)
    old = corpus.filter(F.col("vec_id") < 400)
    delta = corpus.filter(F.col("vec_id") >= 400)
    # rebuild a split index: base build on `old`, then append `delta`
    idx2 = built + "_split"
    build_index(spark, old, idx2, k=8, seed=42)
    assert append_vectors(spark, idx2, delta, batch_id=1) is not None
    s1 = index_stats(spark, idx2)
    assert s1["vectors"] == 500 and s1["generations"] == 2
    # replayed append (same batch_id) is skipped
    assert append_vectors(spark, idx2, delta, batch_id=1) is None
    assert index_stats(spark, idx2) == s1
    # split-index query ≡ one-shot in-memory operator with the SPLIT
    # index's centroids (frozen at its build over `old`)
    centroids = load_centroids(spark, idx2)
    got = _ranked(query_index(spark, idx2, _queries(spark), K))
    want = _ranked(ivf_topk(_queries(spark), corpus, centroids, K))
    assert got == want


def test_crashed_append_invisible_and_compact_heals(spark, built):
    # crash mid-append: uncommitted _tmp_* root with garbage
    crash = os.path.join(built, "_tmp_gen_b_9_deadbeef")
    os.makedirs(os.path.join(crash, "assignments"))
    with open(os.path.join(crash, "assignments", "junk.parquet"),
              "w") as f:
        f.write("not parquet")
    s0 = index_stats(spark, built)
    assert s0["generations"] == 1            # tmp never listed
    # un-keyed double append duplicates rows; compact dedups on vec_id
    delta = _corpus(spark).filter(F.col("vec_id") >= 490)
    append_vectors(spark, built, delta)
    append_vectors(spark, built, delta)      # at-least-once, no key
    dup = index_stats(spark, built)
    assert dup["rows"] == s0["rows"] + 20 and dup["vectors"] == 500
    assert compact_index(spark, built) == {"generations": 1}
    healed = index_stats(spark, built)
    assert healed["rows"] == 500 and healed["vectors"] == 500
    # centroids survive compaction; queries unchanged
    centroids = load_centroids(spark, built)
    got = _ranked(query_index(spark, built, _queries(spark), K))
    want = _ranked(ivf_topk(_queries(spark), _corpus(spark),
                            centroids, K))
    assert got == want


def test_query_tolerates_duplicated_assignment_rows(spark, built):
    """The crash model permits duplicate (vec_id, cid) rows BETWEEN
    heals (un-keyed replayed append; compact's commit→cleanup window).
    query_index must still return the true top-k — not hand one vec_id
    two consecutive ranks and evict the real kth neighbor (ADVICE r9:
    jobs/ann_index.py ranked without deduping vec_id)."""
    centroids = load_centroids(spark, built)
    want = _ranked(ivf_topk(_queries(spark), _corpus(spark),
                            centroids, K))
    # un-keyed double append: every appended vector's row duplicated
    delta = _corpus(spark).filter(F.col("vec_id") >= 400)
    append_vectors(spark, built, delta)
    append_vectors(spark, built, delta)      # at-least-once, no key
    assert index_stats(spark, built)["rows"] == 500 + 200
    # query BEFORE any compact: ranks must be duplicate-free and
    # identical to the clean in-memory operator
    got_df = query_index(spark, built, _queries(spark), K)
    got = _ranked(got_df)
    assert got == want
    per_q = {}
    for qid, rank, vid, _ in got:
        per_q.setdefault(qid, []).append(vid)
    for qid, vids in per_q.items():
        assert len(vids) == len(set(vids)) == K, qid
