"""Packing invariants: every doc assigned exactly once, budget respected
(FFD), chunk continuity (concat-and-chunk), determinism."""

from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries._util import table
from big_data_crypto_sentiment_spark.queries.packing import (
    TOKEN_BUDGET,
    pack_bins_ffd,
    pack_sequences,
)

SF_DIR = "/root/testdata/sf0.001"


def test_ffd_assigns_every_doc_once_within_budget(spark):
    docs = table(spark, SF_DIR, "documents")
    packed = pack_bins_ffd(docs).collect()
    assert sorted(r.doc_id for r in packed) == \
        sorted(r.doc_id for r in docs.select("doc_id").collect())
    loads = {}
    for r in packed:
        key = (r.pack_group, r.bin_id)
        loads.setdefault(key, []).append(r.n_tokens)
    for toks in loads.values():
        # bins never exceed the budget unless a single overlong doc
        assert sum(toks) <= TOKEN_BUDGET or len(toks) == 1


def test_ffd_is_deterministic(spark):
    docs = table(spark, SF_DIR, "documents")
    a = {(r.pack_group, r.bin_id, r.doc_id)
         for r in pack_bins_ffd(docs).collect()}
    b = {(r.pack_group, r.bin_id, r.doc_id)
         for r in pack_bins_ffd(docs).collect()}
    assert a == b


def test_ffd_no_worse_than_naive_one_bin_per_doc(spark):
    docs = table(spark, SF_DIR, "documents")
    packed = pack_bins_ffd(docs)
    n_bins = packed.select("pack_group", "bin_id").distinct().count()
    n_docs = packed.count()
    assert n_bins < n_docs  # actually packs something
    # lower bound: ceil(total_tokens / budget) bins per group
    per_group = (packed.groupBy("pack_group")
                 .agg(F.sum("n_tokens").alias("tok"),
                      F.countDistinct("bin_id").alias("bins")).collect())
    for r in per_group:
        assert r.bins >= -(-r.tok // TOKEN_BUDGET)


def test_chunks_are_contiguous_doc_ranges(spark):
    docs = table(spark, SF_DIR, "documents")
    chunks = pack_sequences(docs).collect()
    by_group = {}
    for r in chunks:
        by_group.setdefault(r.pack_group, []).append(r)
    for rows in by_group.values():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        for prev, cur in zip(rows, rows[1:]):
            # consecutive chunks cover disjoint, ordered doc_id ranges
            assert prev.last_doc < cur.first_doc
