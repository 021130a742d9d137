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


def test_chunk_documents_reconstructs_text(spark):
    from big_data_crypto_sentiment_spark.queries.packing import (
        chunk_documents,
    )
    text = "abcdefghijklmnopqrstuvwxyz0123456789"
    df = spark.createDataFrame([(1, text), (2, "tiny")],
                               "doc_id long, text string")
    rows = sorted(chunk_documents(df, chunk_chars=10, overlap=3).collect(),
                  key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    full = by_doc[1]
    assert [r.chunk_start for r in full] == [1, 8, 15, 22, 29]
    for prev, cur in zip(full, full[1:]):
        assert prev.chunk_text[-3:] == cur.chunk_text[:3]  # shared overlap
    rebuilt = full[0].chunk_text + "".join(r.chunk_text[3:] for r in full[1:])
    assert rebuilt == text
    assert all(r.chunk_len == len(r.chunk_text) <= 10 for r in rows)
    # a doc shorter than one chunk yields exactly one chunk
    assert [r.chunk_text for r in by_doc[2]] == ["tiny"]


def test_sft_mask_spans_match_rendered_string(spark):
    """The span arithmetic must index into the ACTUAL rendered string —
    verified against a Python-side render (both engines share the SQL
    arithmetic, so only this closed-form check proves it means what it
    claims)."""
    import datetime as dt

    from big_data_crypto_sentiment_spark.queries.packing import (
        SFT_CLOSE,
        SFT_OPEN,
        sft_mask_spans,
    )
    t0 = dt.datetime(2024, 1, 1)
    turns = [(1, t0 + dt.timedelta(minutes=i), i, txt)
             for i, txt in enumerate(["hi", "hello there", "how are you?",
                                      "fine & dandy"])]
    df = spark.createDataFrame(
        turns, "conv long, ts timestamp, eid long, txt string")
    spans = sorted(
        (r.turn_idx, r.start_char, r.end_char)
        for r in sft_mask_spans(df, "conv", "ts", "eid", "txt").collect())
    rendered = ""
    expected = []
    for i, (_, _, _, txt) in enumerate(turns):
        role = "user" if (i + 1) % 2 == 1 else "assistant"
        start = len(rendered)
        rendered += SFT_OPEN[role] + txt + SFT_CLOSE
        if role == "assistant":
            expected.append((i + 1, start, len(rendered)))
    assert spans == expected
    # and the spans really slice assistant content out of the render
    for _, s, e in spans:
        seg = rendered[s:e]
        assert seg.startswith(SFT_OPEN["assistant"]) \
            and seg.endswith(SFT_CLOSE)
