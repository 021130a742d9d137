"""BPE trainer parity with the pure-Python reference on the classic
Sennrich corpus, plus structural invariants of the registered query."""

import pytest


@pytest.fixture(scope="module")
def classic(spark):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rows = [(i, " ".join([w] * c)) for i, (w, c) in enumerate(wc.items())]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return wc, docs


def test_bpe_matches_reference_on_classic_corpus(spark, classic):
    from big_data_crypto_sentiment_spark.queries.bpe import (
        bpe_train,
        reference_bpe,
    )
    wc, docs = classic
    got, _ = bpe_train(docs, n_merges=6)
    want = reference_bpe(wc, 6)
    assert got == want
    # the classic corpus's famous first merges: 'es' then 'est'
    assert (got[0][1], got[0][2]) == ("e", "s")
    assert (got[1][1], got[1][2]) == ("es", "t")


def test_bpe_symbol_table_reconstructs_words(spark, classic):
    """Merging never loses characters: joining the final symbols (end
    marker stripped) must reproduce each word exactly."""
    from big_data_crypto_sentiment_spark.queries.bpe import END, bpe_train
    _, docs = classic
    _, syms = bpe_train(docs, n_merges=6)
    for r in syms.collect():
        assert "".join(r.s).removesuffix(END) == r.word


def test_bpe_registered_query_shape(spark):
    from big_data_crypto_sentiment_spark.queries.bpe import (
        BPE_MERGES,
        q_bpe_merges,
    )
    rows = q_bpe_merges(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= BPE_MERGES
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.merged == r.left + r.right and r.freq > 0
    # merge frequencies are found on progressively merged tables, so
    # each is a real attested pair count


def test_incremental_reference_matches_naive_spec():
    """The fast incremental trainer must produce the identical merge
    sequence (ranks, pairs, frequencies) as the full-recount spec on
    randomized word dicts."""
    import random

    from big_data_crypto_sentiment_spark.queries.bpe import (
        reference_bpe,
        reference_bpe_naive,
    )

    rng = random.Random(7)
    for trial in range(5):
        wc = {"".join(rng.choices("abcde", k=rng.randint(1, 7))):
              rng.randint(1, 50) for _ in range(60)}
        assert reference_bpe(dict(wc), 10) == reference_bpe_naive(dict(wc), 10)


def test_batched_trainer_equals_sequential_and_cuts_rounds(spark, classic):
    """Top-m batching (VERDICT r6 #5): the batched trainer's merge list
    is IDENTICAL to top-1 sequential greedy and to the reference spec
    (the strict dominance guards make batching exact, not approximate),
    while driver rounds drop — counted via _pair_counts invocations."""
    from unittest import mock

    from big_data_crypto_sentiment_spark.queries import bpe as B
    wc, docs = classic

    def rounds_of(d, n, batch_m):
        calls = {"n": 0}
        orig = B._pair_counts

        def counting(syms):
            calls["n"] += 1
            return orig(syms)

        with mock.patch.object(B, "_pair_counts", counting):
            merges, _ = B.bpe_train(d, n_merges=n, batch_m=batch_m)
        return merges, calls["n"]

    seq, r1 = rounds_of(docs, 6, 1)
    bat, rm = rounds_of(docs, 6, 4)
    assert bat == seq == B.reference_bpe(wc, 6)
    assert r1 == 6      # sequential: one round per merge
    # the classic corpus is ONE chained word family (es -> est -> ...),
    # so the exactness guards allow only occasional 2-merge batches —
    # still strictly fewer rounds
    assert rm < r1
    # a corpus with DISJOINT pair families shows the full ~m* saving:
    # interleaved counts let the dominance guards accept 4 per round
    words = {"ab": 50, "abc": 50, "de": 45, "def": 45,
             "gh": 40, "ghi": 40, "jk": 35, "jkl": 35}
    docs2 = spark.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(words.items())],
        "doc_id long, text string")
    seq2, r1b = rounds_of(docs2, 4, 1)
    bat2, rmb = rounds_of(docs2, 4, 4)
    assert bat2 == seq2 == B.reference_bpe(words, 4)
    assert r1b == 4 and rmb == 1  # all four merges land in ONE round


def test_bpe_encode_roundtrip_and_rank_priority(spark, classic):
    """Encoding with the trained merges: (a) joining a word's tokens
    (END stripped) reproduces the word — no characters lost; (b) the
    greedy min-rank loop equals applying the ranked merge list in
    order (the textbook equivalence); (c) trained merges actually fire
    on the training corpus."""
    from big_data_crypto_sentiment_spark.queries.bpe import (
        END,
        _merge_seq,
        bpe_encode,
        encode_word,
        reference_bpe,
    )
    wc, docs = classic
    merges = reference_bpe(wc, 6)
    ranks = {(m[1], m[2]): m[0] for m in merges}
    for w in wc:
        got = encode_word(w, ranks)
        # (a) reconstruction
        assert "".join(got).removesuffix(END) == w
        # (b) rank-order application equivalence
        seq = list(w) + [END]
        for _, a, b, _, _ in merges:
            seq = _merge_seq(seq, a, b)
        assert got == seq
    # (c) distributed encode over the corpus: merged tokens appear
    rows = {r.doc_id: r.tokens for r in bpe_encode(docs, merges).collect()}
    assert any(len(t) > 1 and t != END
               for toks in rows.values() for t in toks)
    # 'newest' (doc 2) starts with the famous 'est'-family merges
    assert "est" + END in set(rows[2]) or "est" in set(rows[2])


def test_bpe_encode_registered_query_shape(spark):
    from big_data_crypto_sentiment_spark.queries.bpe import q_bpe_encode
    rows = q_bpe_encode(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:50]:
        toks = r.tokens.split("\x1f") if r.tokens else []
        assert r.n_tokens == len(toks)
        assert 0 <= r.n_merged_tokens <= r.n_tokens
    assert any(r.n_merged_tokens > 0 for r in rows)
