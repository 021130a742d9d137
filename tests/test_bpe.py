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
