"""The unrolled-SQL BPE oracle pinned BEYOND the fixtures: random and
adversarial corpora run through the exact ORACLE strings on DuckDB and
must reproduce the Python reference trainer and the greedy min-rank
encoder. This is the independent-evidence leg for the r14 graduation —
the fixture hash checks prove engine parity on the driver corpus; this
proves the SQL unroll implements BPE itself (ties, chained merges,
end-of-word fusions, repeated-symbol overlaps)."""

import random

import duckdb
import pandas as pd
import pytest

from big_data_crypto_sentiment_spark.queries.bpe import (
    BPE_MERGES,
    ORACLE,
    encode_word,
    reference_bpe,
    reference_bpe_naive,
)


def _duck(texts):
    con = duckdb.connect()
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con.register("documents_df", df)
    con.sql("CREATE VIEW documents AS SELECT * FROM documents_df")
    return con


def _expected_merges(texts):
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return reference_bpe(wc, BPE_MERGES), wc


def _expected_tokens(text, merges):
    ranks = {(m[1], m[2]): m[0] for m in merges}
    out = []
    for w in text.split(" "):
        if w:
            out.extend(encode_word(w, ranks))
    return out


CORPORA = [
    # chained merges + overlapping repeats (aaaa: non-overlap greedy)
    ["aaaa bb aaaa aaa", "bb aaaa", "a aa aaa aaaa"],
    # count ties everywhere — the \x01 tie-break path decides
    ["ab cd ab cd", "ef gh ef gh", "ij kl ij kl"],
    # single-char words: only (c, </w>) pairs exist
    ["a b c d e f g", "a b c", "g f e"],
    # end-of-word fusions then fused-left merges
    ["her her her hers", "here there where", "he she the"],
    # one long word dominates
    ["abcabcabcabcabc x", "abcabc y", "abc z"],
]


@pytest.mark.parametrize("texts", CORPORA)
def test_sql_trainer_matches_reference(texts):
    con = _duck(texts)
    got = con.sql(ORACLE["bpe_merges"]).fetchall()
    want, _ = _expected_merges(texts)
    assert sorted(got) == sorted(
        (r, a, b, m, f) for r, a, b, m, f in want)


@pytest.mark.parametrize("texts", CORPORA)
def test_sql_encode_matches_minrank_replay(texts):
    con = _duck(texts)
    rows = con.sql(ORACLE["bpe_encode_tokens"]).fetchall()
    merges, _ = _expected_merges(texts)
    by_id = {r[0]: r for r in rows}
    for i, t in enumerate(texts):
        toks = _expected_tokens(t, merges)
        doc_id, n_tokens, n_merged, joined = by_id[i]
        assert joined.split("\x1f") == toks
        assert n_tokens == len(toks)
        assert n_merged == sum(1 for x in toks
                               if len(x) > 1 and x != "</w>")


def test_sql_trainer_matches_reference_on_random_corpora():
    rng = random.Random(20260816)
    alphabet = "abcdef"
    for _ in range(8):
        vocab = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randint(1, 6)))
                 for _ in range(rng.randint(3, 12))]
        texts = [" ".join(rng.choice(vocab)
                          for _ in range(rng.randint(1, 20)))
                 for _ in range(rng.randint(1, 6))]
        con = _duck(texts)
        got = sorted(con.sql(ORACLE["bpe_merges"]).fetchall())
        want, wc = _expected_merges(texts)
        assert got == sorted((r, a, b, m, f) for r, a, b, m, f in want)
        # the fast trainer itself equals the textbook recount here too
        assert want == reference_bpe_naive(wc, BPE_MERGES)
        # and the encode replay round-trips every doc
        rows = {r[0]: r[3] for r in
                con.sql(ORACLE["bpe_encode_tokens"]).fetchall()}
        for i, t in enumerate(texts):
            assert rows[i].split("\x1f") == _expected_tokens(t, want)
