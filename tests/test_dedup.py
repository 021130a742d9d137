"""MinHash-LSH / SimHash / exact-Jaccard behavior on planted near-dups.

The oracle harness can't check the xxhash64-based paths (DuckDB has no
xxhash64), so these tests pin their semantics: planted near-duplicates
must surface as candidate pairs and verified near-dups; unrelated docs
must not.
"""

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries.dedup import (
    _jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_dups,
    simhash,
)

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and the birds sing in the tall "
        "green trees near the old stone bridge by the river").split()


def _doc(doc_id, words):
    return (doc_id, " ".join(words))


@pytest.fixture(scope="module")
def docs(spark):
    near = list(BASE)
    near[5] = "leaps"      # two-word perturbation → jaccard ~0.8
    near[20] = "quiet"
    unrelated = ("completely different content about spark shuffle "
                 "partitions and columnar parquet readers with zero "
                 "overlap in any shingle of the original text at all "
                 "plus more filler words to reach comparable length").split()
    rows = [_doc(1, BASE), _doc(2, near), _doc(3, unrelated)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_lsh_finds_planted_near_dup(docs):
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in minhash_near_dups(docs, 0.5).collect()}
    assert (1, 2) in got
    assert got[(1, 2)] >= 0.5
    assert (1, 3) not in got and (2, 3) not in got


def test_lsh_candidates_subset_and_contain_near_dup(docs):
    cand = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(docs).collect()}
    assert (1, 2) in cand
    # candidates are ordered pairs from the same corpus
    assert all(a < b for a, b in cand)


def test_exact_jaccard_matches_python(docs):
    def shingles(words):
        return {" ".join(words[i:i + 3]) for i in range(len(words) - 2)}

    rows = {(r.doc_id): r.text.split() for r in docs.collect()}
    s1, s2 = shingles(rows[1]), shingles(rows[2])
    expected = len(s1 & s2) / len(s1 | s2)
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in _jaccard_pairs(docs, 0.01).collect()}
    assert got[(1, 2)] == pytest.approx(expected, abs=1e-6)


def test_simhash_near_dups_are_close(docs):
    fp = {r.doc_id: r.simhash for r in simhash(docs).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(fp[1], fp[2]) < hamming(fp[1], fp[3])
    assert hamming(fp[1], fp[2]) <= 4  # 2-word change flips few bits


def test_hot_shingle_df_cut_bounds_candidates(spark):
    """A boilerplate shingle shared by every doc must not fan the
    inverted-index join out to all pairs once the DF cut is on — and
    Jaccard stays EXACT for the pairs that survive (verify runs on the
    full index, the cut only prunes candidate generation)."""
    boiler = "click here to subscribe"
    uniq = [f"unique{i} words{i} only{i} here{i} now{i}" for i in range(8)]
    rows = [(i, f"{boiler} {uniq[i]}") for i in range(8)]
    # docs 6 and 7 genuinely near-identical beyond the boilerplate
    rows[7] = (7, f"{boiler} {uniq[6]} extra")
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # without the cut: boilerplate shingles connect all 8 docs → 28 pairs
    full = _jaccard_pairs(df, 0.0).collect()
    assert len(full) == 28

    # with the cut (boilerplate shingles have DF=8 > 2): only the pair
    # sharing non-hot shingles survives candidate generation
    cut = _jaccard_pairs(df, 0.0, max_shingle_df=2).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in cut}
    assert set(got) == {(6, 7)}
    # exactness: the surviving pair's jaccard equals the uncut value
    full_map = {(r.doc_a, r.doc_b): r.jaccard for r in full}
    assert got[(6, 7)] == full_map[(6, 7)]


def test_empty_and_short_docs_do_not_crash(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d e f g h"), (3, "a b c d e f g h")],
        ["doc_id", "text"])
    out = minhash_near_dups(df, 0.5).collect()
    # doc 1 is too short to shingle; docs 2/3 are exact dups → jaccard 1.0
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in out] == [(2, 3, 1.0)]


def test_source_matrix_pair_expansion(spark, monkeypatch):
    from big_data_crypto_sentiment_spark.queries import dedup as D

    df = spark.createDataFrame(
        [(1, "Same  Text", "srcA"), (2, "same text", "srcB"),
         (3, "SAME TEXT", "srcC"),      # one group across 3 sources
         (4, "same text", "srcA"),      # 2nd srcA copy -> diagonal row
         (5, "unique", "srcA"),         # singleton: no rows at all
         (6, "same text", None),        # NULL source: dropped both engines
         (7, None, "srcB"), (8, None, "srcB")],  # NULL text: dropped
        "doc_id long, text string, source string")
    monkeypatch.setattr(D, "table", lambda s, d, n: df)
    rows = {(r.src_a, r.src_b): r.n_dup_groups
            for r in D.q_dedup_source_matrix(spark, "ignored").collect()}
    # C(3,2) unordered cross pairs once per duplicate group, plus the
    # (s, s) diagonal for the source holding >= 2 copies in the group
    assert rows == {("srcA", "srcA"): 1,
                    ("srcA", "srcB"): 1, ("srcA", "srcC"): 1,
                    ("srcB", "srcC"): 1}


def test_fuzzy_term_pairs_symspell_completeness(spark):
    """Every lev<=1 relation (substitution, insertion/deletion) must be
    found via the delete-neighborhood equality join, and nothing with
    lev >= 2 may survive the verify filter."""
    from big_data_crypto_sentiment_spark.queries.dedup import (
        fuzzy_term_pairs,
    )
    terms = spark.createDataFrame(
        [("spark",), ("spork",),   # substitution at pos 3
         ("spar",),                # deletion of trailing k
         ("sspark",),              # insertion at front
         ("shark",),               # substitution: spark->shark lev 1
         ("quartz",)],             # isolated: nearest is lev >= 2
        "term string")
    got = {(r.term_a, r.term_b): r.lev
           for r in fuzzy_term_pairs(terms).collect()}
    assert got[("spark", "spork")] == 1
    assert got[("spar", "spark")] == 1
    assert got[("spark", "sspark")] == 1
    assert got[("shark", "spark")] == 1
    assert ("spar", "spork") not in got          # lev 2
    assert not any("quartz" in p for p in got)   # isolated term


def test_duplicate_span_stats_planted_span(spark):
    """Two docs sharing an exact 12-token span (boilerplate header) must
    report a max_dup_span of exactly 12 and the right gram counts; a doc
    sharing nothing reports zeros; sub-gram-length docs are excluded."""
    from big_data_crypto_sentiment_spark.queries.dedup import (
        SPAN_GRAM,
        duplicate_span_stats,
    )
    header = [f"h{i}" for i in range(12)]           # shared 12-token span
    a = header + [f"a{i}" for i in range(10)]
    b = [f"b{i}" for i in range(7)] + header + [f"bb{i}" for i in range(5)]
    c = [f"c{i}" for i in range(20)]                # no shared grams
    short = ["x"] * (SPAN_GRAM - 1)                 # too short: excluded
    rows = [(1, " ".join(a)), (2, " ".join(b)),
            (3, " ".join(c)), (4, " ".join(short))]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in duplicate_span_stats(docs).collect()}

    assert set(got) == {1, 2, 3}
    # a shared run of 12 tokens = 12 - SPAN_GRAM + 1 duplicated grams
    n_dup = 12 - SPAN_GRAM + 1
    for d, n_words in ((1, len(a)), (2, len(b))):
        assert got[d].n_grams == n_words - SPAN_GRAM + 1
        assert got[d].n_dup_grams == n_dup
        assert got[d].max_dup_span == 12
    assert got[3].n_dup_grams == 0
    assert got[3].max_dup_span == 0
    assert got[3].dup_frac == 0.0


def test_incremental_minhash_verdicts_against_index_and_batch(spark):
    """Daily-crawl contract: a delta doc duplicating an INDEXED doc is
    flagged with dup_of = the base id; within the batch the smaller
    delta id wins (first-writer-wins) and the earlier copy stays new;
    an unrelated delta doc is new. The base text is consumed only via
    its materialized artifacts (shingled frame + band index)."""
    from big_data_crypto_sentiment_spark.queries.dedup import (
        band_table,
        incremental_minhash_verdicts,
        shingled_docs,
    )
    near = list(BASE)
    near[5] = "leaps"
    near[20] = "quiet"
    fresh = ("completely different content about spark shuffle "
             "partitions and columnar parquet readers with zero "
             "overlap in any shingle of the original text at all "
             "plus more filler words to reach comparable length").split()
    base = spark.createDataFrame([_doc(1, BASE)], ["doc_id", "text"])
    delta = spark.createDataFrame(
        [_doc(10, near),        # dup of indexed doc 1
         _doc(11, fresh),       # genuinely new
         _doc(12, fresh)],      # same-batch dup of 11
        ["doc_id", "text"])
    sh_b = shingled_docs(base)
    out = {r.doc_id: r for r in incremental_minhash_verdicts(
        sh_b, band_table(sh_b), delta, 0.5).collect()}
    assert len(out) == 3                      # one verdict per delta doc
    assert out[10].dup_of == 1 and out[10].is_new == 0
    assert out[10].jaccard >= 0.5
    assert out[11].dup_of is None and out[11].is_new == 1
    assert out[12].dup_of == 11 and out[12].is_new == 0


def test_source_matrix_fp_keys_on_word_prefix(spark, monkeypatch):
    """The prefix variant groups docs sharing the first PREFIX_FP_WORDS
    normalized words even when trailing content diverges (syndicated
    leads), and does NOT merge docs that differ inside the prefix."""
    from big_data_crypto_sentiment_spark.queries import dedup as D

    lead = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [(1, lead + " tail one", "srcA"),
         (2, "Alpha  Beta gamma DELTA epsilon other tail", "srcB"),
         (3, lead, "srcA"),              # exact prefix, no tail
         (4, "alpha beta gamma delta DIFFERENT tail", "srcC"),
         (5, "short one", "srcA")],
        "doc_id long, text string, source string")
    monkeypatch.setattr(D, "table", lambda s, d, n: df)
    rows = {(r.src_a, r.src_b): r.n_dup_groups
            for r in D.q_dedup_source_matrix_fp(spark, "ignored").collect()}
    # docs 1,2,3 share the 5-word prefix (one group, srcA holds 2);
    # doc 4 diverges at word 5; doc 5 is a singleton
    assert rows == {("srcA", "srcA"): 1, ("srcA", "srcB"): 1}
    # the exact-key matrix sees NO duplicate groups in the same data
    assert D.q_dedup_source_matrix(spark, "ignored").count() == 0


def test_vectorized_band_table_matches_expression_twin(spark):
    """r11: the Arrow/numpy signature fold must reproduce the pure
    expression fold bit-for-bit (same md5→KM integer math), on the
    real fixture corpus — every (doc_id, band, bh) row identical."""
    from big_data_crypto_sentiment_spark.queries.dedup import (
        band_table,
        band_table_expr,
        shingled_docs,
    )
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    sh = shingled_docs(d).persist()
    try:
        fast = sorted((r.doc_id, r.band, r.bh)
                      for r in band_table(sh).collect())
        ref = sorted((r.doc_id, r.band, r.bh)
                     for r in band_table_expr(sh).collect())
        assert fast == ref and len(fast) > 0
    finally:
        sh.unpersist()
