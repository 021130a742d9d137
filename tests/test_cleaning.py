"""Corpus-cleaning operators: decontamination, repetition signals, PII
redaction (queries/cleaning.py). The registry queries are hash-checked
against DuckDB by tools/check.py; these tests cover the adversarial
cases the word-soup fixtures can't express."""

import hashlib

from big_data_crypto_sentiment_spark.queries.cleaning import (
    BENCH_PCT,
    NGRAM,
    decontaminate,
    redact_pii,
    repetition_signals,
)


def _bucket(v: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % 100


def _some_id(bench: bool) -> int:
    for i in range(1000):
        if (_bucket(i) < BENCH_PCT) == bench:
            return i
    raise AssertionError("no id found")


def test_decontaminate_flags_benchmark_duplicate(spark):
    bench_id, corpus_id = _some_id(True), _some_id(False)
    clean_id = next(i for i in range(1000)
                    if _bucket(i) >= BENCH_PCT and i != corpus_id)
    leaked = " ".join(f"w{i}" for i in range(NGRAM + 3))
    other = " ".join(f"z{i}" for i in range(NGRAM + 3))
    df = spark.createDataFrame(
        [(bench_id, leaked), (corpus_id, leaked), (clean_id, other)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in decontaminate(df).collect()}
    # the verbatim copy of a benchmark doc hits on every gram
    assert set(rows) == {corpus_id}
    r = rows[corpus_id]
    assert r.n_hit == r.n_grams == 4 and r.hit_frac == 1.0


def test_decontaminate_short_docs_produce_no_grams(spark):
    ids = [_some_id(True), _some_id(False)]
    df = spark.createDataFrame(
        [(ids[0], "too short"), (ids[1], "too short")],
        "doc_id long, text string")
    assert decontaminate(df).count() == 0


def test_repetition_signals_flags_degenerate_doc(spark):
    df = spark.createDataFrame(
        [(1, "a a a a a"), (2, "one two three four five")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    r1 = rows[1]
    assert r1.n_words == 5
    assert r1.distinct_ratio == 0.2
    assert r1.top_word_frac == 1.0
    assert r1.dup_2gram_frac == 0.75  # 4 grams, 1 distinct
    assert r1.repetitive == 1
    r2 = rows[2]
    assert r2.distinct_ratio == 1.0 and r2.dup_2gram_frac == 0.0
    assert r2.repetitive == 0


def test_redact_pii_adversarial_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c%d@sub.example.co.uk and x@y.io now"),
            (2, "555-0199 leads, 10.255.0.1 trails 555-0200"),
            (3, "not-pii: 555-12345 v1.2.3.4.5 user@nodot"),
            (4, "edge 1.2.3.4"),
        ],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].n_emails == 2 and rows[1].n_phones == 0
    assert rows[1].clean_text == "mail <EMAIL> and <EMAIL> now"
    assert rows[2].n_phones == 2 and rows[2].n_ips == 1
    assert rows[2].clean_text == "<PHONE> leads, <IP> trails <PHONE>"
    # 555-12345 fails the \b{4} boundary; v1.2.3.4.5 has 5 octets so one
    # 4-octet window still matches; user@nodot has no TLD dot
    assert rows[3].n_phones == 0 and rows[3].n_emails == 0
    assert rows[4].n_ips == 1 and rows[4].clean_text == "edge <IP>"


def test_decontaminate_with_explicit_benchmark_table(spark):
    leaked = " ".join(f"w{i}" for i in range(NGRAM))
    corpus = spark.createDataFrame(
        [(1, leaked), (2, "totally different words here now")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(900, leaked)], "doc_id long, text string")
    rows = decontaminate(corpus, benchmark=bench).collect()
    # no hash-slice semantics: ALL corpus docs screened, bench ids ignored
    assert [(r.doc_id, r.n_hit) for r in rows] == [(1, 1)]


def test_strip_boilerplate_removes_hot_lines_keeps_order(spark):
    from big_data_crypto_sentiment_spark.queries.cleaning import (
        hot_lines,
        strip_boilerplate,
    )
    hot_line = "subscribe now"
    docs = spark.createDataFrame(
        [(i, f"unique {i}\n{hot_line}\ntail {i}") for i in range(10)]
        + [(99, hot_line)],  # all-boilerplate doc
        "doc_id long, text string")
    hot, truncated = hot_lines(docs, min_df=5)
    assert hot == [hot_line] and not truncated
    rows = {r.doc_id: r for r in strip_boilerplate(docs, hot).collect()}
    assert rows[3].clean_text == "unique 3\ntail 3"  # order preserved
    assert rows[3].n_lines == 3 and rows[3].n_removed == 1
    assert rows[99].clean_text == "" and rows[99].n_removed == 1


def test_strip_boilerplate_duplicate_line_in_one_doc_counts_df_once(spark):
    from big_data_crypto_sentiment_spark.queries.cleaning import hot_lines
    # "x" appears 3 times in ONE doc: document frequency is 1, not 3
    docs = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "y")], "doc_id long, text string")
    hot, _ = hot_lines(docs, min_df=2)
    assert hot == []


def test_hot_lines_cap_is_surfaced_not_silent(spark):
    from big_data_crypto_sentiment_spark.queries.cleaning import hot_lines
    docs = spark.createDataFrame(
        [(i, "a\nb\nc") for i in range(4)], "doc_id long, text string")
    hot, truncated = hot_lines(docs, min_df=2, max_hot=2)
    assert len(hot) == 2 and truncated  # deterministic: df desc, line asc


def test_unigram_score_known_distribution(spark):
    import math

    from big_data_crypto_sentiment_spark.queries.cleaning import (
        _LP_SCALE,
        unigram_model,
        unigram_score,
    )
    # corpus: "a" x3, "b" x1 -> total=4, V=2, denom=7
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string")
    lp, oov, truncated = unigram_model(docs)
    assert not truncated
    assert lp["a"] == round(math.log(4 / 7) * _LP_SCALE)
    assert lp["b"] == round(math.log(2 / 7) * _LP_SCALE)
    assert oov == round(math.log(1 / 7) * _LP_SCALE)
    # score an unseen doc: "a z" -> (nll(a) + nll(oov)) / 2
    probe = spark.createDataFrame([(9, "a z")], "doc_id long, text string")
    r = unigram_score(probe, lp, oov).collect()[0]
    assert r.n_tokens == 2 and r.n_oov == 1
    want = round(-(lp["a"] + oov) / (2 * _LP_SCALE), 6)
    assert abs(r.avg_nll - want) < 1e-9


def test_unigram_score_rare_doc_scores_worse_than_common(spark):
    from big_data_crypto_sentiment_spark.queries.cleaning import (
        unigram_model,
        unigram_score,
    )
    docs = spark.createDataFrame(
        [(i, "the common phrase repeats") for i in range(20)]
        + [(100, "zq xv jkl pqw")],
        "doc_id long, text string")
    lp, oov, _ = unigram_model(docs)
    scores = {r.doc_id: r.avg_nll
              for r in unigram_score(docs, lp, oov).collect()}
    assert scores[100] > scores[0]  # gibberish = higher NLL


def test_bigram_score_backoff_and_interpolation(spark):
    """Known-corpus pin for the interpolated bigram scorer: a doc made
    of in-vocab bigrams must score a lower avg_nll than a doc of unseen
    bigrams over the same unigrams (backoff pays the bigram mass at
    unigram rates), and short docs (<2 tokens) are dropped."""
    from big_data_crypto_sentiment_spark.queries.cleaning import (
        bigram_model,
        bigram_score,
    )

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)]
        + [(100, "solo")],
        "doc_id long, text string")
    blp, ulp, uoov, truncated = bigram_model(corpus)
    assert "the cat" in blp and not truncated
    probe = spark.createDataFrame(
        [(1, "the cat sat"), (2, "cat the sat"), (3, "x")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            bigram_score(probe, blp, ulp, uoov).collect()}
    assert 3 not in rows                        # <2 tokens dropped
    assert rows[1].n_oov_bigrams == 0
    assert rows[2].n_oov_bigrams == 2           # reversed order unseen
    assert rows[1].avg_nll < rows[2].avg_nll    # fluent beats shuffled
