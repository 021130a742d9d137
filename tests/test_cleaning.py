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
