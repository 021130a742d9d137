"""Gopher quality rules (queries/text.py q_text_gopher_rules). The
registry pair is hash-checked against DuckDB by tools/check.py at all
three SFs, but the word-soup fixtures contain no newlines, bullets,
ellipses or symbol noise — these tests pin the line- and symbol-based
rules (Rae et al. 2021 Appendix A.1.1) on synthetic docs that do."""

import pyspark.sql.functions as F


def _run(spark, docs_rows, tmp_path):
    """Write a tiny documents.parquet and run the registered query on
    it, so the exact registered plan (scan included) is what's
    tested."""
    from big_data_crypto_sentiment_spark.queries.text import (
        q_text_gopher_rules,
    )
    df = spark.createDataFrame(
        docs_rows, "doc_id long, text string, lang string, "
                   "source string, n_chars long")
    df.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    out = q_text_gopher_rules(spark, str(tmp_path))
    return {r.doc_id: r for r in out.collect()}


def test_line_and_symbol_rules_flag_synthetic_docs(spark, tmp_path):
    body = "the words have to be of decent length and that with " * 10
    bullets = "\n".join(f"- item {i} " + body for i in range(10))
    ellipses = "\n".join(
        [body + "..."] * 4 + [body] * 6)          # 40% ellipsis lines
    symbols = body + " " + " ".join(["#"] * 100)  # symbol storm
    rows = [
        (1, body * 2, "en", "s", 0),              # clean: keeps
        (2, bullets, "en", "s", 0),               # 100% bullet lines
        (3, ellipses, "en", "s", 0),
        (4, symbols, "en", "s", 0),
        (5, "short text", "en", "s", 0),          # < 50 words
        (6, ("aaaaaaaaaaaaaaaaaaaaaaaa " * 60).strip(),
         "en", "s", 0),                           # mean word len 24
    ]
    out = _run(spark, rows, tmp_path)
    assert out[1].keep == 1 and all(
        getattr(out[1], f) == 0 for f in out[1].asDict()
        if f.startswith("f_"))
    assert out[2].f_bullet_lines == 1 and out[2].keep == 0
    assert out[3].f_ellipsis_lines == 1 and out[3].keep == 0
    assert out[4].f_symbol_ratio == 1 and out[4].keep == 0
    assert out[5].f_word_count == 1 and out[5].keep == 0
    assert out[6].f_mean_word_len == 1 and out[6].f_few_stopwords == 1


def test_stopword_rule_counts_distinct_not_total(spark, tmp_path):
    # 60 hits of ONE stop word is still < 2 DISTINCT stop words
    one = ("the word " * 60).strip()
    two = ("the word and thing " * 30).strip()
    out = _run(spark, [(1, one, "en", "s", 0),
                       (2, two, "en", "s", 0)], tmp_path)
    assert out[1].f_few_stopwords == 1
    assert out[2].f_few_stopwords == 0


def _py_gopher(text):
    """Pure-Python twin of the rule math (ASCII + the unicode marks
    the generator uses, where python re and Java regex agree)."""
    import re
    words = text.split(" ")
    lines = text.split("\n")
    n_words, n_lines = len(words), len(lines)
    ns_chars = len(re.sub(r"\s", "", text))
    sym_n = len(re.findall(r"#|\.\.\.|…", text))
    bullet_n = sum(bool(re.search(r"^\s*[-*•]", l)) for l in lines)
    ell_n = sum(bool(re.search(r"(\.\.\.|…)\s*$", l)) for l in lines)
    alpha_n = sum(bool(re.search(r"[A-Za-z]", w)) for w in words)
    from big_data_crypto_sentiment_spark.queries.text import (
        GOPHER_ALPHA_PCT,
        GOPHER_BULLET_PCT,
        GOPHER_ELLIPSIS_PCT,
        GOPHER_MAX_MWL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        GOPHER_SYM_PCT,
    )
    stop_distinct = sum(
        bool(re.search(rf"(?i)\b{s}\b", text)) for s in GOPHER_STOPWORDS)
    flags = dict(
        f_word_count=int(n_words < GOPHER_MIN_WORDS
                         or n_words > GOPHER_MAX_WORDS),
        f_mean_word_len=int(ns_chars < n_words * GOPHER_MIN_MWL
                            or ns_chars > n_words * GOPHER_MAX_MWL),
        f_symbol_ratio=int(sym_n * 100 > n_words * GOPHER_SYM_PCT),
        f_bullet_lines=int(bullet_n * 100 >= n_lines * GOPHER_BULLET_PCT),
        f_ellipsis_lines=int(ell_n * 100 >= n_lines * GOPHER_ELLIPSIS_PCT),
        f_low_alpha=int(alpha_n * 100 < n_words * GOPHER_ALPHA_PCT),
        f_few_stopwords=int(stop_distinct < GOPHER_MIN_STOPWORDS),
    )
    flags["keep"] = int(sum(flags.values()) == 0)
    flags["n_words"] = n_words
    return flags


def test_gopher_rules_match_python_twin_on_seeded_adversarial_docs(
        spark, tmp_path):
    """200 seeded random docs mixing words, stop words, bullets,
    ellipses, symbols, unicode marks, newlines and empty lines —
    every per-doc flag must match the pure-Python rule math exactly
    (catches engine-vs-python regex or threshold drift)."""
    import random
    rng = random.Random(20240814)
    vocab = ["the", "and", "zebra", "qq", "x9", "...", "#", "…",
             "payload", "of", "data", "—", "12345", "a" * 30, "•"]
    docs = []
    for i in range(200):
        n_lines = rng.randint(1, 6)
        lines = []
        for _ in range(n_lines):
            n_w = rng.randint(1, 40)
            ws = [rng.choice(vocab) for _ in range(n_w)]
            if rng.random() < 0.3:
                ws.insert(0, rng.choice(["-", "*", "•"]))
            if rng.random() < 0.3:
                ws.append(rng.choice(["...", "…"]))
            lines.append(" ".join(ws))
        docs.append((i, "\n".join(lines), "en", "s", 0))
    out = _run(spark, docs, tmp_path)
    assert len(out) == 200
    mismatches = []
    for i, text, *_ in docs:
        want = _py_gopher(text)
        got = out[i]
        for f, v in want.items():
            if getattr(got, f) != v:
                mismatches.append((i, f, getattr(got, f), v))
    assert not mismatches, mismatches[:5]
