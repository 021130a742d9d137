"""N-gram language identification (queries/text.py q_text_langid_ngram,
Cavnar & Trenkle rank-order trigram profiles). The registry pair is
hash-checked against DuckDB at all three SFs, but the fixture corpus
draws every "language" from the SAME token vocabulary — these tests
plant two genuinely distinct scripts and pin that the classifier
recovers the labels from content alone."""


def _run(spark, docs_rows, tmp_path):
    from big_data_crypto_sentiment_spark.queries.text import (
        q_text_langid_ngram,
    )
    df = spark.createDataFrame(
        docs_rows, "doc_id long, text string, lang string, "
                   "source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_text_langid_ngram(spark, str(tmp_path))
    assert out.columns == ["doc_id", "lang", "pred_lang", "oop_distance"]
    return {r.doc_id: r for r in out.collect()}


def test_langid_recovers_planted_scripts(spark, tmp_path):
    # two disjoint character distributions -> disjoint trigram profiles
    a_words = ["alpha", "badge", "cable", "dance", "eagle"]
    b_words = ["zesty", "xenon", "yummy", "woozy", "vexed"]
    rows = []
    for i in range(8):
        ta = " ".join(a_words[(i + j) % 5] for j in range(30))
        tb = " ".join(b_words[(i + j) % 5] for j in range(30))
        rows.append((i, ta, "aa", "s", len(ta)))
        rows.append((100 + i, tb, "zz", "s", len(tb)))
    got = _run(spark, rows, tmp_path)
    assert len(got) == 16                      # one verdict per doc
    for r in got.values():
        assert r.pred_lang == r.lang, (r.doc_id, r.pred_lang, r.lang)
        assert r.oop_distance >= 0


def test_langid_short_and_empty_docs_drop_identically(spark, tmp_path):
    # < 3 chars after normalization -> no trigrams -> no verdict row
    # (same pre-filter the oracle SQL applies)
    rows = [
        (1, "hi", "en", "s", 2),
        (2, "", "en", "s", 0),
        (3, "a solid document with enough text to profile "
            "a solid document with enough text to profile", "en", "s", 90),
    ]
    got = _run(spark, rows, tmp_path)
    assert set(got) == {3}


def test_langid_distance_is_rank_exact(spark, tmp_path):
    # a single-language corpus: every doc's best candidate is that
    # language, and a doc whose trigram ranking mirrors the corpus
    # ranking scores strictly lower than a doc that disturbs it
    common = "the quick brown fox jumps over the lazy dog "
    rows = [(i, common * 6, "en", "s", 0) for i in range(1, 10)]
    rows.append((99, (common * 3) + ("zzzzqqqq " * 12), "en", "s", 0))
    got = _run(spark, rows, tmp_path)
    assert all(r.pred_lang == "en" for r in got.values())
    # the nine profile-conforming docs all score strictly below the
    # disturbed one
    assert max(got[i].oop_distance
               for i in range(1, 10)) < got[99].oop_distance
