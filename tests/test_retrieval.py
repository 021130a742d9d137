"""Sparse TF-IDF retrieval (queries/retrieval.py). The registry query is
hash-checked against DuckDB at three SFs by tools/check.py; these tests
pin the ranking semantics on constructed corpora."""

from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries.retrieval import (
    tfidf_idf_table,
    tfidf_topk,
)


def _topk(spark, rows, query_ids, k=3, max_df_frac=1.0):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idf, _ = tfidf_idf_table(docs, max_df_frac=max_df_frac)
    out = tfidf_topk(docs, idf, lambda c: c.isin(query_ids), k=k)
    return idf, out.collect()


def test_near_copy_ranks_first(spark):
    rows = [
        (1, "spark shuffles data between stages"),
        (2, "spark shuffles data between stages quickly"),  # near-copy of 1
        (3, "ducks swim on the quiet pond"),
        (4, "completely unrelated words entirely"),
    ]
    _, got = _topk(spark, rows, [1])
    assert got[0].query_id == 1 and got[0].doc_id == 2
    assert got[0].rank == 1 and got[0].cos > 0.8


def test_self_pair_excluded_and_k_bounds_output(spark):
    rows = [(i, "shared tokens everywhere always") for i in range(6)]
    _, got = _topk(spark, rows, [0], k=3)
    assert len(got) == 3
    assert all(r.doc_id != 0 for r in got)
    # identical docs tie at cos 1.0; tie-break is ascending doc_id
    assert [r.doc_id for r in got] == [1, 2, 3]


def test_max_df_cut_drops_ubiquitous_terms(spark):
    rows = [
        (1, "the alpha"),
        (2, "the beta"),
        (3, "the gamma"),
        (4, "the delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idf, _ = tfidf_idf_table(docs, max_df_frac=0.5)
    assert "the" not in idf  # df 4/4 > 0.5
    assert "alpha" in idf
    # with the stopword gone, docs share no terms: no pairs at all
    got = tfidf_topk(docs, idf, lambda c: c.isin([1])).collect()
    assert got == []


def test_vocab_cap_is_surfaced(spark):
    rows = [(1, "a b c d e f g h")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idf, truncated = tfidf_idf_table(docs, vocab_k=3)
    assert len(idf) == 3 and truncated


def test_zipf_plant_posting_lists_are_bounded(spark):
    """The Zipf-realistic entry must exercise the SCALE shape: the
    ubiquitous head ranks get cut by max_df_frac=0.5 and every surviving
    term's posting list (its df) stays under that bound — so the
    inverted-index join fan-out is sum-of-short-postings, never
    |Q|·|vocab|·N."""
    from pyspark.sql import functions as F

    from big_data_crypto_sentiment_spark.queries._util import table
    from big_data_crypto_sentiment_spark.queries.retrieval import (
        ZIPF_MAX_DF_FRAC,
        zipf_planted_docs,
    )

    d = zipf_planted_docs(
        table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id"))
    n = d.count()
    idf, _ = tfidf_idf_table(d, max_df_frac=ZIPF_MAX_DF_FRAC)
    # rank 1 ('z1') lands in ~half of all token slots -> present in
    # essentially every doc -> must be cut by the stopword bound
    assert "z1" not in idf
    assert len(idf) > 20  # a real multi-term power-law vocabulary
    df_by_term = {
        r.term: r.df
        for r in (d.select(F.explode(F.array_distinct(
                      F.split(F.col("text"), " "))).alias("term"))
                   .groupBy("term").agg(F.count("*").alias("df"))
                   .collect())}
    kept_dfs = [df_by_term[t] for t in idf]
    assert max(kept_dfs) <= ZIPF_MAX_DF_FRAC * n
