"""M6/M7 MLlib pipelines: TF-IDF ridge recovers word→label structure;
permutation importance ranks informative features above noise."""

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.ml_pipelines import (
    fit_tfidf_ridge,
    ridge_permutation_importance,
    top_terms,
)


def test_tfidf_ridge_learns_lexicon_target(spark):
    """Label = lexicon polarity of the doc text; the fitted model must
    assign its largest positive coefficients to the positive words."""
    from big_data_crypto_sentiment_spark.queries.ml import (
        q_ml_lexicon_sentiment,
    )
    from big_data_crypto_sentiment_spark.queries._util import table
    sf = "/root/testdata/sf0.01"
    docs = table(spark, sf, "documents").select("doc_id", "text")
    labels = q_ml_lexicon_sentiment(spark, sf).select("doc_id", "polarity")
    train = docs.join(labels, "doc_id").withColumnRenamed("polarity", "label")
    model, vocab = fit_tfidf_ridge(train)
    terms = top_terms(model, vocab, k=3)
    pos_terms = {t for t, c, sign in terms if sign == "positive"}
    neg_terms = {t for t, c, sign in terms if sign == "negative"}
    # POS_WORDS/NEG_WORDS from the lexicon drive the label
    assert pos_terms & {"fast", "big"}
    assert neg_terms & {"slow", "small"}
    # in-sample fit is meaningfully better than predicting the mean
    pred = model.transform(train)
    stats = pred.select(
        F.corr("label", "prediction").alias("r")).first()
    assert stats.r is not None and stats.r > 0.7


def test_permutation_importance_ranks_signal_over_noise(spark):
    """y = 3·x1 + 0.1·noise-free structure: permuting x1 must hurt much
    more than permuting the irrelevant column."""
    n = 500
    df = (spark.range(n).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("x1"),
        ((F.col("id") * 31) % 101).cast("double").alias("x_noise"),
    ).withColumn("y", 3.0 * F.col("x1") + 0.01 * F.col("x_noise")))
    res = {c: imp for c, base, mse, imp in
           ridge_permutation_importance(df, ["x1", "x_noise"], "y", "id")}
    assert res["x1"] > 100 * max(res["x_noise"], 1e-9)


def test_sentiment_model_agrees_with_lexicon(spark):
    """M1 upstream: the fitted text→probability pipeline must label
    planted strongly-polar docs correctly and broadly agree with its
    lexicon teacher on the fixture corpus."""
    from pyspark.ml.functions import vector_to_array
    from big_data_crypto_sentiment_spark.ml_pipelines import (
        SENTIMENT_CLASSES, fit_sentiment_pipeline,
    )
    from big_data_crypto_sentiment_spark.queries.ml import (
        q_ml_lexicon_sentiment, q_ml_sentiment_model,
        score_sentiment_model,
    )
    from big_data_crypto_sentiment_spark.queries._util import table
    sf = "/root/testdata/sf0.01"
    docs = table(spark, sf, "documents").select("doc_id", "text")
    labels = (q_ml_lexicon_sentiment(spark, sf)
              .select("doc_id",
                      F.when(F.col("lexicon_label") == "NEGATIVE", 0)
                       .when(F.col("lexicon_label") == "NEUTRAL", 1)
                       .otherwise(2).cast("double").alias("label")))
    model = fit_sentiment_pipeline(docs.join(labels, "doc_id"))

    planted = spark.createDataFrame(
        [(1, "fast big fast big fast"), (2, "slow small slow small slow")],
        "doc_id long, text string")
    p = vector_to_array("probability")
    pred = (F.when(p[2] >= F.greatest(p[0], p[1]), 2)
             .when(p[1] >= p[0], 1).otherwise(0))
    out = {r.doc_id: SENTIMENT_CLASSES[int(r.pred)] for r in
           model.transform(planted)
                .select("doc_id", pred.alias("pred")).collect()}
    assert out[1] == "POSITIVE" and out[2] == "NEGATIVE"

    scored = score_sentiment_model(spark, sf).persist()
    agree = (scored.select("doc_id", "sentiment_label")
             .join(q_ml_lexicon_sentiment(spark, sf), "doc_id")
             .select(F.avg((F.col("sentiment_label") == F.col("lexicon_label"))
                           .cast("int")).alias("acc")).first().acc)
    assert agree > 0.8
    # probabilities are a proper distribution (reuse the scored DF — a
    # second score_sentiment_model call would refit the whole pipeline)
    row = scored.first()
    assert abs(row.p_neg + row.p_neu + row.p_pos - 1.0) < 1e-4
    # the graduated registered surface: exact teacher counts + the
    # live agreement flag asserted (r15)
    reg = q_ml_sentiment_model(spark, sf).first()
    assert reg.n_docs == (reg.n_teacher_positive + reg.n_teacher_neutral
                          + reg.n_teacher_negative)
    assert reg.student_agree_ge_min == 1
    scored.unpersist()


def test_permutation_is_deterministic(spark):
    from big_data_crypto_sentiment_spark.ml_pipelines import _permuted
    df = spark.range(500).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("v"))
    a = _permuted(df, "id", "v").orderBy("id").collect()
    b = _permuted(df, "id", "v").orderBy("id").collect()
    assert a == b
    # it is a real permutation: same multiset, mostly different positions
    orig = [r.v for r in df.orderBy("id").collect()]
    perm = [r.v for r in a]
    assert sorted(perm) == sorted(orig)
    assert sum(x == y for x, y in zip(orig, perm)) < len(orig) // 2


def test_no_global_window_sorts_in_source():
    """Scale guard: a Window.orderBy without partitionBy funnels the whole
    table through one task. Nothing in the package may do it."""
    import pathlib
    pkg = pathlib.Path(__file__).resolve().parents[1] / \
        "big_data_crypto_sentiment_spark"
    offenders = [p for p in pkg.rglob("*.py")
                 if "Window.orderBy(" in p.read_text()]
    assert offenders == [], f"global-sort windows in: {offenders}"


def test_temporal_cv_folds_are_time_ordered_no_leakage(spark):
    """M6 temporal CV contract (the TimeSeriesSplit(5) analog): every
    fold trains only on rows at or before its cut and tests on the
    strictly-later block; test blocks are disjoint, consecutive, and
    cover everything after the first cut; MAE is finite per fold."""
    from big_data_crypto_sentiment_spark.ml_pipelines import (
        temporal_cv_boundaries,
        temporal_cv_tfidf_ridge,
    )
    words = ["up good gain", "down bad loss", "flat hold steady"]
    rows = [(i, words[i % 3] + f" tok{i % 7}", float(i % 3) - 1.0)
            for i in range(240)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "label double")
    cuts = temporal_cv_boundaries(docs, "doc_id", n_folds=5)
    assert cuts == sorted(cuts) and len(cuts) == 6
    assert cuts[-1] == 239  # last cut is the max: folds cover the tail
    folds = temporal_cv_tfidf_ridge(docs, "doc_id", n_folds=5)
    assert [f for f, *_ in folds] == [1, 2, 3, 4, 5]
    total_test = 0
    for i, (fold, n_train, n_test, train_end, mae) in enumerate(folds):
        # train strictly precedes test: the boundary IS the train max
        assert train_end == cuts[i]
        assert n_train == docs.filter(f"doc_id <= {cuts[i]}").count()
        assert n_test == docs.filter(
            f"doc_id > {cuts[i]} AND doc_id <= {cuts[i+1]}").count()
        assert n_test > 0 and mae == mae and mae >= 0.0  # finite
        total_test += n_test
    # disjoint + consecutive: test blocks tile (cuts[0], max] exactly
    assert total_test == docs.filter(f"doc_id > {cuts[0]}").count()
    # expanding window: each fold trains on strictly more history
    trains = [n for _, n, *_ in folds]
    assert trains == sorted(trains) and trains[0] < trains[-1]


def test_temporal_cv_approx_cuts(spark):
    """The 100 TB cut path (VERDICT r15 #8): `_cv_rank_cuts(approx=True)`
    produces GK-sketch approxQuantile fold boundaries in one
    bounded-memory pass — no exact rank walk, no per-range value
    collect — and `temporal_cv_tfidf_ridge` accepts them while
    preserving the no-future-leakage contract (train strictly precedes
    test under the same <= / > boundary discipline; test blocks tile
    everything after the first cut)."""
    from big_data_crypto_sentiment_spark.ml_pipelines import (
        temporal_cv_tfidf_ridge,
    )
    from big_data_crypto_sentiment_spark.queries.ml import _cv_rank_cuts
    words = ["up good gain", "down bad loss", "flat hold steady"]
    rows = [(i, words[i % 3] + f" tok{i % 7}", float(i % 3) - 1.0)
            for i in range(240)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "label double")
    cuts = _cv_rank_cuts(docs, "doc_id", n_folds=5, approx=True)
    assert cuts == sorted(cuts) and len(cuts) == 6
    # approx and exact boundaries agree within the sketch's rank error
    exact = _cv_rank_cuts(docs, "doc_id", n_folds=5)
    assert all(abs(a - e) <= 240 * 0.01 + 1
               for a, e in zip(cuts, exact))
    folds = temporal_cv_tfidf_ridge(docs, "doc_id", n_folds=5,
                                    cuts=cuts)
    assert [f for f, *_ in folds] == [1, 2, 3, 4, 5]
    total_test = 0
    for i, (fold, n_train, n_test, train_end, mae) in enumerate(folds):
        assert train_end == cuts[i]  # the boundary IS the train max
        assert n_train == docs.filter(f"doc_id <= {cuts[i]}").count()
        assert n_test == docs.filter(
            f"doc_id > {cuts[i]} AND doc_id <= {cuts[i+1]}").count()
        assert n_test > 0 and mae == mae and mae >= 0.0
        total_test += n_test
    assert total_test == docs.filter(f"doc_id > {cuts[0]}").count()


def test_lda_separates_planted_disjoint_topics(spark):
    """Topic-discovery contract: two corpora with DISJOINT vocabularies
    must land in different dominant topics, consistently within each
    corpus; the topic term lists reflect the split."""
    from big_data_crypto_sentiment_spark.ml_pipelines import fit_topics
    a_words = ["market", "price", "trade", "coin", "chart"]
    b_words = ["pasta", "sauce", "oven", "basil", "garlic"]
    rows = []
    for i in range(60):
        w = a_words if i % 2 == 0 else b_words
        text = " ".join(w[(i + j) % 5] for j in range(12))
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    doc_topics, terms, vocab = fit_topics(docs, k=2, seed=11,
                                          max_iter=25, subsampling=1.0)
    got = {r.doc_id: (r.topic, r.topic_weight)
           for r in doc_topics.collect()}
    assert len(got) == 60
    a_topics = {got[i][0] for i in range(0, 60, 2)}
    b_topics = {got[i][0] for i in range(1, 60, 2)}
    assert len(a_topics) == 1 and len(b_topics) == 1
    assert a_topics != b_topics
    assert all(0.5 < w <= 1.0 for _, w in got.values())
    # each topic's top terms come from its own corpus' vocabulary
    by_topic = dict(terms)
    assert set(by_topic[a_topics.pop()][:5]) <= set(a_words)
    assert set(by_topic[b_topics.pop()][:5]) <= set(b_words)
