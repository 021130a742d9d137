"""Deterministic sampling properties: stability, exact quotas, and
leakage-free splits."""

from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries._util import table
from big_data_crypto_sentiment_spark.queries.sampling import (
    SAMPLE_RATE_PPM,
    STRATUM_QUOTA,
    sample_hash,
    sample_stratified,
    split_train_val_test,
)

SF_DIR = "/root/testdata/sf0.001"


def test_sample_is_deterministic_and_growth_stable(spark):
    d = table(spark, SF_DIR, "documents")
    ids1 = {r.doc_id for r in sample_hash(d, "doc_id", SAMPLE_RATE_PPM)
            .select("doc_id").collect()}
    ids2 = {r.doc_id for r in sample_hash(d, "doc_id", SAMPLE_RATE_PPM)
            .select("doc_id").collect()}
    assert ids1 == ids2 and ids1
    # membership depends only on the row's own key: sampling a filtered
    # corpus yields exactly the intersection (what makes the sample
    # stable as the corpus grows)
    half = d.filter(F.col("doc_id") % 2 == 0)
    ids_half = {r.doc_id for r in sample_hash(half, "doc_id", SAMPLE_RATE_PPM)
                .select("doc_id").collect()}
    assert ids_half == {i for i in ids1 if i % 2 == 0}


def test_sample_rate_within_binomial_bounds(spark):
    d = table(spark, SF_DIR, "documents")
    n = d.count()
    k = sample_hash(d, "doc_id", SAMPLE_RATE_PPM).count()
    p = SAMPLE_RATE_PPM / 1_000_000
    # 5 sigma on a binomial(n, p)
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(k - n * p) < 5 * sigma + 1


def test_stratified_exact_quota_per_stratum(spark):
    d = table(spark, SF_DIR, "documents")
    got = (sample_stratified(d, "source", "doc_id", STRATUM_QUOTA)
           .groupBy("source").agg(F.count("*").alias("n"),
                                  F.max("sample_rank").alias("mx"))
           .collect())
    avail = {r.source: r.n for r in
             d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert {r.source for r in got} == set(avail)
    for r in got:
        expect = min(STRATUM_QUOTA, avail[r.source])
        assert r.n == expect == r.mx


def test_split_partitions_every_row_exactly_once(spark):
    d = table(spark, SF_DIR, "documents")
    s = split_train_val_test(d, "doc_id")
    counts = {r.split: r.n for r in
              s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == d.count()
    assert set(counts) == {"train", "val", "test"}
    # a key always lands in the same split — rerun and diff
    again = split_train_val_test(d, "doc_id")
    assert (s.select("doc_id", "split")
             .exceptAll(again.select("doc_id", "split")).count()) == 0
    assert counts["train"] > counts["val"] + counts["test"]


def test_mixture_downsample_caps_every_source(spark):
    from big_data_crypto_sentiment_spark.queries.sampling import (
        mixture_downsample,
    )
    d = table(spark, SF_DIR, "documents")
    out = mixture_downsample(d, "source", "doc_id")
    n_sources = d.select("source").distinct().count()
    cap = d.count() // (2 * n_sources)
    got = {r.source: r.n for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # expected cap docs per source; 5-sigma binomial slack on each
    for src, n in got.items():
        assert n <= cap + 5 * cap ** 0.5 + 1, (src, n, cap)
    # deterministic
    again = mixture_downsample(d, "source", "doc_id")
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_c4_filter_keep_iff_no_flags(spark):
    from big_data_crypto_sentiment_spark.queries.text import q_text_c4_filter
    rows = q_text_c4_filter(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        flags = r.f_too_short + r.f_low_stopword + r.f_high_punct + r.f_cta_spam
        assert r.keep == (1 if flags == 0 else 0)


def test_key_skew_profile_shares_and_factor(spark):
    from big_data_crypto_sentiment_spark.queries.relational import (
        q_key_skew_profile,
    )
    rows = q_key_skew_profile(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    assert rows == sorted(rows, key=lambda r: (-r.n_events, r.user_id))
    # the heaviest key is at or above the mean; shares are valid ppm and
    # consistent with skew_factor (share · n_keys == factor · 1e6)
    assert rows[0].skew_factor >= 1.0
    for r in rows:
        assert 0 <= r.share_ppm <= 1_000_000
        assert abs(r.share_ppm * r.n_keys - r.skew_factor * 1_000_000) < 2 * r.n_keys


def test_split_is_invariant_to_partitioning(spark):
    """The leakage-free claim: a doc's split depends only on its id, so
    ANY physical layout yields byte-identical assignments."""
    from big_data_crypto_sentiment_spark.queries.sampling import (
        split_train_val_test,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split
         for r in split_train_val_test(df, "doc_id").collect()}
    b = {r.doc_id: r.split
         for r in split_train_val_test(df.repartition(7), "doc_id")
         .collect()}
    c = {r.doc_id: r.split
         for r in split_train_val_test(df.coalesce(1), "doc_id").collect()}
    assert a == b == c


def test_dsir_prefers_target_like_docs(spark):
    """DSIR importance weights must rank raw docs written in the target
    distribution's vocabulary above dissimilar docs: with a wide
    log-ratio gap the Gumbel perturbation (|g| <~ 7 for 2^20 hash
    grid) cannot flip the ordering."""
    from pyspark.sql import functions as F
    from big_data_crypto_sentiment_spark.queries.sampling import (
        dsir_model,
        dsir_select,
    )
    tgt_text = "alpha beta gamma delta " * 10
    junk_text = "zzz qqq xxx www " * 10
    rows = (
        [(i, tgt_text) for i in range(10)]            # target slice
        + [(100 + i, tgt_text) for i in range(5)]     # target-like raw
        + [(200 + i, junk_text) for i in range(20)]   # dissimilar raw
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    is_t = F.col("doc_id") < 100
    diff8 = dsir_model(docs, is_t)
    got = dsir_select(docs, diff8, is_t, k=5).collect()
    assert {r.doc_id for r in got} == {100, 101, 102, 103, 104}
    assert all(r.logw8 > 0 for r in got)


def test_temperature_sampling_flattens_mixture(spark):
    """alpha < 1 must keep a HIGHER fraction of small sources than big
    ones (the whole point of temperature reweighting), and every
    threshold stays within [0, mod]."""
    from big_data_crypto_sentiment_spark.queries.sampling import (
        SAMPLE_MOD,
        temperature_thresholds,
    )
    rows = ([(i, "big") for i in range(900)]
            + [(1000 + i, "small") for i in range(300)])
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    thr = temperature_thresholds(df, "source", alpha=0.5)
    assert set(thr) == {"big", "small"}
    assert all(0 <= t <= SAMPLE_MOD for t in thr.values())
    # keep fraction = thr/mod: in the uncapped regime the rate ratio is
    # (n_big/n_small)^(1-alpha) = sqrt(3) ~ 1.732
    ratio = thr["small"] / thr["big"]
    assert 1.6 < ratio < 1.85
