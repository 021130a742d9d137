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
