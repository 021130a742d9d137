"""Sketch accuracy bounds: estimates must sit within standard error of
exact values, and merged daily sketches must match a global sketch."""

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries.approx import (
    q_approx_distinct_users,
    q_approx_quantiles,
    q_hll_mergeable_distinct,
)

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_error(spark):
    """The raw HLL++ estimate stays within standard error of exact
    (pinned directly — the query emits only the flag), and the
    graduated query's bounded-error assertion fires for every group."""
    from big_data_crypto_sentiment_spark.queries._util import table
    ev = table(spark, SF, "events")
    for r in (ev.groupBy("event_type")
                .agg(F.approx_count_distinct("user_id").alias("a"),
                     F.countDistinct("user_id").alias("e")).collect()):
        assert r.a == pytest.approx(r.e, rel=0.05)
    for r in q_approx_distinct_users(spark, SF).collect():
        assert r.approx_in_bound == 1
        assert r.exact_users > 0


def test_merged_sketch_close_to_true_distinct(spark):
    from big_data_crypto_sentiment_spark.queries._util import table
    ev = table(spark, SF, "events")
    # raw accuracy, pinned directly at rel 5%
    est = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id").alias("sk"))
             .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")))
             .first()[0])
    truth = ev.agg(F.countDistinct("user_id")).first()[0]
    assert est == pytest.approx(truth, rel=0.05)
    row = q_hll_mergeable_distinct(spark, SF).first()
    assert row.exact_global == truth
    assert row.merged_in_bound == 1
    # merging deduplicates across days; naive summing does not
    assert row.daily_sum_ge_global == 1
    assert row.sum_daily_exact >= truth


def test_approx_median_close_to_exact(spark):
    """Raw sketch accuracy pinned directly; the graduated query's
    rank-window assertion fires per group and the cent-exact median
    encoding is self-consistent."""
    from big_data_crypto_sentiment_spark.queries._util import table
    li = table(spark, SF, "lineitem")
    for r in (li.groupBy("l_returnflag")
                .agg(F.percentile_approx(
                         F.col("l_extendedprice").cast("double"),
                         0.5, 10000).alias("a"),
                     F.expr("percentile(CAST(l_extendedprice AS DOUBLE)"
                            ", 0.5)").alias("e")).collect()):
        assert r.a == pytest.approx(r.e, rel=0.01)
    for r in q_approx_quantiles(spark, SF).collect():
        assert r.approx_in_bound == 1
        assert r.median_x200 > 0 and r.n_rows > 0


def test_cms_never_underestimates_and_respects_eps_bound(spark):
    from big_data_crypto_sentiment_spark.queries.approx import cms_estimates
    # skewed stream: key k appears 100*(k+1) times, k in 0..9 -> N=5500
    rows = [(k,) for k in range(10) for _ in range(100 * (k + 1))]
    df = spark.createDataFrame(rows, "k long")
    exact = {k: 100 * (k + 1) for k in range(10)}
    est = cms_estimates(df, "k", list(range(10)), eps=0.01)
    n = sum(exact.values())
    for k, e in est.items():
        assert e >= exact[k]                 # CMS never underestimates
        assert e <= exact[k] + 0.01 * n + 1  # eps*N overshoot bound


def test_cms_sketch_merges_across_partitions(spark):
    from big_data_crypto_sentiment_spark.queries.approx import cms_estimates
    # same data, 1 vs 8 partitions: the merged estimate must not depend
    # on how partial sketches were combined
    rows = [(k % 5,) for k in range(1000)]
    a = spark.createDataFrame(rows, "k long").coalesce(1)
    b = spark.createDataFrame(rows, "k long").repartition(8)
    assert cms_estimates(a, "k", [0, 1, 2, 3, 4]) == \
        cms_estimates(b, "k", [0, 1, 2, 3, 4])


def test_mg_batch_twin_bounds_and_presence(spark):
    """Batch Misra–Gries twin vs exact counts: every emitted estimate
    satisfies exact - n_shard/(C+1) <= est <= exact (the registry
    entry's explicit error-bound artifact), and the PRESENCE guarantee
    holds — every key whose true count exceeds its shard's n/(C+1)
    survives in the summary."""
    from big_data_crypto_sentiment_spark.queries._util import table
    from big_data_crypto_sentiment_spark.queries.approx import (
        MG_BATCH_CAPACITY,
        MG_BATCH_SHARDS,
        mg_batch_summary,
        mg_vs_exact_per_key,
        q_hh_mg_vs_exact,
    )
    from big_data_crypto_sentiment_spark.queries.sampling import (
        _hash_bucket,
    )
    sf = "/root/testdata/sf0.01"
    out = mg_vs_exact_per_key(spark, sf).collect()
    assert out and all(r.le_exact and r.within_bound for r in out)
    assert all(r.err_bound == r.n_shard // (MG_BATCH_CAPACITY + 1)
               for r in out)
    # graduated registry surface (r14): one row per shard, all
    # guarantee flags true, exact columns consistent with the per-key
    # frame it projects
    shards = q_hh_mg_vs_exact(spark, sf).collect()
    assert len(shards) == MG_BATCH_SHARDS
    for r in shards:
        assert (r.mg_size_le_capacity and r.all_heavy_survived
                and r.all_est_le_exact and r.all_est_within_bound
                and r.n_shard_consistent)
        assert r.err_bound == r.n_shard // (MG_BATCH_CAPACITY + 1)
        assert 0 <= r.n_heavy <= r.n_keys
    assert (sum(r.n_shard for r in shards)
            == sum({r2.shard: r2.n_shard for r2 in out}.values()))
    # presence: the fixture's users are near-uniform (nothing exceeds
    # n/(C+1)), so plant a heavy hitter — 3 skewed keys over 400
    # uniform-ish rows; every key above its shard's bound must survive
    rows = ([(9_000_001, i) for i in range(200)]          # heavy
            + [(9_000_002, 200 + i) for i in range(80)]
            + [(1000 + i % 120, 300 + i) for i in range(400)])
    skew = spark.createDataFrame(
        [(u, i, i) for u, i in rows], "user_id long, ts long, "
                                      "event_id long")
    summ = {(r.shard, r.key): r for r in
            mg_batch_summary(skew, "user_id",
                             ["ts", "event_id"]).collect()}
    exact = {(r.shard, r.key): r.n for r in
             skew.select(_hash_bucket(F.col("user_id"), MG_BATCH_SHARDS)
                         .cast("int").alias("shard"),
                         F.col("user_id").cast("string").alias("key"))
                 .groupBy("shard", "key").agg(F.count("*").alias("n"))
                 .collect()}
    n_shard = {}
    for (s, _), n in exact.items():
        n_shard[s] = n_shard.get(s, 0) + n
    must_be_present = {(s, k) for (s, k), n in exact.items()
                       if n > n_shard[s] / (MG_BATCH_CAPACITY + 1)}
    assert must_be_present and must_be_present <= set(summ)
    # the planted heavies survive with in-bound estimates
    for (s, k) in must_be_present:
        lo = exact[(s, k)] - n_shard[s] // (MG_BATCH_CAPACITY + 1)
        assert lo <= summ[(s, k)].est_count <= exact[(s, k)]
    # decrements actually fire on the fixture (the bound is exercised)
    assert any(r.est_count < r.exact_count for r in out)
    # determinism: a second run folds identical summaries
    again = {(r.shard, r.key): r.est_count
             for r in mg_batch_summary(
                 table(spark, sf, "events")
                 .filter(F.col("user_id").isNotNull())
                 .select("user_id", "ts", "event_id"),
                 "user_id", ["ts", "event_id"]).collect()}
    assert again == {(r.shard, r.key): r.est_count for r in out}
