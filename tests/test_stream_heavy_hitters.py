"""Streaming Misra-Gries heavy hitters: bounded per-shard state must
surface every true heavy hitter with the n/(C+1) error guarantee,
across micro-batch boundaries (state survives between batches)."""

from collections import Counter

from big_data_crypto_sentiment_spark.streaming.heavy_hitters import (
    mg_update,
    streaming_heavy_hitters,
)


def test_mg_update_guarantee_pure_python():
    """Classic MG bound on a skewed synthetic stream (no Spark)."""
    summary: dict[str, int] = {}
    cap = 16
    for k in (["hot"] * 500 + ["warm"] * 200
              + [f"cold{i}" for i in range(300)]):
        mg_update(summary, k, cap)
    n = 1000
    exact = Counter(["hot"] * 500 + ["warm"] * 200
                    + [f"cold{i}" for i in range(300)])
    assert len(summary) <= cap
    for k in ("hot", "warm"):  # true count > n/(cap+1) ~ 59
        assert k in summary
        assert exact[k] - n / (cap + 1) <= summary[k] <= exact[k]


def test_streaming_heavy_hitters_across_batches(spark, tmp_path):
    rows1 = ([("AAA",)] * 60 + [(f"u{i}",) for i in range(40)])
    rows2 = ([("AAA",)] * 40 + [("BBB",)] * 30
             + [(f"v{i}",) for i in range(30)])
    schema = "key_raw string"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema("key_raw string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_heavy_hitters(stream, "key_raw",
                                  capacity=16, n_shards=4)
    q = (out.writeStream.format("memory").queryName("hh")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        # memory sink in update mode appends updated rows; keep the
        # LAST emission per (shard, key)
        rows = spark.sql(
            "SELECT shard, key, est_count, n_shard FROM hh").collect()
    finally:
        q.stop()
    # final emission per shard = rows carrying that shard's max n_shard
    # (monotone per shard) — robust to the memory sink's row order,
    # which is not contractual
    n_by_shard = {}
    for r in rows:
        n_by_shard[r.shard] = max(n_by_shard.get(r.shard, 0), r.n_shard)
    est = {}
    for r in rows:
        if r.n_shard == n_by_shard[r.shard] and r.key is not None:
            est[r.key] = est.get(r.key, 0) + r.est_count
    n = sum(n_by_shard.values())
    assert n == 200
    exact = Counter([k for (k,) in rows1 + rows2])
    # every key with count > n/(C+1) per its shard must be present;
    # AAA (100) and BBB (30) dominate any shard bound (200/17 ~ 12)
    for k in ("AAA", "BBB"):
        assert k in est
        assert exact[k] - n / (16 + 1) <= est[k] <= exact[k]
