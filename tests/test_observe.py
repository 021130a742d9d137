"""Streaming observability (streaming/observe.py): progress reports
become a queryable frame with per-batch row counts, and observe()
metrics ride each micro-batch report without a second pass."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.streaming.observe import (
    observed,
    progress_frame,
)

SCHEMA = "event_time timestamp, symbol string, price double"
T0 = datetime(2024, 1, 1)


def test_progress_frame_and_observed_metrics(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(T0 + timedelta(seconds=i), "BTC", float(i)) for i in range(7)]
    bad = [(T0 + timedelta(seconds=99), "BTC", None)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
         .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    mon = observed(stream, "dq",
                   F.count(F.lit(1)).alias("rows"),
                   F.count(F.when(F.col("price").isNull(), 1))
                    .alias("null_prices"))
    q = (mon.writeStream.format("memory").queryName("obs_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(bad, SCHEMA).coalesce(1) \
             .write.mode("append").parquet(src)
        q.processAllAvailable()
        pf = progress_frame(spark, q).filter(F.col("num_input_rows") > 0)
        got = {r.batch_id: (r.num_input_rows, r.observed)
               for r in pf.collect()}
    finally:
        q.stop()
    assert len(got) == 2
    (b0, (n0, m0)), (b1, (n1, m1)) = sorted(got.items())
    assert (n0, n1) == (7, 1)
    assert '"null_prices":0' in m0.replace(" ", "")
    assert '"null_prices":1' in m1.replace(" ", "")
