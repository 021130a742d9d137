"""Pins for the r11 review fixes (ADVICE r10):

1. The streaming run id is bound to the checkpoint INSTANCE — deleting
   and recreating the checkpoint at the same path (a standard stream
   reset) must yield a FRESH run id, so the reset run's epoch 0 cannot
   collide with the old run's gen_b_<run>-0 generation and be silently
   dropped as a "replay".
2. The stored-index query dedup is DETERMINISTIC: when the same vec_id
   lives in two live generations with different cids (re-ingest after a
   retrain — nothing enforces against it), the full generation's row
   wins, every run.
3. Each verdict epoch records the centroid generation it was computed
   under (_CENTROID_GEN), so a replay repaired after a maintenance pass
   is detectable post-hoc.
"""

import os
import shutil

from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.jobs._genstore import (
    run_id_for_checkpoint,
)
from big_data_crypto_sentiment_spark.jobs.ann_index import (
    _live_gens,
    append_vectors,
    build_index,
    index_stats,
    query_index,
    read_assignments_dedup,
)
from big_data_crypto_sentiment_spark.streaming.ann_stream import (
    CENTROID_GEN_MARKER,
    ann_ingest_batch_writer,
    start_ann_ingest_sink,
)

SF = "/root/testdata/sf0.001"
VEC_SCHEMA = "vec_id bigint, embedding array<float>"


def _corpus(spark):
    from big_data_crypto_sentiment_spark.catalog import load
    return load(spark, "embeddings", SF).select("vec_id", "embedding")


def test_run_id_is_stable_within_and_fresh_across_checkpoint_instances(
        tmp_path):
    ck = str(tmp_path / "ck")
    rid1 = run_id_for_checkpoint(ck)
    assert run_id_for_checkpoint(ck) == rid1      # stable within
    assert os.path.exists(os.path.join(ck, "RUN_ID"))
    shutil.rmtree(ck)                             # the stream reset
    rid2 = run_id_for_checkpoint(ck)
    assert rid2 != rid1                           # fresh across


def test_checkpoint_reset_does_not_drop_batches_as_replays(
        spark, tmp_path):
    """End-to-end ADVICE scenario: ingest run 1, DELETE the checkpoint,
    recreate it at the SAME path for run 2. Under the old
    md5(path)-derived run id, run 2's epoch 0 collided with run 1's
    gen_b_<run>-0 and the batch was silently dropped; with the
    instance-bound id the second run's vectors land."""
    c = _corpus(spark)
    base = c.filter(F.col("vec_id") < 300)
    b1 = c.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    b2 = c.filter(F.col("vec_id") >= 400)
    idx, ck = str(tmp_path / "index"), str(tmp_path / "ck")
    build_index(spark, base, idx, k=8, seed=42)

    def drain(src, df):
        df.selectExpr(
            "vec_id", "cast(embedding as array<float>) embedding") \
          .coalesce(1).write.mode("append").parquet(src)
        stream = (spark.readStream.schema(VEC_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_ann_ingest_sink(stream, idx, ck)
        try:
            q.awaitTermination()
        finally:
            q.stop()

    drain(str(tmp_path / "srcA"), b1)
    assert index_stats(spark, idx)["vectors"] == 400
    shutil.rmtree(ck)                  # standard stream reset
    drain(str(tmp_path / "srcB"), b2)  # epoch counter restarts at 0
    s = index_stats(spark, idx)
    assert s["vectors"] == 500 and s["rows"] == 500


def test_query_dedup_prefers_full_generation_row(spark, tmp_path):
    c = _corpus(spark)
    base = c.filter(F.col("vec_id") < 300)
    idx = str(tmp_path / "index")
    build_index(spark, base, idx, k=8, seed=42)
    full, _ = _live_gens(idx)
    orig = {r.vec_id: (list(r.embedding), r.cid)
            for r in spark.read.parquet(
                os.path.join(full, "assignments"))
            .filter(F.col("vec_id") < 3).collect()}

    # re-ingest vec_ids 0..2 with DIFFERENT embeddings (borrowed from
    # far-away vectors) so their append rows assign to other cids
    donors = c.filter((F.col("vec_id") >= 500) & (F.col("vec_id") < 503))
    conflict = donors.withColumn(
        "vec_id", F.col("vec_id") - F.lit(500))
    append_vectors(spark, idx, conflict, batch_id="conflict")

    picked = {r.vec_id: (list(r.embedding), r.cid)
              for r in read_assignments_dedup(spark, idx)
              .filter(F.col("vec_id") < 3).collect()}
    assert picked == orig              # full generation's row wins
    # and the pick is stable across runs (the nondeterminism ADVICE
    # flagged would flip cids between invocations)
    picked2 = {r.vec_id: (list(r.embedding), r.cid)
               for r in read_assignments_dedup(spark, idx)
               .filter(F.col("vec_id") < 3).collect()}
    assert picked2 == picked

    # ranking consumers see exactly one row per vec_id
    qs = base.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"))
    r1 = sorted((r.query_id, r.rank, r.vec_id)
                for r in query_index(spark, idx, qs, 5).collect())
    assert len({(q, v) for q, _, v in r1}) == len(r1)
    r2 = sorted((r.query_id, r.rank, r.vec_id)
                for r in query_index(spark, idx, qs, 5).collect())
    assert r1 == r2


def test_verdict_epoch_records_centroid_generation(spark, tmp_path):
    c = _corpus(spark)
    base = c.filter(F.col("vec_id") < 300)
    b1 = c.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350))
    idx, vdir = str(tmp_path / "index"), str(tmp_path / "verdicts")
    build_index(spark, base, idx, k=8, seed=42)
    process = ann_ingest_batch_writer(idx, vdir, k=2)
    process(b1, 0)
    full, _ = _live_gens(idx)
    marker = os.path.join(vdir, "epoch=0", CENTROID_GEN_MARKER)
    with open(marker) as f:
        assert f.read() == os.path.basename(full)


def test_area_resample_conserves_mass_and_constants():
    """Properties that hold for ANY dims: a constant image resamples
    to exactly that constant (box weights sum to 1), and total mass is
    conserved (sum(out)·(s/t) per axis == sum(in)) — checked across a
    sweep of source/target shapes including non-divisible ratios."""
    import numpy as np

    from big_data_crypto_sentiment_spark.operators.multimodal import (
        _area_reduce,
        area_resample,
    )
    rng_vals = np.arange(97 * 61, dtype=np.int64) * 37 % 256
    for (sh, sw, th, tw) in [(8, 8, 3, 5), (10, 7, 7, 10), (97, 61, 9, 4),
                             (5, 5, 5, 5), (16, 16, 1, 1), (3, 2, 2, 3)]:
        img = rng_vals[:sh * sw].astype(np.uint8).reshape(sh, sw, 1)
        const = np.full((sh, sw, 1), 137, dtype=np.uint8)
        assert (area_resample(const, tw, th) == 137).all(), (sh, sw)
        red = _area_reduce(_area_reduce(img, th, 0), tw, 1)
        mass_out = red.sum() * (sh / th) * (sw / tw)
        assert abs(mass_out - img.astype(np.float64).sum()) < 1e-6
