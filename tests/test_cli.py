"""The unified job launcher (python -m big_data_crypto_sentiment_spark):
dispatch table integrity + usage behavior, without launching Spark."""

import importlib
import subprocess
import sys


def test_every_job_module_imports_and_has_main():
    from big_data_crypto_sentiment_spark.__main__ import JOBS
    for name, (mod_name, _) in JOBS.items():
        mod = importlib.import_module(
            f"big_data_crypto_sentiment_spark.{mod_name}")
        assert callable(getattr(mod, "main")), name


def test_usage_on_unknown_job_and_help():
    out = subprocess.run(
        [sys.executable, "-m", "big_data_crypto_sentiment_spark", "nope"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 2
    assert "usage:" in out.stderr and "curate" in out.stderr
    ok = subprocess.run(
        [sys.executable, "-m", "big_data_crypto_sentiment_spark", "--help"],
        capture_output=True, text=True, cwd="/root/repo")
    assert ok.returncode == 0 and "jobs:" in ok.stderr


def test_dispatch_forwards_args_to_the_job_parser():
    # --help reaches each job's own argparse (prog renamed to the
    # dispatcher form) and exits 0 before any Spark session spins up
    from big_data_crypto_sentiment_spark.__main__ import JOBS
    for name in ("dedup-index", "ann-index", "curate",
                 "dedup-stream", "ann-ingest"):
        assert name in JOBS
        out = subprocess.run(
            [sys.executable, "-m", "big_data_crypto_sentiment_spark",
             name, "--help"],
            capture_output=True, text=True, cwd="/root/repo", timeout=60)
        assert out.returncode == 0, (name, out.stderr[-500:])
        assert f"big_data_crypto_sentiment_spark {name}" in out.stdout


def test_streaming_cli_mains_run_end_to_end(spark, tmp_path, monkeypatch):
    """The two streaming launcher jobs drain a parquet drop with
    availableNow and exit: ann-ingest commits one generation per file,
    dedup-stream writes epoch verdicts + index generations. In-process
    (get_spark getOrCreate rides the test session), real argv."""
    import sys

    from pyspark.sql import functions as F

    from big_data_crypto_sentiment_spark.catalog import load
    from big_data_crypto_sentiment_spark.jobs import ann_index as AI
    from big_data_crypto_sentiment_spark.jobs import dedup_index as DI
    from big_data_crypto_sentiment_spark.streaming import (
        ann_stream,
        dedup_stream,
    )

    sf = "/root/testdata/sf0.001"
    emb = load(spark, "embeddings", sf).select("vec_id", "embedding")
    idx = str(tmp_path / "ann")
    AI.build_index(spark, emb.filter(F.col("vec_id") < 400), idx,
                   k=8, seed=42)
    src = str(tmp_path / "vecs")
    emb.filter(F.col("vec_id") >= 400).coalesce(1) \
       .write.mode("append").parquet(src)
    monkeypatch.setattr(sys, "argv", [
        "ann-ingest", "--index-dir", idx, "--src", src,
        "--checkpoint", str(tmp_path / "ck1")])
    assert ann_stream.main() == 0
    assert AI.index_stats(spark, idx)["vectors"] == 500

    docs = load(spark, "documents", sf).select("doc_id", "text") \
        .filter(F.col("text").isNotNull())
    didx = str(tmp_path / "dedup")
    DI.build_index(spark, docs.filter(F.col("doc_id") < 400), didx)
    dsrc = str(tmp_path / "docs")
    docs.filter(F.col("doc_id") >= 400).coalesce(1) \
        .write.mode("append").parquet(dsrc)
    vdir = str(tmp_path / "verdicts")
    monkeypatch.setattr(sys, "argv", [
        "dedup-stream", "--index-dir", didx, "--src", dsrc,
        "--verdicts", vdir, "--checkpoint", str(tmp_path / "ck2")])
    assert dedup_stream.main() == 0
    import glob
    import os
    epochs = glob.glob(os.path.join(vdir, "epoch=*"))
    assert len(epochs) == 1                  # run-id-keyed epoch dir
    assert os.path.exists(os.path.join(epochs[0], "_SUCCESS"))
    assert spark.read.parquet(epochs[0]).count() > 0
