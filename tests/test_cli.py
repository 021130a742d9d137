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
    for name in ("dedup-index", "ann-index", "curate"):
        assert name in JOBS
        out = subprocess.run(
            [sys.executable, "-m", "big_data_crypto_sentiment_spark",
             name, "--help"],
            capture_output=True, text=True, cwd="/root/repo", timeout=60)
        assert out.returncode == 0, (name, out.stderr[-500:])
        assert f"big_data_crypto_sentiment_spark {name}" in out.stdout
