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
