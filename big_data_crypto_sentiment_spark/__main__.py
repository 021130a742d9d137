"""Unified job launcher.

    python -m big_data_crypto_sentiment_spark <job> [job args...]

Every production job under ``jobs/`` keeps its own ``main()`` (so
``python -m big_data_crypto_sentiment_spark.jobs.curate ...`` still
works and spark-submit can target one module file); this dispatcher is
the single front door that lists them. Job mains parse their own
argparse flags from sys.argv, so dispatch just strips the job name and
re-enters.
"""

from __future__ import annotations

import importlib
import sys

JOBS = {
    "batch": ("jobs.batch_job", "batch layer: normalize + windowed metrics to parquet"),
    "speed-layer": ("jobs.speed_layer", "streaming speed layer (5 checkpointed queries)"),
    "train": ("jobs.train", "per-symbol ARIMA training + model registry publish"),
    "curate": ("jobs.curate", "LLM-corpus curation funnel (quality -> dedup -> semdedup)"),
    "dedup-index": ("jobs.dedup_index", "on-disk MinHash dedup-index lifecycle"),
    "dedup-stream": ("streaming.dedup_stream", "streaming near-dup dedup over a stored index"),
    "ann-index": ("jobs.ann_index", "on-disk IVF ANN-index lifecycle"),
    "ann-ingest": ("streaming.ann_stream", "streaming vector ingest into a stored IVF index"),
    "dim-build": ("jobs.dim_build", "SCD2 dimension build/refresh"),
    "export-training": ("jobs.export_training", "tokenize + pack + shard training export"),
}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in JOBS:
        prog = "python -m big_data_crypto_sentiment_spark"
        lines = [f"usage: {prog} <job> [job args...]", "", "jobs:"]
        lines += [f"  {name:<16} {desc}" for name, (_, desc) in JOBS.items()]
        print("\n".join(lines), file=sys.stderr)
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    mod_name, _ = JOBS[argv[0]]
    mod = importlib.import_module(f"{__package__}.{mod_name}")
    # job mains read sys.argv via argparse; present theirs, not ours
    sys.argv = [f"{__package__} {argv[0]}"] + argv[1:]
    rc = mod.main()
    return int(rc) if rc is not None else 0


if __name__ == "__main__":
    sys.exit(main())
