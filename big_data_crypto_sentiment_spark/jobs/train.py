"""The training job (SURVEY.md §3.3 — analytical_module/arima.py
reborn): per-symbol batch training over the resampled price grid,
holdout metrics, artifact bundle to disk.

Run: python -m big_data_crypto_sentiment_spark.jobs.train \
       --sf-dir /root/testdata/sf0.01 --out models/ar1.json
"""

from __future__ import annotations

import argparse
import json

from ..model_registry import save_bundle, train_bundle


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    from ..session import get_spark
    spark = get_spark("train")
    bundle = train_bundle(spark, args.sf_dir)
    save_bundle(bundle, args.out)
    print(json.dumps({"symbols": sorted(bundle["models"]),
                      "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
