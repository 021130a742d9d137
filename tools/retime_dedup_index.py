"""Targeted 3-run solo retime of the dedup-index scale legs (VERDICT
r13 #1): the r13 BENCH_SCALE map recorded dedup_index_build x30 =
21.74 s (18.7x for 30x rows) under a contaminated start (loadavg 5.44)
— 2.6x off its dedup_index_append2 twin (8.27 s) for code untouched
since r12 (4.87 s, 3.23x). This script re-pins ONLY those two legs on
a quiet host: per-size, 3 solo runs each of build and append2 on the
existing .scale_fixture corpus halves, fresh index dir per run, min
wall kept (the ta_sma_vwap playbook). Prints one JSON line.

Usage: python tools/retime_dedup_index.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(ROOT, ".scale_fixture")
RUNS = 3


def main() -> int:
    from pyspark.sql import functions as F

    from big_data_crypto_sentiment_spark.jobs._genstore import remove_gen
    from big_data_crypto_sentiment_spark.jobs.dedup_index import (
        append_artifacts,
        build_index,
    )
    from big_data_crypto_sentiment_spark.session import get_spark

    spark = get_spark("retime_dedup_index",
                      extra_conf={"spark.ui.enabled": "false"})
    work = os.path.join(FIX, "_retime")
    os.makedirs(work, exist_ok=True)
    load0 = [round(x, 2) for x in os.getloadavg()]
    out: dict = {"loadavg_start": load0, "runs": RUNS}
    # untimed warm pass at x1 (mirrors bench_scale: codegen/JVM cold
    # cost out of the recorded walls)
    for tag in ("_warm_x1", "x1", "x10", "x30"):
        size = tag.removeprefix("_warm_")
        docs = spark.read.parquet(
            os.path.join(FIX, size, "documents.parquet")) \
            .select("doc_id", "text")
        n = docs.count()
        d_base = docs.filter(F.col("doc_id") < n // 2)
        builds, appends = [], []
        for i in range(1 if tag.startswith("_warm") else RUNS):
            didx = os.path.join(work, f"idx_{tag}_{i}")
            shutil.rmtree(didx, ignore_errors=True)
            t0 = time.monotonic()
            build_index(spark, d_base, didx)
            builds.append(round(time.monotonic() - t0, 2))
            t0 = time.monotonic()
            gen = append_artifacts(spark, didx, d_base)
            appends.append(round(time.monotonic() - t0, 2))
            if gen:
                remove_gen(gen)
            shutil.rmtree(didx, ignore_errors=True)
        if not tag.startswith("_warm"):
            out[tag] = {"build": builds, "append2": appends,
                        "build_min": min(builds),
                        "append2_min": min(appends)}
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    for leg in ("build", "append2"):
        out[f"{leg}_ratio_x10"] = round(
            out["x10"][f"{leg}_min"] / out["x1"][f"{leg}_min"], 2)
        out[f"{leg}_ratio_x30"] = round(
            out["x30"][f"{leg}_min"] / out["x1"][f"{leg}_min"], 2)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
