"""On-disk MinHash dedup-index lifecycle: the daily-crawl shape, made
runnable.

queries/dedup.py's incremental operator consumes the existing corpus
ONLY through two materialized artifacts — the shingled frame and the
LSH band index. This job owns those artifacts on disk:

    build_index(spark, docs, index_dir)        one full corpus pass →
        index_dir/shingles/   (doc_id, shingles array<string>)
        index_dir/bands/      (doc_id, band, bh)
    verdict_batch(spark, index_dir, delta)     O(|delta|) shingle +
        signature work, equality join on (band, bh) against the stored
        index; the INDEXED CORPUS TEXT IS NEVER READ — exactly what
        makes per-batch dedup affordable at 100 TB.
    append_batch(spark, index_dir, delta)      verdict, then append the
        batch's OWN artifacts so the next batch dedups against it too.
        Appends go to fresh subdirectory "generations" (parquet append
        by directory, no rewrite of existing files); a crashed append
        leaves a _tmp_* directory that readers never list, so a retry
        is safe (the at-least-once → idempotent-sink discipline).

Batch verdicts keep the operator's semantics: dup-of-indexed (any
partner), dup-of-earlier-in-batch (smaller doc_id wins), or new.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.dedup import (
    JACCARD_THRESHOLD,
    band_table,
    incremental_minhash_verdicts,
    shingled_docs,
)

_SUBS = ("shingles", "bands")


def _gen_dirs(index_dir: str, sub: str) -> list[str]:
    root = os.path.join(index_dir, sub)
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d) for d in os.listdir(root)
        if d.startswith("gen_") and not d.startswith("_"))


def _write_generation(df: DataFrame, index_dir: str, sub: str) -> str:
    """Write one immutable generation directory: parquet into _tmp_*,
    then a single atomic rename into the listed namespace. Readers
    only list gen_*, so a crash mid-write leaves invisible garbage,
    never a half-readable generation."""
    gen = f"gen_{len(_gen_dirs(index_dir, sub)):06d}_{uuid.uuid4().hex[:8]}"
    root = os.path.join(index_dir, sub)
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f"_tmp_{gen}")
    df.write.mode("overwrite").parquet(tmp)
    final = os.path.join(root, gen)
    os.rename(tmp, final)
    return final


def _read_all(spark: SparkSession, index_dir: str, sub: str) -> DataFrame:
    dirs = _gen_dirs(index_dir, sub)
    if not dirs:
        raise FileNotFoundError(f"no {sub} generations in {index_dir}")
    return spark.read.parquet(*dirs)


def build_index(spark: SparkSession, docs: DataFrame,
                index_dir: str) -> dict:
    """One corpus pass: shingle, sign, band; both artifacts written as
    generation 0. Returns counts."""
    sh = shingled_docs(docs).persist()
    _write_generation(sh, index_dir, "shingles")
    bands = band_table(sh)
    _write_generation(bands, index_dir, "bands")
    n = sh.count()
    sh.unpersist()
    return {"indexed_docs": n}


def verdict_batch(spark: SparkSession, index_dir: str, delta: DataFrame,
                  threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Per-delta-doc verdicts against the ON-DISK index. Only the
    delta is shingled; the index side is two parquet scans."""
    base_sh = _read_all(spark, index_dir, "shingles")
    base_bands = _read_all(spark, index_dir, "bands")
    return incremental_minhash_verdicts(base_sh, base_bands, delta,
                                        threshold)


def append_batch(spark: SparkSession, index_dir: str, delta: DataFrame,
                 threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Verdict the batch, then append its artifacts as a new
    generation (only NEW-or-dup — every delta doc — is indexed: dups
    stay queryable so later batches resolve to the earliest copy,
    matching the operator's min-partner rule)."""
    verdicts = verdict_batch(spark, index_dir, delta, threshold)
    sh_d = shingled_docs(delta).persist()
    _write_generation(sh_d, index_dir, "shingles")
    _write_generation(band_table(sh_d), index_dir, "bands")
    sh_d.unpersist()
    return verdicts


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold all generations of each artifact into one (daily batches
    accumulate one generation per ingest; listing/scanning thousands
    of small generations is the classic small-files tax). Crash-safe
    in the dim_build discipline: the merged generation is written to
    _tmp and renamed in BEFORE the old generations are renamed aside
    (readers between the two steps see duplicated rows in `bands` /
    `shingles`, which every consumer tolerates: the candidate join
    dedups pairs and verdicts are recomputed per batch — never a
    missing-data window). Aside dirs (_old_*) are then removed."""
    import shutil

    out = {}
    for sub in _SUBS:
        olds = _gen_dirs(index_dir, sub)
        if len(olds) <= 1:
            out[sub] = len(olds)
            continue
        merged = spark.read.parquet(*olds)
        final = _write_generation(merged, index_dir, sub)
        for d in olds:
            aside = os.path.join(os.path.dirname(d),
                                 "_old_" + os.path.basename(d))
            os.rename(d, aside)
            shutil.rmtree(aside)
        out[sub] = 1
        assert _gen_dirs(index_dir, sub) == [final]
    return out


def index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Bounded audit scalars for the stored index."""
    sh = _read_all(spark, index_dir, "shingles")
    bands = _read_all(spark, index_dir, "bands")
    row = bands.agg(
        F.count(F.lit(1)).alias("band_rows"),
        F.count_distinct("doc_id").alias("docs")).first()
    return {"generations": len(_gen_dirs(index_dir, "shingles")),
            "docs": int(row["docs"]),
            "band_rows": int(row["band_rows"]),
            "shingle_rows": sh.count()}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="On-disk MinHash dedup-index lifecycle")
    ap.add_argument("command",
                    choices=["build", "verdict", "append", "compact",
                             "stats"])
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--docs-parquet",
                    help="documents parquet for build/verdict/append "
                         "(doc_id, text)")
    ap.add_argument("--out", help="verdict output parquet (optional)")
    args = ap.parse_args()
    from ..session import get_spark
    spark = get_spark("dedup-index")
    if args.command in ("build", "verdict", "append"):
        if not args.docs_parquet:
            ap.error(f"{args.command} needs --docs-parquet")
        docs = spark.read.parquet(args.docs_parquet) \
                    .select("doc_id", "text")
    if args.command == "build":
        print(build_index(spark, docs, args.index_dir))
    elif args.command in ("verdict", "append"):
        fn = verdict_batch if args.command == "verdict" else append_batch
        v = fn(spark, args.index_dir, docs)
        if args.out:
            v.write.mode("overwrite").parquet(args.out)
        dup = v.filter(F.col("is_new") == 0).count()
        print({"batch_docs": v.count(), "duplicates": dup})
    elif args.command == "compact":
        print(compact_index(spark, args.index_dir))
    else:
        print(index_stats(spark, args.index_dir))


if __name__ == "__main__":
    main()
