"""On-disk MinHash dedup-index lifecycle: the daily-crawl shape, made
runnable.

queries/dedup.py's incremental operator consumes the existing corpus
ONLY through two materialized artifacts — the shingled frame and the
LSH band index. This job owns those artifacts on disk:

    build_index(spark, docs, index_dir)        one full corpus pass →
        index_dir/gen_*/shingles/   (doc_id, shingles array<string>)
        index_dir/gen_*/bands/      (doc_id, band, bh)
    verdict_batch(spark, index_dir, delta)     O(|delta|) shingle +
        signature work, equality join on (band, bh) against the stored
        index; the INDEXED CORPUS TEXT IS NEVER READ — exactly what
        makes per-batch dedup affordable at 100 TB.
    append_batch(spark, index_dir, delta)      verdict, then append the
        batch's OWN artifacts so the next batch dedups against it too.

Crash-safety model. A generation is ONE directory holding BOTH
artifacts, staged under ``_tmp_*`` and committed by a single
``os.rename`` of the generation root — so shingles and bands become
visible together or not at all (a crash can never leave a committed
shingles half with no matching bands half, which would make the
batch's docs silently unfindable by later band joins). A crashed
write leaves only invisible ``_tmp_*`` garbage; readers list ``gen_*``
only. Retried appends: pass ``batch_id`` (the streaming consumer
passes the foreachBatch epoch id) and the retry sees the committed
``gen_b_<batch_id>`` directory and skips the duplicate append —
at-least-once delivery, exactly-once index contents. Without a
batch_id a retry appends a second copy of the rows; verdicts stay
correct (the candidate join dedups pairs) and ``compact_index`` heals
the row duplication by folding on the artifacts' natural keys.

Batch verdicts keep the operator's semantics: dup-of-indexed (any
partner), dup-of-earlier-in-batch (smaller doc_id wins), or new.

Reference analog: the daily batch pipeline's incremental collection
refresh (terraform/scripts/batch_to_mongo.py) — re-expressed as an
immutable-generation parquet index keyed for equality joins.
"""

from __future__ import annotations

import os
import shutil
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
# one row per doc / per (doc, band): the fold keys compact uses to
# heal row duplication from un-keyed retried appends
_NATURAL_KEYS = {"shingles": ["doc_id"], "bands": ["doc_id", "band"]}


def _gen_dirs(index_dir: str) -> list[str]:
    if not os.path.isdir(index_dir):
        return []
    return sorted(
        os.path.join(index_dir, d) for d in os.listdir(index_dir)
        if d.startswith("gen_") and not d.startswith("_"))


def _gen_name(index_dir: str, batch_id: int | str | None) -> str:
    if batch_id is not None:
        return f"gen_b_{batch_id}"
    return f"gen_{len(_gen_dirs(index_dir)):06d}_{uuid.uuid4().hex[:8]}"


def _write_generation(sh: DataFrame, bands: DataFrame, index_dir: str,
                      batch_id: int | str | None = None) -> str | None:
    """Write one immutable generation: BOTH artifacts under a _tmp_*
    root, then a single atomic rename into the listed namespace.
    Returns None (skip) when a batch_id-keyed generation already
    exists — the idempotent-retry path."""
    gen = _gen_name(index_dir, batch_id)
    final = os.path.join(index_dir, gen)
    if os.path.isdir(final):
        return None
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, f"_tmp_{gen}_{uuid.uuid4().hex[:8]}")
    sh.write.mode("overwrite").parquet(os.path.join(tmp, "shingles"))
    bands.write.mode("overwrite").parquet(os.path.join(tmp, "bands"))
    os.rename(tmp, final)
    return final


def _read_all(spark: SparkSession, index_dir: str, sub: str) -> DataFrame:
    dirs = _gen_dirs(index_dir)
    paths = [os.path.join(d, sub) for d in dirs]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        raise FileNotFoundError(f"no {sub} generations in {index_dir}")
    return spark.read.parquet(*paths)


def build_index(spark: SparkSession, docs: DataFrame,
                index_dir: str) -> dict:
    """One corpus pass: shingle, sign, band; both artifacts committed
    as one generation. Returns counts."""
    sh = shingled_docs(docs).persist()
    _write_generation(sh, band_table(sh), index_dir)
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


def append_artifacts(spark: SparkSession, index_dir: str,
                     delta: DataFrame,
                     batch_id: int | str | None = None) -> str | None:
    """Index the batch's own artifacts as a new generation, without
    computing verdicts (every delta doc is indexed — dups stay
    queryable so later batches resolve to the earliest copy, matching
    the operator's min-partner rule). Returns the committed generation
    path, or None when a batch_id-keyed generation already exists
    (idempotent replay)."""
    sh_d = shingled_docs(delta).persist()
    gen = _write_generation(sh_d, band_table(sh_d), index_dir, batch_id)
    sh_d.unpersist()
    return gen


def append_batch(spark: SparkSession, index_dir: str, delta: DataFrame,
                 threshold: float = JACCARD_THRESHOLD,
                 batch_id: int | str | None = None) -> DataFrame:
    """Verdict the batch, then append its artifacts as a new
    generation. With a ``batch_id`` a replayed batch skips the append
    (generation already committed) but still returns its verdicts."""
    verdicts = verdict_batch(spark, index_dir, delta, threshold)
    append_artifacts(spark, index_dir, delta, batch_id)
    return verdicts


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold all generations into one (daily batches accumulate one
    generation per ingest; listing/scanning thousands of small
    generations is the classic small-files tax). The fold drops
    duplicates on each artifact's natural key — duplicate rows are
    bitwise-identical re-shingles of the same doc, so this both makes
    a retried compact idempotent AND heals any row duplication left by
    un-keyed retried appends. Crash-safe: the merged generation is
    committed (atomic rename) BEFORE the old generations are removed;
    readers between the two steps see duplicated rows, which every
    consumer tolerates (the candidate join dedups pairs; verdicts are
    recomputed per batch) — never a missing-data window. A crash
    mid-removal then a re-run re-folds merged + surviving olds and
    the key-dedup collapses them back to one copy."""
    olds = _gen_dirs(index_dir)
    if len(olds) <= 1:
        return {sub: len(olds) for sub in _SUBS}
    merged = {
        sub: _read_all(spark, index_dir, sub)
        .dropDuplicates(_NATURAL_KEYS[sub])
        for sub in _SUBS
    }
    final = _write_generation(merged["shingles"], merged["bands"],
                              index_dir)
    # folded gen_b_* dirs leave tombstones so a checkpoint replay of
    # their epoch is still recognized after the fold (jobs/_genstore.py)
    from ._genstore import remove_gen
    for d in olds:
        remove_gen(d)
    assert _gen_dirs(index_dir) == [final]
    return {sub: 1 for sub in _SUBS}


def index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Bounded audit scalars for the stored index."""
    sh = _read_all(spark, index_dir, "shingles")
    bands = _read_all(spark, index_dir, "bands")
    row = bands.agg(
        F.count(F.lit(1)).alias("band_rows"),
        F.count_distinct("doc_id").alias("docs")).first()
    return {"generations": len(_gen_dirs(index_dir)),
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
    ap.add_argument("--batch-id",
                    help="idempotency key for append (a replay with "
                         "the same id skips the duplicate append)")
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
    elif args.command == "verdict":
        v = verdict_batch(spark, args.index_dir, docs)
        if args.out:
            v.write.mode("overwrite").parquet(args.out)
        dup = v.filter(F.col("is_new") == 0).count()
        print({"batch_docs": v.count(), "duplicates": dup})
    elif args.command == "append":
        v = append_batch(spark, args.index_dir, docs,
                         batch_id=args.batch_id)
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
