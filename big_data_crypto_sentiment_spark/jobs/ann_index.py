"""On-disk IVF ANN-index lifecycle: build / append / query / compact.

At 100 TB you query a STORED inverted file, not a per-run KMeans fit:
the k-means pass over the corpus happens once at build, and every later
batch of vectors is assigned to the frozen centroids in one map-side
scan (no fit, no shuffle) and appended. Mirrors jobs/dedup_index.py's
generation discipline exactly:

    index_dir/gen_000000_*/centroids/    (cid, centroid array<double>)
                          /assignments/  (vec_id, embedding, cid)
    index_dir/gen_b_<id>/assignments/    appended batches

A generation is staged under ``_tmp_*`` and committed by a single
``os.rename`` — readers list ``gen_*`` only, so a crashed write leaves
invisible garbage, never a half-readable generation. Appends keyed by
``batch_id`` make at-least-once replays exactly-once (the committed
``gen_b_<id>`` is detected and skipped). ``compact_index`` folds
assignment generations into one — deduping on vec_id, so a retried
compact (or an un-keyed replayed append) heals row duplication instead
of baking it in — and carries the centroids forward unchanged.

Centroids are FROZEN at build: append-time assignment must use the
same centroids queries probe, or stored cluster membership and query
probes diverge (classic IVF staleness). Re-centering is a REBUILD
(build_index to a fresh dir + atomic swap by the caller), not a
mutation.

Query-time semantics are byte-identical to the in-memory operator:
``query_index`` ≡ ``queries/similarity.py:ivf_topk`` with the same
centroids — pinned by tests/test_ann_index.py.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.similarity import (
    IVF_CLUSTERS,
    IVF_PROBES,
    _assign_clusters,
    fit_ivf_centroids,
    ivf_topk_assigned,
)


def _gen_dirs(index_dir: str) -> list[str]:
    if not os.path.isdir(index_dir):
        return []
    return sorted(
        os.path.join(index_dir, d) for d in os.listdir(index_dir)
        if d.startswith("gen_") and not d.startswith("_"))


def _commit_generation(index_dir: str, writer,
                       batch_id: int | str | None = None) -> str | None:
    """Stage via `writer(tmp_root)`, then one atomic rename. Returns
    None (skip) when a batch_id-keyed generation already exists."""
    gen = (f"gen_b_{batch_id}" if batch_id is not None
           else f"gen_{len(_gen_dirs(index_dir)):06d}_"
                f"{uuid.uuid4().hex[:8]}")
    final = os.path.join(index_dir, gen)
    if os.path.isdir(final):
        return None
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, f"_tmp_{gen}_{uuid.uuid4().hex[:8]}")
    writer(tmp)
    os.rename(tmp, final)
    return final


def build_index(spark: SparkSession, corpus: DataFrame, index_dir: str,
                k: int = IVF_CLUSTERS, seed: int = 42,
                sample_ppm: int | None = None) -> dict:
    """One corpus pass: KMeans fit → frozen centroids + one-cluster
    assignments, committed together as generation 0."""
    centroids = fit_ivf_centroids(corpus, k=k, seed=seed,
                                  sample_ppm=sample_ppm)
    cdf = spark.createDataFrame(
        [(cid, vec) for cid, vec in centroids],
        "cid int, centroid array<double>")
    assigned = _assign_clusters(corpus, centroids, "embedding", 1) \
        .select("vec_id", "embedding", "cid")

    def write(tmp: str) -> None:
        cdf.coalesce(1).write.mode("overwrite") \
           .parquet(os.path.join(tmp, "centroids"))
        assigned.write.mode("overwrite") \
                .parquet(os.path.join(tmp, "assignments"))

    _commit_generation(index_dir, write)
    return {"indexed_vectors": assigned.count(), "clusters": k}


def load_centroids(spark: SparkSession, index_dir: str):
    """[(cid, vector)] from the build generation — O(k·dim), a driver
    artifact the assignment UDF ships as a closure constant."""
    for d in _gen_dirs(index_dir):
        cpath = os.path.join(d, "centroids")
        if os.path.isdir(cpath):
            rows = spark.read.parquet(cpath).collect()
            return sorted((r.cid, list(r.centroid)) for r in rows)
    raise FileNotFoundError(f"no centroids generation in {index_dir}")


def _read_assignments(spark: SparkSession, index_dir: str) -> DataFrame:
    paths = [os.path.join(d, "assignments") for d in _gen_dirs(index_dir)]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        raise FileNotFoundError(f"no assignments in {index_dir}")
    return spark.read.parquet(*paths)


def append_vectors(spark: SparkSession, index_dir: str, delta: DataFrame,
                   batch_id: int | str | None = None) -> str | None:
    """Assign the delta to the FROZEN centroids (map-side only) and
    append as a new generation; batch_id-keyed replays skip."""
    centroids = load_centroids(spark, index_dir)
    assigned = _assign_clusters(delta, centroids, "embedding", 1) \
        .select("vec_id", "embedding", "cid")

    def write(tmp: str) -> None:
        assigned.write.mode("overwrite") \
                .parquet(os.path.join(tmp, "assignments"))

    return _commit_generation(index_dir, write, batch_id)


def query_index(spark: SparkSession, index_dir: str, queries: DataFrame,
                k: int, n_probe: int = IVF_PROBES) -> DataFrame:
    """Top-k over the stored inverted file: probe assignment scans +
    one equality join on cid — identical semantics to the in-memory
    ivf_topk with the same centroids."""
    centroids = load_centroids(spark, index_dir)
    # The crash model permits duplicated (vec_id, cid) rows: an un-keyed
    # replayed append, or the window between compact's merged-generation
    # commit and old-generation removal. Dedup consumers tolerate those
    # (they dedup candidate pairs), but ranking does not — row_number
    # over (cos desc, vec_id) would give the same vec_id two consecutive
    # ranks and evict a genuine kth neighbor. Duplicate rows are
    # identical re-assignments under the frozen centroids, so dropping
    # them here is lossless.
    assignments = _read_assignments(spark, index_dir) \
        .dropDuplicates(["vec_id"])
    return ivf_topk_assigned(queries, assignments, centroids, k, n_probe)


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold all assignment generations into one, dedup on vec_id
    (duplicate rows are identical re-assignments under the frozen
    centroids), centroids carried forward; merged generation committed
    before the olds are removed — same crash story as the dedup index."""
    olds = _gen_dirs(index_dir)
    if len(olds) <= 1:
        return {"generations": len(olds)}
    centroids = load_centroids(spark, index_dir)
    cdf = spark.createDataFrame(
        [(cid, vec) for cid, vec in centroids],
        "cid int, centroid array<double>")
    merged = _read_assignments(spark, index_dir) \
        .dropDuplicates(["vec_id"])

    def write(tmp: str) -> None:
        cdf.coalesce(1).write.mode("overwrite") \
           .parquet(os.path.join(tmp, "centroids"))
        merged.write.mode("overwrite") \
              .parquet(os.path.join(tmp, "assignments"))

    final = _commit_generation(index_dir, write)
    for d in olds:
        aside = os.path.join(os.path.dirname(d),
                             "_old_" + os.path.basename(d))
        os.rename(d, aside)
        shutil.rmtree(aside)
    assert _gen_dirs(index_dir) == [final]
    return {"generations": 1}


def index_stats(spark: SparkSession, index_dir: str) -> dict:
    a = _read_assignments(spark, index_dir)
    row = a.agg(F.count(F.lit(1)).alias("rows"),
                F.count_distinct("vec_id").alias("vectors"),
                F.count_distinct("cid").alias("clusters_used")).first()
    return {"generations": len(_gen_dirs(index_dir)),
            "rows": int(row["rows"]),
            "vectors": int(row["vectors"]),
            "clusters_used": int(row["clusters_used"])}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="On-disk IVF ANN-index lifecycle")
    ap.add_argument("command",
                    choices=["build", "append", "query", "compact",
                             "stats"])
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--vectors-parquet",
                    help="(vec_id, embedding) parquet for build/append; "
                         "(query_id, qe) for query")
    ap.add_argument("--batch-id",
                    help="idempotency key for append")
    ap.add_argument("--k", type=int, default=10,
                    help="top-k for query")
    ap.add_argument("--out", help="query output parquet (optional)")
    args = ap.parse_args()
    from ..session import get_spark
    spark = get_spark("ann-index")
    if args.command in ("build", "append", "query"):
        if not args.vectors_parquet:
            ap.error(f"{args.command} needs --vectors-parquet")
        vecs = spark.read.parquet(args.vectors_parquet)
    if args.command == "build":
        print(build_index(spark, vecs, args.index_dir))
    elif args.command == "append":
        gen = append_vectors(spark, args.index_dir, vecs,
                             batch_id=args.batch_id)
        print({"appended": gen is not None})
    elif args.command == "query":
        r = query_index(spark, args.index_dir, vecs, args.k)
        if args.out:
            r.write.mode("overwrite").parquet(args.out)
        print({"result_rows": r.count()})
    elif args.command == "compact":
        print(compact_index(spark, args.index_dir))
    else:
        print(index_stats(spark, args.index_dir))


if __name__ == "__main__":
    main()
