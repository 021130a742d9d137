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
probes diverge (classic IVF staleness). Re-centering is
``retrain_index``: a full REBUILD folded in-place — new centroids fit
over everything currently indexed, every vector re-assigned, the whole
thing committed as ONE new full generation, and the switch made atomic
by the ``CURRENT`` pointer file (JSON ``{"full": <gen>, "superseded":
[<gens>]}``, staged + renamed). Readers resolve the live index as:

    full generation  = CURRENT.full if the pointer exists, else the
                       first centroids-bearing generation (legacy
                       build layout, unchanged on disk)
    assignments      = full + every centroids-LESS generation (i.e.
                       appends) not listed as superseded

so each crash window is deterministic: a retrain that died before the
pointer rename leaves an unreferenced centroids-bearing generation that
readers ignore entirely (a full generation is live only via the
pointer); one that died after the rename but before cleanup leaves
stale generations that the superseded list excludes and the next
pointer flip (or a no-op compact) sweeps. The superseded list is the
FOLD-TIME live set plus everything already dead on disk — never a
whole-disk snapshot — so debris from an earlier crashed flip can't be
resurrected by a later one, while an append that raced in during the
retrain's fit is neither listed nor removed: it stays live and
readable, carrying stale cids until the next retrain folds it. Prefer
not to schedule appends concurrent with a retrain anyway (stale cids
put those vectors in the wrong inverted-file cell until the next
fold); a folded ``gen_b_*`` leaves a tombstone (jobs/_genstore.py) so
a checkpoint replay of its epoch is still recognized after
maintenance removed the directory.

Query-time semantics are byte-identical to the in-memory operator:
``query_index`` ≡ ``queries/similarity.py:ivf_topk`` with the same
centroids — pinned by tests/test_ann_index.py.
"""

from __future__ import annotations

import os
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

from ._genstore import epoch_done, remove_gen  # noqa: F401 (epoch_done is the stream writers' replay test)


def _gen_dirs(index_dir: str) -> list[str]:
    if not os.path.isdir(index_dir):
        return []
    return sorted(
        os.path.join(index_dir, d) for d in os.listdir(index_dir)
        if d.startswith("gen_") and not d.startswith("_"))


def _read_pointer(index_dir: str) -> dict | None:
    """The CURRENT pointer ({"full": gen-name, "superseded": [...]}),
    or None for the legacy build+appends layout."""
    import json
    p = os.path.join(index_dir, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_pointer(index_dir: str, full: str,
                   superseded: list[str]) -> None:
    """Stage + rename: the pointer flip IS the retrain/compact commit."""
    import json
    tmp = os.path.join(index_dir, f"_tmp_CURRENT_{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump({"full": full, "superseded": sorted(superseded)}, f)
    os.replace(tmp, os.path.join(index_dir, "CURRENT"))


def _live_gens(index_dir: str) -> tuple[str, list[str]]:
    """(full-generation dir, ordered live generation dirs) under the
    reader rule in the module docstring. Raises if no full generation
    exists."""
    gens = _gen_dirs(index_dir)
    ptr = _read_pointer(index_dir)
    if ptr is not None:
        full = os.path.join(index_dir, ptr["full"])
        if not os.path.isdir(os.path.join(full, "centroids")):
            raise FileNotFoundError(
                f"CURRENT points at {ptr['full']} but it has no "
                f"centroids — corrupt index at {index_dir}")
        dead = {os.path.join(index_dir, d) for d in ptr["superseded"]}
        live = [full] + [
            d for d in gens
            if d != full and d not in dead
            and not os.path.isdir(os.path.join(d, "centroids"))]
        return full, live
    for d in gens:
        if os.path.isdir(os.path.join(d, "centroids")):
            # legacy layout: the build generation + every append; any
            # OTHER centroids-bearing generation is an uncommitted
            # retrain and stays invisible
            live = [x for x in gens
                    if x == d
                    or not os.path.isdir(os.path.join(x, "centroids"))]
            return d, live
    raise FileNotFoundError(f"no centroids generation in {index_dir}")


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
    """[(cid, vector)] from the LIVE full generation — O(k·dim), a
    driver artifact the assignment UDF ships as a closure constant."""
    full, _ = _live_gens(index_dir)
    rows = spark.read.parquet(os.path.join(full, "centroids")).collect()
    return sorted((r.cid, list(r.centroid)) for r in rows)


def _read_assignments(spark: SparkSession, index_dir: str) -> DataFrame:
    _, live = _live_gens(index_dir)
    paths = [os.path.join(d, "assignments") for d in live]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        raise FileNotFoundError(f"no assignments in {index_dir}")
    return spark.read.parquet(*paths)


def read_assignments_dedup(spark: SparkSession, index_dir: str,
                           exclude: tuple[str, ...] = ()) -> DataFrame:
    """Live assignments deduped to ONE row per vec_id with a
    DETERMINISTIC pick: the full generation's row wins over append
    rows, and among appends the earliest generation (name order) wins.

    r10 review (ADVICE, low): the previous unordered
    ``dropDuplicates(["vec_id"])`` relied on every duplicate being an
    identical re-assignment; if the same vec_id ever lands in two live
    generations with DIFFERENT cids (e.g. re-ingest of an existing id
    after a retrain — nothing enforces against it), ranking became
    nondeterministic across runs. Here each generation is tagged with
    its live-order priority and the min-priority row is kept via
    ``min_by`` — one shuffle, same as dropDuplicates, but the winner is
    total-ordered (priorities are distinct per generation; vec_id is
    unique within one). `exclude` drops whole generations from the view
    (the streaming verdict path excludes the current batch's own gen).
    """
    full, live = _live_gens(index_dir)
    skip = set(exclude)
    tagged = []
    for pri, d in enumerate(live):          # live = [full] + name-order
        p = os.path.join(d, "assignments")
        if d not in skip and os.path.isdir(p):
            tagged.append(
                spark.read.parquet(p).withColumn("_pri", F.lit(pri)))
    if not tagged:
        raise FileNotFoundError(f"no assignments in {index_dir}")
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    return (u.groupBy("vec_id")
             .agg(F.min_by(F.struct("embedding", "cid"),
                           F.col("_pri")).alias("_pick"))
             .select("vec_id",
                     F.col("_pick.embedding").alias("embedding"),
                     F.col("_pick.cid").alias("cid")))


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
    # ranks and evict a genuine kth neighbor. The dedup pick is
    # DETERMINISTIC (full generation wins — read_assignments_dedup) so
    # a vec_id living in two generations with different cids can't make
    # results flap across runs.
    assignments = read_assignments_dedup(spark, index_dir)
    return ivf_topk_assigned(queries, assignments, centroids, k, n_probe)


def _swap_in_full_gen(index_dir: str, final: str,
                      olds: list[str]) -> None:
    """Point CURRENT at the freshly-committed full generation, then
    remove everything it supersedes. The dead set is the FOLD-TIME live
    set (`olds` — exactly what the caller merged into `final`) UNION
    everything that was already dead on disk (the previous pointer's
    surviving superseded entries and any unreferenced centroids-bearing
    commit) — so debris from an earlier crashed flip can never be
    resurrected by a later one (r10 review finding #1), while an append
    that raced in BETWEEN the fold and this flip is neither listed nor
    removed: it stays live and readable, merely carrying stale cids
    until the next retrain folds it (r10 review finding #2 — a
    whole-disk snapshot here would silently DESTROY that raced batch).
    The pointer rename is the commit point; every removal after it is
    idempotent cleanup, and removed ``gen_b_*`` dirs leave tombstones
    so epoch replays stay detectable (jobs/_genstore.py)."""
    prev = _read_pointer(index_dir)
    dead = {d for d in olds if d != final}
    if prev is not None:
        dead |= {os.path.join(index_dir, b) for b in prev["superseded"]
                 if os.path.isdir(os.path.join(index_dir, b))}
    dead |= {d for d in _gen_dirs(index_dir)
             if d != final
             and os.path.isdir(os.path.join(d, "centroids"))}
    _write_pointer(index_dir, os.path.basename(final),
                   sorted(os.path.basename(d) for d in dead))
    for d in sorted(dead):
        remove_gen(d)


def _sweep_dead(index_dir: str) -> int:
    """Remove every on-disk generation the reader rule considers dead
    (pointer-superseded, or an unreferenced centroids-bearing commit).
    Idempotent; live generations — including appends that raced a
    maintenance pass — are never touched. Returns the number of
    directories removed."""
    _, live = _live_gens(index_dir)
    return sum(1 for d in _gen_dirs(index_dir)
               if d not in live and remove_gen(d))


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold the live assignment generations into one, dedup on vec_id
    (duplicate rows are identical re-assignments under the frozen
    centroids), centroids carried forward; merged generation committed
    before the pointer flips and the olds are removed — same crash
    story as the dedup index."""
    _, olds = _live_gens(index_dir)
    if len(olds) <= 1:
        # nothing to fold, but still sweep crash debris (dead dirs
        # would otherwise survive forever: they're excluded from every
        # fold, and index_stats' generation count would keep demanding
        # a compact that merges nothing)
        _sweep_dead(index_dir)
        return {"generations": len(_gen_dirs(index_dir))}
    centroids = load_centroids(spark, index_dir)
    cdf = spark.createDataFrame(
        [(cid, vec) for cid, vec in centroids],
        "cid int, centroid array<double>")
    # deterministic fold: same generation-priority pick as query_index,
    # so a compact bakes in exactly the rows queries were already seeing
    merged = read_assignments_dedup(spark, index_dir)

    def write(tmp: str) -> None:
        cdf.coalesce(1).write.mode("overwrite") \
           .parquet(os.path.join(tmp, "centroids"))
        merged.write.mode("overwrite") \
              .parquet(os.path.join(tmp, "assignments"))

    final = _commit_generation(index_dir, write)
    _swap_in_full_gen(index_dir, final, olds)
    assert final in _gen_dirs(index_dir)
    return {"generations": 1}


def retrain_index(spark: SparkSession, index_dir: str,
                  k: int | None = None, seed: int = 42,
                  sample_ppm: int | None = None) -> dict:
    """Re-center the index: fit FRESH centroids over everything
    currently indexed (appends included, duplicates healed), re-assign
    every vector, and commit the result as the new full generation —
    the cure for IVF staleness after many appends under frozen
    centroids. The pointer-file flip makes the switch atomic; see the
    module docstring for the crash-window analysis. k defaults to the
    current centroid count."""
    if k is None:
        k = len(load_centroids(spark, index_dir))
    _, olds = _live_gens(index_dir)
    corpus = read_assignments_dedup(spark, index_dir) \
        .select("vec_id", "embedding")
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

    final = _commit_generation(index_dir, write)
    _swap_in_full_gen(index_dir, final, olds)
    return {"generations": 1, "clusters": k}


def index_stats(spark: SparkSession, index_dir: str,
                include_full: bool = False) -> dict:
    a = _read_assignments(spark, index_dir)
    row = a.agg(F.count(F.lit(1)).alias("rows"),
                F.count_distinct("vec_id").alias("vectors"),
                F.count_distinct("cid").alias("clusters_used")).first()
    out = {"generations": len(_gen_dirs(index_dir)),
           "rows": int(row["rows"]),
           "vectors": int(row["vectors"]),
           "clusters_used": int(row["clusters_used"])}
    if include_full:
        # rows living in the full generation (vs appends) — the input
        # maintenance_due's retrain trigger reads
        full, _ = _live_gens(index_dir)
        out["full_rows"] = spark.read.parquet(
            os.path.join(full, "assignments")).count()
    return out


def index_recall(spark: SparkSession, index_dir: str,
                 n_queries: int = 32, k: int = 10,
                 n_probe: int = IVF_PROBES, seed: int = 0) -> dict:
    """Recall@k of the stored index against exact brute-force cosine on
    a deterministic sample of its own vectors — the drift probe a
    deployment runs after appends pile up under frozen centroids (and
    the before/after evidence for a retrain decision). Query sample =
    the n_queries smallest md5(seed:vec_id) (portable, seed-keyed, no
    RNG state); driver traffic is bounded at 2·k rows per query."""
    from pyspark import StorageLevel

    from ..queries.similarity import brute_force_topk
    corpus = read_assignments_dedup(spark, index_dir) \
        .select("vec_id", "embedding")
    qs = (corpus
          .withColumn("_h", F.md5(F.concat_ws(
              ":", F.lit(str(seed)), F.col("vec_id").cast("string"))))
          .orderBy("_h", "vec_id").limit(n_queries)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qe"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    # exact is consumed by two actions (the hit semi-join and the
    # denominator count) — persist it or the O(|corpus|·n_queries)
    # brute-force pass, this probe's dominant cost, runs twice
    exact = brute_force_topk(qs, corpus, k) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    try:
        approx = query_index(spark, index_dir, qs, k, n_probe)
        hits = approx.join(exact, ["query_id", "vec_id"],
                           "left_semi").count()
        denom = exact.count()
        n_q = qs.count()
    finally:
        exact.unpersist()
        qs.unpersist()
    return {"recall_at_k": round(hits / denom, 4) if denom else 1.0,
            "k": k, "n_probe": n_probe, "queries": int(n_q)}


def maintenance_due(stats: dict, max_generations: int = 16,
                    max_dup_frac: float = 0.05,
                    max_append_frac: float = 0.25) -> dict:
    """Maintenance policy over index_stats output (pure function, no
    Spark): compact when the generation count (small-files tax) or the
    duplicate-row fraction (crash-window debris) crosses its bound;
    retrain when appends assigned under frozen centroids outweigh the
    configured fraction of the index (classic IVF staleness — cell
    sizes skew and recall decays). `append_frac` needs the caller to
    pass stats extended with full-generation rows when available;
    absent that, generation count is the retrain proxy (each append is
    one generation)."""
    reasons = []
    dup_frac = 1.0 - (stats["vectors"] / stats["rows"]) \
        if stats.get("rows") else 0.0
    if stats.get("generations", 1) > max_generations:
        reasons.append(f"generations>{max_generations}")
    if dup_frac > max_dup_frac:
        reasons.append(f"dup_frac {dup_frac:.3f}>{max_dup_frac}")
    full_rows = stats.get("full_rows")
    append_frac = (1.0 - full_rows / stats["rows"]
                   if full_rows is not None and stats.get("rows") else
                   None)
    retrain = (append_frac is not None
               and append_frac > max_append_frac)
    if retrain:
        reasons.append(f"append_frac {append_frac:.3f}>{max_append_frac}")
    return {"compact": bool(reasons) and not retrain,
            "retrain": retrain,
            "reasons": reasons}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="On-disk IVF ANN-index lifecycle")
    ap.add_argument("command",
                    choices=["build", "append", "query", "compact",
                             "retrain", "stats"])
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
    elif args.command == "retrain":
        print(retrain_index(spark, args.index_dir))
    else:
        print(index_stats(spark, args.index_dir))


if __name__ == "__main__":
    main()
