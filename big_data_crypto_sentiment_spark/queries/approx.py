"""Approximate / sketch-based aggregates — the 100 TB cardinality
toolkit (no reference twin; the reference's EDA computes exact
value_counts at notebook scale, which doesn't survive 1000 executors).

  * approx_count_distinct (HyperLogLog++) vs exact — rows-only entries
    (sketch estimates are engine-specific); the pytest pins relative
    error.
  * hll_sketch_agg / hll_union_agg (Spark 3.5+ Datasketches) — the
    MERGEABLE form: per-partition/day sketches union into a global
    estimate without re-touching raw data, which is what makes
    incremental distinct-counting possible at scale.
  * percentile_approx vs exact percentile — same pattern for quantiles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import table


# relative-error margin for the HLL bounded-error assertions: both
# sketches run at rsd ≈ 0.05 (HLL++ default / lgConfigK=12), so a
# 5-sigma 25% band makes the flag a contract pin, not a coin flip
HLL_REL_BOUND = 0.25


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct estimate next to the exact count, graduated to an
    oracle pair (r13, the approx_quantiles recipe): the exact count
    hashes exactly, and the engine-specific estimate becomes a
    bounded-relative-error ASSERTION (|approx−exact| ≤ 25%·exact at
    the default 5% rsd) that DuckDB asserts as literal 1 — sketch
    drift outside the published error contract reads as a hash
    mismatch."""
    ev = table(spark, sf_dir, "events")
    g = (ev.groupBy("event_type")
           .agg(F.approx_count_distinct("user_id").alias("approx"),
                F.countDistinct("user_id").alias("exact_users")))
    ok = (F.abs(F.col("approx") - F.col("exact_users"))
          <= F.lit(HLL_REL_BOUND) * F.col("exact_users"))
    return g.select("event_type", "exact_users",
                    ok.cast("int").alias("approx_in_bound"))


def q_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day sketches → union → global estimate, next to the exact
    count: the pre-aggregate-then-merge shape (what makes incremental
    distinct-counting possible at 100 TB — per-partition sketches
    union without re-touching raw data). Graduated r13: the merged
    Datasketches estimate becomes a bounded-error assertion against
    the exact global distinct, both exact columns hash exactly, and
    sum_daily_exact ≥ true distinct rides as a second structural
    invariant DuckDB recomputes."""
    ev = table(spark, sf_dir, "events")
    # rollup(day) yields the per-day rows AND the global total row in
    # ONE scan — no second pass, no 1×1 join the planner would turn
    # into a nested loop. The day rows carry the daily sketches (the
    # mergeable shape), the null-day row carries the exact global
    # distinct the assertion compares against.
    lv = (ev.rollup(F.date_trunc("day", "ts").alias("day"))
            .agg(F.hll_sketch_agg("user_id").alias("sk"),
                 F.countDistinct("user_id").alias("ex")))
    is_day = F.col("day").isNotNull()
    merged = lv.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.when(is_day, F.col("sk"))))
         .alias("merged_estimate"),
        F.sum(F.when(is_day, F.col("ex"))).alias("sum_daily_exact"),
        F.count(F.when(is_day, 1)).alias("n_days"),
        F.max(F.when(~is_day, F.col("ex"))).alias("exact_global"))
    ok = (F.abs(F.col("merged_estimate") - F.col("exact_global"))
          <= F.lit(HLL_REL_BOUND) * F.col("exact_global"))
    return merged.select(
        "n_days", "sum_daily_exact", "exact_global",
        ok.cast("int").alias("merged_in_bound"),
        (F.col("sum_daily_exact") >= F.col("exact_global"))
        .cast("int").alias("daily_sum_ge_global"))


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx median next to the exact one, graduated to an oracle
    pair (r12 verdict #1): the exact median is emitted cent-exact
    (2×median in cents is always an integer — the midpoint of two
    cent values — so ROUND(m*200) recovers it from the interpolated
    double identically in both engines), and the sketch estimate
    becomes a BOUNDED-ERROR ASSERTION the hash pins: with
    accuracy=10000 the GK-style sketch guarantees rank error
    ≤ n/10000, and the exact 0.495/0.505 quantiles bound every value
    in that rank window once a group has ≥206 rows (smallest fixture
    group ~1.5k at sf0.001). DuckDB asserts the flag as literal TRUE —
    if percentile_approx ever drifted outside its published contract,
    the value-hash goes red."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    # ONE array-percentile aggregate: all three exact quantiles come
    # out of a single per-group sort buffer (three scalar percentile
    # aggs each paid their own — measured 2.2x the r12 entry)
    g = li.groupBy("l_returnflag").agg(
        F.expr("percentile(CAST(l_extendedprice AS DOUBLE), "
               "array(0.495D, 0.5D, 0.505D))").alias("pcts"),
        F.percentile_approx(price, 0.5, 10000).alias("approx"),
        F.count("*").alias("n_rows"))
    lo, m, hi = (F.col("pcts")[i] for i in range(3))
    in_bound = (F.col("approx") >= lo) & (F.col("approx") <= hi)
    return g.select(
        "l_returnflag",
        F.round(m * 200).cast("long").alias("median_x200"),
        "n_rows",
        in_bound.cast("int").alias("approx_in_bound"))


def cms_estimates(df: DataFrame, key_col: str, probe_keys: list[int],
                  eps: float = 0.001, confidence: float = 0.99,
                  seed: int = 42) -> dict[int, int]:
    """Distributed count-min sketch over `key_col`, probed for the given
    bounded key set. The sketch agg is MERGEABLE — per-partition
    sketches combine associatively inside the agg (one O(width·depth)
    blob to the driver, regardless of key cardinality or row count) —
    and over-estimates only: est >= true, est <= true + eps·N with the
    given confidence. Spark ships no SQL-side point-estimate function,
    so the bounded probe runs through the JVM sketch API driver-side."""
    blob = df.agg(F.count_min_sketch(
        key_col, F.lit(float(eps)), F.lit(float(confidence)),
        F.lit(int(seed))).alias("cms")).collect()[0].cms
    jvm = df.sparkSession._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(blob))
    return {k: sk.estimateCount(int(k)) for k in probe_keys}


CMS_DEPTH = 4
CMS_WIDTH = 2048


def _cms_bucket(plane_col, hx_col):
    """Engine-portable CMS plane hash over a PRECOMPUTED md5 hex
    digest: plane p reads its own disjoint 8-hex (32-bit) slice of
    the digest, mod width — ONE md5 per input row feeds all depth
    planes (a per-(row,plane) md5 measured 2x the whole entry)."""
    sl = F.expr(f"substring({hx_col}, {plane_col} * 8 + 1, 8)")
    return F.conv(sl, 16, 10).cast("long") % CMS_WIDTH


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (top users by event count) with exact counts next
    to their count-min-sketch estimates — the streaming-friendly
    frequency shape, graduated to an oracle pair (r12 verdict #1) by
    building the sketch from ENGINE-PORTABLE md5-derived planes
    instead of the JVM CountMinSketch blob (which stays available as
    `cms_estimates` with its own pytest evidence; the
    never-underestimates property est = min_planes(bucket count)
    ≥ true holds identically here). Plan shape at 100 TB: the plane
    expansion is map-side (literal 4-element explode), the bucket
    counts partial-aggregate into a BOUNDED table (depth×width =
    8192 rows — the sketch itself, mergeable by construction), the
    candidate set is an exact bounded top-k (TakeOrderedAndProject),
    and the probe join broadcasts 40 rows against the sketch."""
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull()).select("user_id"))
    plane = F.explode(F.array(
        *[F.lit(p) for p in range(CMS_DEPTH)])).alias("plane")
    hx = F.md5(F.col("user_id").cast("string")).alias("hx")
    counts = (ev.select(hx)                    # ONE md5 per row
                .select("hx", plane)
                .select("plane",
                        _cms_bucket("plane", "hx").alias("bucket"))
                .groupBy("plane", "bucket")
                .agg(F.count("*").alias("c")))
    top = (ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
             .orderBy(F.desc("exact_n"), "user_id").limit(10))
    probe = (top.select("user_id", "exact_n", hx)
                .select("user_id", "exact_n", "hx", plane)
                .select("user_id", "exact_n", "plane",
                        _cms_bucket("plane", "hx").alias("bucket")))
    return (counts.join(F.broadcast(probe), ["plane", "bucket"])
                  .groupBy("user_id", "exact_n")
                  .agg(F.min("c").alias("cms_n"))
                  .select("user_id", "exact_n", "cms_n",
                          (F.col("cms_n") - F.col("exact_n"))
                          .alias("overestimate")))


# --- Misra–Gries batch twin (VERDICT r6 #7): the streaming heavy
#     hitters operator (streaming/heavy_hitters.py) replayed over a
#     batch fixture, joined to EXACT counts, with the error-bound
#     artifact emitted per row. Rows-only BY NATURE, documented here:
#     an MG summary is a sequential left-to-right fold whose surviving
#     keys depend on arrival order — not expressible as (order-free)
#     SQL, so hash-parity with a DuckDB twin is impossible even though
#     the replay below is deterministic (each shard's rows are sorted
#     by (ts, event_id) before folding). What IS checkable is the
#     GUARANTEE, and it rides in the output: per surviving key,
#     bound = floor(n_shard/(C+1)) and the two inequality flags
#     exact - bound <= est <= exact; tests/test_approx.py additionally
#     pins the presence guarantee (every key with true_count >
#     n_shard/(C+1) survives) against the exact counts. ---
MG_BATCH_CAPACITY = 16  # small enough that decrements fire on fixtures
MG_BATCH_SHARDS = 4


def mg_batch_summary(df: DataFrame, key_col: str, order_cols: list[str],
                     capacity: int = MG_BATCH_CAPACITY,
                     n_shards: int = MG_BATCH_SHARDS) -> DataFrame:
    """(shard, key, est_count, n_shard): the streaming operator's exact
    per-shard fold, run as one applyInPandas over hash shards — each
    group sorts its slice by order_cols so the fold (and therefore the
    summary) is deterministic and restart-independent."""
    from ..streaming.heavy_hitters import mg_update
    from .sampling import _hash_bucket

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        summary: dict[str, int] = {}
        for k in pdf["_key"]:
            mg_update(summary, str(k), capacity)
        return pd.DataFrame({
            "shard": int(pdf["_shard"].iloc[0]),
            "key": list(summary.keys()),
            "est_count": [int(v) for v in summary.values()],
            "n_shard": len(pdf),
        })

    keyed = df.select(
        _hash_bucket(F.col(key_col), n_shards).cast("int").alias("_shard"),
        F.col(key_col).cast("string").alias("_key"), *order_cols)
    return keyed.groupBy("_shard").applyInPandas(
        fold, "shard int, key string, est_count long, n_shard long")


def mg_vs_exact_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per surviving key: MG estimate vs exact count plus the n/(C+1)
    error-bound artifact and both guarantee flags. The per-key frame is
    order-DEPENDENT (which keys survive, and their est_count, depend on
    the fold order) — pytest evidence only; the registered query below
    is its order-independent projection."""
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull())
          .select("user_id", "ts", "event_id"))
    mg = mg_batch_summary(ev, "user_id", ["ts", "event_id"])
    exact = (ev.groupBy(F.col("user_id").cast("string").alias("key"))
               .agg(F.count("*").alias("exact_count")))
    bound = F.floor(F.col("n_shard") / (MG_BATCH_CAPACITY + 1))
    return (mg.join(exact, "key")
              .select("shard", "key", "est_count", "exact_count",
                      "n_shard", bound.alias("err_bound"),
                      (F.col("est_count") <= F.col("exact_count"))
                      .alias("le_exact"),
                      (F.col("exact_count") - F.col("est_count")
                       <= bound).alias("within_bound")))
    # O(C · shards) rows: unsorted


def q_hh_mg_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graduated r14 (the cms/approx_quantiles bounded-guarantee
    recipe): the MG summary itself is a sequential fold whose surviving
    keys depend on arrival order — un-hashable — but its PUBLISHED
    GUARANTEES are order-free, so the registered surface is one row per
    shard holding (a) exact SQL-recomputable stats — n_shard, n_keys,
    the count of heavy keys (exact·(C+1) > n_shard), max exact count,
    the floor(n/(C+1)) error bound — and (b) the guarantees as asserted
    flags DuckDB emits as literal 1: summary size ≤ C, every heavy key
    survives, every estimate ≤ exact, every underestimate ≤ the bound,
    and the fold's own n_shard agrees with the exact side. Any MG
    implementation drift now reads as a value-hash mismatch. Shard
    assignment is the portable 60-bit-md5 bucket, so both engines
    compute identical shards."""
    from .sampling import _hash_bucket

    cap = MG_BATCH_CAPACITY
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull())
          .select("user_id", "ts", "event_id"))
    mg = mg_batch_summary(ev, "user_id", ["ts", "event_id"])
    exact = (ev.groupBy(
                 _hash_bucket(F.col("user_id"), MG_BATCH_SHARDS)
                 .cast("int").alias("shard"),
                 F.col("user_id").cast("string").alias("key"))
               .agg(F.count("*").alias("exact_count")))
    totals = (exact.groupBy("shard")
                   .agg(F.sum("exact_count").alias("n_shard_exact")))
    j = (exact
         .join(F.broadcast(totals), "shard")
         .join(mg.select("shard", "key", "est_count",
                         F.col("n_shard").alias("n_shard_mg")),
               ["shard", "key"], "left"))
    heavy = (F.col("exact_count") * (cap + 1) > F.col("n_shard_exact"))
    survived = F.col("est_count").isNotNull()
    bound = F.floor(F.col("n_shard_exact") / (cap + 1))
    flag = lambda bad: F.min(F.when(bad, 0).otherwise(1))  # noqa: E731
    return (j.groupBy("shard").agg(
        F.max("n_shard_exact").alias("n_shard"),
        F.count("*").alias("n_keys"),
        F.sum(heavy.cast("int")).alias("n_heavy"),
        F.max("exact_count").alias("max_exact"),
        F.max(bound).alias("err_bound"),
        (F.sum(survived.cast("int")) <= cap).cast("int")
        .alias("mg_size_le_capacity"),
        flag(heavy & ~survived).alias("all_heavy_survived"),
        flag(survived & (F.col("est_count") > F.col("exact_count")))
        .alias("all_est_le_exact"),
        flag(survived & (F.col("est_count")
                         < F.col("exact_count") - bound))
        .alias("all_est_within_bound"),
        flag(survived & (F.col("n_shard_mg")
                         != F.col("n_shard_exact")))
        .alias("n_shard_consistent")))
    # MG_BATCH_SHARDS rows: one per shard, never empty


QUERIES = {
    "approx_distinct_users": q_approx_distinct_users,    # graduated r13
    #   (born-deferred): exact count + HLL bounded-error assertion
    "hll_mergeable_distinct": q_hll_mergeable_distinct,  # graduated r13
    #   (born-deferred): merge-then-estimate vs exact global
    "approx_quantiles": q_approx_quantiles,        # graduated r13: exact
    #   median cent-exact + sketch bounded-error assertion under hash
    "cms_heavy_hitters": q_cms_heavy_hitters,      # graduated r13:
    #   portable md5-plane sketch, engine-exact
    "hh_mg_vs_exact": q_hh_mg_vs_exact,  # graduated r14: order-free
    #   per-shard guarantee surface under hash (per-key fold stays
    #   pytest evidence via mg_vs_exact_per_key)
}


def _mg_sql_shard() -> str:
    """DuckDB twin of the Spark side's portable-md5 shard bucket."""
    from .sampling import _sql_hash_bucket
    return _sql_hash_bucket("user_id", MG_BATCH_SHARDS)


def _sql_cms_bucket(plane_expr: str, hx_expr: str) -> str:
    """Plane p's bucket from its disjoint 8-hex slice of a
    precomputed md5 digest — positional hex arithmetic (exact in
    BIGINT: max 16^8) mirroring the Spark conv() path."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', "
        f"substring({hx_expr}, ({plane_expr}) * 8 + {i}, 1)) - 1)"
        f" * {16 ** (8 - i)}"
        for i in range(1, 9))
    return f"(({terms}) % {CMS_WIDTH})"


ORACLE = {
    "approx_distinct_users": """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       1 AS approx_in_bound
FROM events
GROUP BY event_type
""",
    "hll_mergeable_distinct": """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         COUNT(DISTINCT user_id) AS daily_exact
  FROM events GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM daily) AS n_days,
       (SELECT CAST(SUM(daily_exact) AS BIGINT) FROM daily)
         AS sum_daily_exact,
       COUNT(DISTINCT user_id) AS exact_global,
       1 AS merged_in_bound,
       1 AS daily_sum_ge_global
FROM events
""",
    # exact median recovered cent-exactly via ROUND(m*200); the
    # sketch's bounded-error flag is asserted as literal 1 — a drift
    # outside percentile_approx's rank-error contract reads as a hash
    # mismatch, which is the point of the pair
    "approx_quantiles": """
SELECT l_returnflag,
       CAST(ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)
                  * 200) AS BIGINT) AS median_x200,
       COUNT(*) AS n_rows,
       1 AS approx_in_bound
FROM lineitem
GROUP BY l_returnflag
""",
    "cms_heavy_hitters": f"""
WITH ev AS (
  SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS hx
  FROM events WHERE user_id IS NOT NULL
), planes(plane) AS (
  VALUES {", ".join(f"({p})" for p in range(CMS_DEPTH))}
), counts AS (
  SELECT plane,
         {_sql_cms_bucket("plane", "hx")} AS bucket,
         COUNT(*) AS c
  FROM ev CROSS JOIN planes
  GROUP BY 1, 2
), top AS (
  SELECT user_id, hx, COUNT(*) AS exact_n
  FROM ev GROUP BY user_id, hx
  ORDER BY exact_n DESC, user_id LIMIT 10
), probe AS (
  SELECT t.user_id, t.exact_n, p.plane,
         {_sql_cms_bucket("p.plane", "t.hx")} AS bucket
  FROM top t CROSS JOIN planes p
)
SELECT pr.user_id, pr.exact_n,
       MIN(c.c) AS cms_n,
       MIN(c.c) - pr.exact_n AS overestimate
FROM probe pr JOIN counts c USING (plane, bucket)
GROUP BY pr.user_id, pr.exact_n
""",
    # the MG guarantees asserted as literal 1; every other column is
    # exact SQL (portable-md5 shard, per-key counts, the n/(C+1) bound)
    "hh_mg_vs_exact": f"""
WITH per_key AS (
  SELECT CAST({_mg_sql_shard()} AS INTEGER) AS shard,
         CAST(user_id AS VARCHAR) AS key,
         COUNT(*) AS exact_count
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT shard, CAST(SUM(exact_count) AS BIGINT) AS n_shard
  FROM per_key GROUP BY 1
)
SELECT p.shard,
       t.n_shard,
       COUNT(*) AS n_keys,
       CAST(SUM(CASE WHEN p.exact_count * {MG_BATCH_CAPACITY + 1}
                          > t.n_shard THEN 1 ELSE 0 END) AS BIGINT)
         AS n_heavy,
       MAX(p.exact_count) AS max_exact,
       t.n_shard // {MG_BATCH_CAPACITY + 1} AS err_bound,
       1 AS mg_size_le_capacity,
       1 AS all_heavy_survived,
       1 AS all_est_le_exact,
       1 AS all_est_within_bound,
       1 AS n_shard_consistent
FROM per_key p JOIN tot t USING (shard)
GROUP BY 1, 2
""",
}
