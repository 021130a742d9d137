"""Relational operator queries (SURVEY.md §2.2-2.8) over the TPC-H-ish
driver tables, each with an exact DuckDB oracle twin.

These are the reference's projection/filter/join/agg/top-k/set-op
semantics re-expressed declaratively: Catalyst supplies pushdown, column
pruning, partial aggregation, and join-strategy selection (SURVEY.md §4)
— nothing here hand-schedules a physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import sql_davg, sql_dsum, table

CUTOFF = "2024-01-15 00:00:00"  # events mid-range time filter (P10)
# same instant as epoch nanos (UTC), for the pushdown-friendly raw scan
CUTOFF_NS = 1_705_276_800 * 1_000_000_000


# --- A1/A3-style grouped aggregate with filter pushdown (TPC-H Q1 shape) ---
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(27,6)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
             .cast("double").alias("sum_disc_price"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")) * (1 + dec("l_tax")))
             .cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("l_extendedprice")).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- P8/P9/P10: membership + time-range filter, typed projection ---
def q_filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the time bound goes through load_events_range so it reaches the
    # parquet reader as a raw-nanos comparison (PushedFilters row-group
    # pruning); a filter on the converted timestamp never pushes —
    # asserted by tests/test_plan_guards.py
    from ..catalog import load_events_range
    ev = load_events_range(spark, sf_dir, CUTOFF_NS)
    return (
        ev.filter(F.col("event_type").isin("purchase", "error")
                  & F.col("value").isNotNull())
        .select("event_id", "ts", "user_id", "event_type", "value")
    )  # no global sort: output is O(input); the checker sorts rows itself


# --- J-family: equi-join orders⨝customer⨝nation + grouped agg.
#     customer/nation are small dims → Catalyst broadcast-hash (SURVEY §2.3). ---
def q_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .groupBy("n_name")
         .agg(F.count("*").alias("order_count"),
              F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
               .cast("double").alias("total_revenue"))
         .orderBy("n_name")
    )


# --- TPC-H Q5 shape: the six-way dim/fact join with a cross-dim
#     equality (customer and supplier must share a nation) — the
#     classic join-REORDERING workout. Declared with zero hints: the
#     region filter prunes nation broadcast-side, AQE picks broadcast
#     for every dim and keeps the lineitem fact unshuffled until the
#     final n_name agg; the o_orderdate range reaches the orders scan
#     as PushedFilters. Revenue decimal discipline copied verbatim
#     from the green pricing_summary pair. ---
Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1997-01-01"


def q_revenue_by_nation_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = (table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit(Q5_FROM))
                 & (F.col("o_orderdate") < F.lit(Q5_TO))))
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region") \
        .filter(F.col("r_name") == Q5_REGION)
    dec = lambda col: F.col(col).cast("decimal(27,6)")  # noqa: E731
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(s, li.l_suppkey == s.s_suppkey)
              .join(c, (o.o_custkey == c.c_custkey)
                       & (c.c_nationkey == s.s_nationkey))
              .join(n, s.s_nationkey == n.n_nationkey)
              .join(r, n.n_regionkey == r.r_regionkey)
              .groupBy("n_name")
              .agg(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
                    .cast("double").alias("revenue"),
                   F.count(F.lit(1)).alias("n_lineitems"))
              .orderBy("n_name"))  # bounded: one row per nation


# --- TPC-H Q14 shape: part ⋈ lineitem with a CASE-conditional
#     exact-decimal aggregate (promotion revenue share in a shipdate
#     window) — covers the one fixture table (`part`) no other query
#     touched, with the classic conditional-agg join plan: the dim
#     broadcasts (AQE, no hint), the shipdate range reaches the fact
#     scan as PushedFilters, and the promo branch sums WHEN-without-
#     OTHERWISE so the null-skipping sum stays exact decimal. ---
Q14_FROM, Q14_TO = "1996-01-01", "1997-01-01"


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(Q14_FROM))
                  & (F.col("l_shipdate") < F.lit(Q14_TO))))
    p = table(spark, sf_dir, "part")
    dec = lambda col: F.col(col).cast("decimal(27,6)")  # noqa: E731
    disc = dec("l_extendedprice") * (1 - dec("l_discount"))
    agg = (li.join(p, li.l_partkey == p.p_partkey)
             .agg(F.sum(F.when(F.col("p_type").startswith("PROMO"),
                               disc))
                   .cast("double").alias("promo_revenue"),
                  F.sum(disc).cast("double").alias("total_revenue")))
    return agg.select(
        "promo_revenue", "total_revenue",
        F.round((100 * F.col("promo_revenue"))
                / F.col("total_revenue"), 6).alias("promo_share_pct"))


# --- J3: left-join + fillna(0) semantics (eda Milestone4 cell 10), but as a
#     single-pass conditional aggregate: one shuffle of events instead of two
#     aggregations + a join — the scale-correct plan for self-join-on-aggregate
#     shapes (the outer-join operator itself is exercised by the flagship J2
#     and the timeseries spine join). Output identical to the join form. ---
def q_left_join_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return (ev.groupBy("user_id")
              .agg(F.count("*").alias("n_events"),
                   F.count(F.when(is_purchase, 1)).alias("n_purchases"),
                   F.coalesce(
                       F.sum(F.when(is_purchase, F.col("value"))
                              .cast("decimal(27,6)")).cast("double"),
                       F.lit(0.0)).alias("purchase_value")))


# --- O3/A6: value_counts + deterministic top-k (ties broken by key) ---
def q_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (ev.groupBy("user_id").agg(F.count("*").alias("n"))
              .orderBy(F.desc("n"), F.asc("user_id"))
              .limit(10))


# --- U1: union of filtered subsets (unionByName) ---
def q_union_event_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "event_type")
    b = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "event_type")
    return a.unionByName(b)  # O(input) output — no global sort


# --- tombstone propagation: broadcast LEFT ANTI join. The
#     right-to-be-forgotten shape: a (small) deletion list knocks every
#     matching fact row out of the corpus without shuffling the corpus —
#     the delete list broadcasts, facts stream through map-side. The
#     fixture list is a deterministic 2% hash slice of user_ids (real
#     use: a tombstone table). ---
DELETE_PCT = 2


def q_retention_after_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sampling import _hash_bucket
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    tombstones = (ev.select("user_id").distinct()
                    .filter(_hash_bucket(F.col("user_id"), 100) < DELETE_PCT))
    return (ev.join(F.broadcast(tombstones), "user_id", "left_anti")
              .groupBy("event_type")
              .agg(F.count("*").alias("n_kept"),
                   F.count_distinct("user_id").alias("n_users_kept"))
              .orderBy("event_type"))


# --- P3/P4: JSON payload parse + typed projection from map ---
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json("props", "map<string,string>").alias("m"),
    )
    return (parsed.select(
                "event_id",
                F.col("m").getItem("k").cast("long").alias("k_value"))
            .filter(F.col("k_value").isNotNull()))  # O(input) — no global sort


# --- P2: wide→long unpivot (stack), the price-explode twin ---
def q_unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (o.select(
                "o_orderkey",
                F.expr("stack(2, 'totalprice', o_totalprice, "
                       "'custkey', CAST(o_custkey AS DOUBLE)) AS (measure, val)"))
             .filter(F.col("val").isNotNull()))  # O(input) — no global sort


# --- A10: summary stats incl. exact interpolated median ---
def q_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.min("l_extendedprice").alias("min_price"),
                   F.max("l_extendedprice").alias("max_price"),
                   (F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
                    / F.count("l_extendedprice")).alias("mean_price"),
                   F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("median_price"),
                   F.count("*").alias("n"))
              .orderBy("l_returnflag"))


# --- extension: key-skew profiler — the pre-flight check before any
#     big keyed join/agg (which keys would need salting?). One count
#     per key + a broadcast 1-row total, top-N heavy hitters with
#     integer ppm shares; skew_factor = count·n_keys/total (how many
#     times the mean this key carries) as ONE correctly-rounded
#     division so both engines agree bitwise. ---
SKEW_TOP_N = 10


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # r16 (guide §1.2): the per-key counts feed both the totals agg and
    # the top-N pick — checkpoint the reduced frame so the events scan
    # + hash agg run once, not per consumer
    counts = (ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
                .localCheckpoint(eager=False))
    stats = counts.agg(F.sum("n_events").alias("total"),
                       F.count("*").alias("n_keys"))
    return (counts.crossJoin(F.broadcast(stats))
            .select("user_id", "n_events",
                    F.expr("n_events * 1000000 DIV total").alias("share_ppm"),
                    F.round(F.expr("CAST(n_events * n_keys AS DOUBLE) / total"),
                            6).alias("skew_factor"),
                    "n_keys")
            .orderBy(F.desc("n_events"), "user_id")
            .limit(SKEW_TOP_N))  # TakeOrderedAndProject: no global sort


# --- A12 + A14: single-scan data profile — missing-ratio per column plus
#     the min/max timestamp probe (one aggregate, one row; merged so both
#     stay inside the driver's correctness window) ---
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.round(F.avg(F.col("value").isNull().cast("int")), 6).alias("value_null_ratio"),
        F.round(F.avg(F.col("props").isNull().cast("int")), 6).alias("props_null_ratio"),
        F.round(F.avg(F.col("user_id").isNull().cast("int")), 6).alias("user_null_ratio"),
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"),
        F.count("*").alias("n_rows"),
    )


# --- table reconciliation: keyed diff of two snapshots ---
# The warehouse anti-entropy utility: given old/new snapshots of a keyed
# table, emit one row per difference (added / removed / changed) with
# O(differences) output. One co-partitioned full-outer join on the key;
# row content compares by md5 fingerprint so arbitrarily wide rows
# reconcile without shipping both payloads through the comparison —
# at 100 TB the join carries (key, 32-byte hash), not the rows.
def table_diff(old: DataFrame, new: DataFrame, key: str,
               fingerprint_cols: list[str]) -> DataFrame:
    """(key, status in added|removed|changed) for every difference."""
    def fp(df, alias):
        return df.select(
            F.col(key),
            F.md5(F.concat_ws("\x1f", *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x02"))
                for c in fingerprint_cols])).alias(alias))
    o, n = fp(old, "h_old"), fp(new, "h_new")
    return (o.join(n, key, "full_outer")
             .withColumn("status",
                         F.when(F.col("h_old").isNull(), F.lit("added"))
                          .when(F.col("h_new").isNull(), F.lit("removed"))
                          .when(F.col("h_old") != F.col("h_new"),
                                F.lit("changed")))
             .filter(F.col("status").isNotNull())
             .select(key, "status"))


# registered demo (planted-transform precedent): the "new" snapshot
# drops a hash slice of docs and rewrites the text of another slice
DIFF_DROP_PCT = 5     # bucket [0, 5)  -> removed
DIFF_EDIT_PCT = 10    # bucket [5, 10) -> changed


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sampling import _hash_bucket
    d = table(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"), 100)
    new = (d.filter(b >= DIFF_DROP_PCT)
            .withColumn("text",
                        F.when(b < DIFF_EDIT_PCT,
                               F.concat(F.col("text"), F.lit(" [edited]")))
                         .otherwise(F.col("text"))))
    return table_diff(d, new, "doc_id",
                      ["text", "lang", "source", "n_chars"])


# --- long→wide pivot (unpivot_order_measures' inverse): per-user
#     event-type count matrix via df.pivot with EXPLICIT values — the
#     explicit list keeps it ONE pass (values=None adds a distinct-scan
#     job first) and compiles to the same partial-combinable
#     conditional aggregate as the SQL twin; unbounded pivot keys
#     don't belong in a wide schema at scale anyway. ---
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    wide = (ev.groupBy("user_id")
              .pivot("event_type", list(EVENT_TYPES))
              .count())
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
          for t in EVENT_TYPES])  # O(users): unsorted


# --- CDC upsert / snapshot merge (table_diff's complement): apply a
#     change batch (updates + tombstone deletes) onto a base snapshot,
#     keeping the latest version per key. Spark-first shape: ONE
#     union + ONE partial-combinable hash agg (max_by per column on a
#     shared integer order key) — no per-key window sort, no join. The
#     order key is exact integer micros·2 + source-rank so delta beats
#     base at equal timestamps; callers must ensure it is unique per
#     key (one delta row per key per batch — the standard CDC compact
#     form), which the planted demo satisfies by construction. ---
UPSERT_UPDATE_PCT = 5   # hash bucket [0, 5)  -> updated (+1h, value+1)
UPSERT_DELETE_PCT = 8   # hash bucket [5, 8)  -> tombstoned


def upsert_latest(base: DataFrame, delta: DataFrame, key: str,
                  version_col: str, op_col: str,
                  cols: list[str]) -> DataFrame:
    """Merged snapshot: per key the row with the greatest
    (version, delta-beats-base) wins; rows whose winning op is 'd'
    (tombstone) drop out. `cols` are the payload columns to carry."""
    u = (base.withColumn("_src", F.lit(0))
             .unionByName(delta.withColumn("_src", F.lit(1))))
    ord_ = (F.unix_micros(F.col(version_col)) * 2
            + F.col("_src").cast("bigint"))
    picked = [F.max_by(c, ord_).alias(c)
              for c in [version_col, op_col, *cols]]
    return (u.groupBy(key).agg(*picked)
             .filter(F.col(op_col) == "u")
             .drop(op_col))


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sampling import _hash_bucket
    e = table(spark, sf_dir, "events") \
        .select("event_id", "ts", "user_id", "event_type", "value")
    b = _hash_bucket(F.col("event_id"), 100)
    base = e.withColumn("op", F.lit("u"))
    updates = (e.filter(b < UPSERT_UPDATE_PCT)
                .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
                .withColumn("value", F.col("value") + F.lit(1.0))
                .withColumn("op", F.lit("u")))
    deletes = (e.filter((b >= UPSERT_UPDATE_PCT)
                        & (b < UPSERT_DELETE_PCT))
                .withColumn("op", F.lit("d")))
    return upsert_latest(base, updates.unionByName(deletes),
                         "event_id", "ts", "op",
                         ["user_id", "event_type", "value"]
                         )  # O(snapshot): unsorted


# --- winsorization: clip numeric outliers at per-key discrete
#     percentiles — the standard numeric-cleaning op a feature pipeline
#     runs before training. DISCRETE (rank-indexed) percentiles, not
#     interpolated: the bound is an actual data value picked by exact
#     integer rank math (rn == ceil(p·n)), so both engines agree
#     bit-for-bit with no interpolation-ulp risk. One window pass per
#     key (shuffle on event_type + in-partition sort) computes rank and
#     count together; bounds join back via broadcast (|keys| rows).
#     Scale note: the per-key sort is the exact form — a 100-TB run
#     with huge single keys would swap in approx_percentile (no oracle
#     twin then) or pre-aggregate on (key, value) first; the operator
#     keeps the exact shape because the oracle pins it. ---
WINSOR_LO = 0.05
WINSOR_HI = 0.95


def q_winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ._util import dsum
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "event_id", "value"))
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"))
    lo_i = F.ceil(WINSOR_LO * F.col("n"))
    hi_i = F.ceil(WINSOR_HI * F.col("n"))
    bounds = (ranked.groupBy("event_type")
              .agg(F.min(F.when(F.col("rn") == lo_i, F.col("value")))
                    .alias("lo"),
                   F.min(F.when(F.col("rn") == hi_i, F.col("value")))
                    .alias("hi")))
    clipped = (ev.join(F.broadcast(bounds), "event_type")
                 .select("event_type", "lo", "hi", "value",
                         F.least(F.greatest("value", F.col("lo")),
                                 F.col("hi")).alias("v")))
    return (clipped.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.min("lo").alias("p_lo"),
                 F.min("hi").alias("p_hi"),
                 F.sum((F.col("value") < F.col("lo")).cast("int"))
                  .alias("n_clipped_lo"),
                 F.sum((F.col("value") > F.col("hi")).cast("int"))
                  .alias("n_clipped_hi"),
                 F.round(dsum("v") / F.count("*"), 6)
                  .alias("winsorized_mean")))


# --- Kolmogorov–Smirnov drift test: per event_type, did the VALUE
#     distribution drift between the first and second half of the time
#     range? (The numeric sibling of js_divergence_sources — feature
#     drift monitoring before a training run.) The time split uses
#     integer epoch-micros midpoint math (identical on both engines);
#     the KS statistic is max |F_a(v) − F_b(v)| over pooled values with
#     a RANGE window frame (peers included, the CDF convention both
#     engines share). Counts are integers and each CDF value is one
#     correctly-rounded division, so the max is bit-deterministic. One
#     shuffle on event_type + in-partition sort; key count is bounded
#     (per-key window is the exact form — same scale note as
#     winsorize). ---
KS_DRIFT_THRESHOLD = 0.1


def q_ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value",
                  F.unix_micros("ts").alias("us")))
    kw = Window.partitionBy("event_type")
    split = ev.select(
        "event_type", "value",
        # (min+max)/2 is double division but EXACT: epoch-micros sums sit
        # well under 2^53, so both engines halve the same integer exactly
        (F.col("us") >= (F.min("us").over(kw) + F.max("us").over(kw))
         / F.lit(2)).cast("int").alias("is_b"))
    cw = (Window.partitionBy("event_type").orderBy("value")
          .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    cdf = split.select(
        "event_type", "is_b",
        F.sum(1 - F.col("is_b")).over(cw).alias("ca"),
        F.sum("is_b").over(cw).alias("cb"),
        F.sum(F.lit(1) - F.col("is_b")).over(kw).alias("na"),
        F.sum("is_b").over(kw).alias("nb"))
    d = F.abs(F.col("ca") / F.col("na") - F.col("cb") / F.col("nb"))
    return (cdf.groupBy("event_type")
            .agg(F.min("na").alias("n_first"),
                 F.min("nb").alias("n_second"),
                 F.round(F.max(d), 6).alias("ks"))
            .select("event_type", "n_first", "n_second", "ks",
                    (F.col("ks") > KS_DRIFT_THRESHOLD).cast("int")
                    .alias("drifted")))


# --- robust outlier detection: modified z-score via the median
#     absolute deviation (Iglewicz–Hoaglin 0.6745·|x−med|/MAD > 3.5).
#     Mean/std outlier rules break under the very outliers they hunt;
#     MAD is the robust standard. Discrete medians by exact rank math
#     (the winsorize trick — both engines agree bit-for-bit, no
#     interpolation): median = value at rank ceil(n/2). Two window
#     passes per key (one for the value median, one for the deviation
#     median), bounds broadcast back, flags summed per key. ---
MAD_Z_MAX = 3.5


def q_mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "event_id", "value"))

    def _median(df, col, out):
        w = Window.partitionBy("event_type").orderBy(col, "event_id")
        n = Window.partitionBy("event_type")
        ranked = df.select(
            "event_type", F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(n).alias("n"))
        return (ranked.filter(F.col("rn") == F.ceil(F.col("n") / 2))
                      .groupBy("event_type")
                      .agg(F.min(col).alias(out)))

    med = _median(ev, "value", "med")
    dev = (ev.join(F.broadcast(med), "event_type")
             .select("event_type", "event_id",
                     F.abs(F.col("value") - F.col("med")).alias("adev")))
    mad = _median(dev, "adev", "mad")
    z = 0.6745 * F.abs(F.col("value") - F.col("med")) / F.col("mad")
    return (ev.join(F.broadcast(med), "event_type")
              .join(F.broadcast(mad), "event_type")
              .select("event_type", "med", "mad",
                      (z > MAD_Z_MAX).cast("int").alias("is_out"))
              .groupBy("event_type")
              .agg(F.count("*").alias("n"),
                   F.min("med").alias("median"),
                   F.round(F.min("mad"), 6).alias("mad"),
                   F.sum("is_out").alias("n_outliers"))
              .filter(F.col("mad") > 0))


# --- equi-width histogram profiling (the numeric-distribution probe
#     summary_stats/data_profile stop short of): per event_type, 20
#     equal-width bins over `value` with explicit bounds. Two hash aggs
#     and one broadcast: the (min, max) stats frame is tiny (one row per
#     type), broadcast back onto the scan, then one partial-combinable
#     (type, bin) count — the corpus shuffles once, keyed by a bounded
#     composite. Bin math is a single shared IEEE expression tree on
#     both engines (same ops, same order → bit-identical), with the
#     max-value row clamped into the last bin and degenerate
#     (min == max) types collapsed to bin 0. ---
HIST_BINS = 20


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value"))
    stats = ev.groupBy("event_type").agg(F.min("value").alias("mn"),
                                         F.max("value").alias("mx"))
    span = F.col("mx") - F.col("mn")
    raw_bin = F.floor((F.col("value") - F.col("mn")) / span
                      * F.lit(HIST_BINS))
    bin_ = (F.when(span == 0, F.lit(0).cast("long"))
             .otherwise(F.least(F.lit(HIST_BINS - 1).cast("long"), raw_bin)))
    lo = F.col("mn") + F.col("bin").cast("double") * span / F.lit(float(HIST_BINS))
    hi = (F.col("mn")
          + (F.col("bin") + F.lit(1)).cast("double") * span / F.lit(float(HIST_BINS)))
    return (ev.join(F.broadcast(stats), "event_type")
              .select("event_type", "mn", "mx", bin_.alias("bin"))
              .groupBy("event_type", "mn", "mx", "bin")
              .agg(F.count("*").alias("n"))
              .select("event_type", "bin",
                      F.round(lo, 6).alias("bin_lo"),
                      F.round(hi, 6).alias("bin_hi"),
                      "n")
              .orderBy("event_type", "bin"))  # bounded: types × bins


# --- equi-DEPTH companion: quantile binning via ntile — every bin
#     holds (n/k ± 1) rows, bounds follow the data (the optimizer-stats
#     / feature-bucketing shape equi-width can't give on skewed
#     columns). Total order (value, event_id) makes tile assignment
#     engine-independent under ties. Scale: one per-type window sort —
#     the winsorize/mad precedent (types are bounded; each partition
#     sorts locally, no global sort). ---
EQD_BINS = 10


def q_value_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "event_id", "value"))
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (ev.withColumn("tile", F.ntile(EQD_BINS).over(w))
              .groupBy("event_type", "tile")
              .agg(F.count("*").alias("n"),
                   F.min("value").alias("lo"),
                   F.max("value").alias("hi"))
              .orderBy("event_type", "tile"))  # bounded: types × bins


# --- higher-moment profiling: population variance + skewness from
#     EXACT decimal power sums (summary_stats stops at mean/median).
#     Built-in skewness() is out: Spark and DuckDB disagree on
#     sample-vs-population corrections AND their float accumulation
#     orders differ. Instead the raw sums Σx, Σx², Σx³ ride staged
#     decimal widths chosen so no product exceeds precision 38 —
#     (12,6)·(12,6)→(25,12), ·(12,6)→(38,18); each is exact, so both
#     engines hold identical rationals, and every downstream double op
#     is the same IEEE expression tree (m2^1.5 as m2·sqrt(m2), never
#     pow — libm/JVM pow differ by ulps). Σx⁴ (kurtosis) does NOT fit
#     width 38 — documented boundary, not an oversight. One
#     partial-combined hash agg; bounded output. ---
def q_moment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", F.col("value").cast("decimal(12,6)")
                  .alias("d")))
    d, n = F.col("d"), F.count("d")
    agg = (ev.groupBy("event_type")
             .agg(n.alias("n"),
                  F.sum(d).cast("double").alias("s1"),
                  F.sum(d * d).cast("double").alias("s2"),
                  F.sum((d * d) * d).cast("double").alias("s3")))
    mean = F.col("s1") / F.col("n")
    va = F.col("s2") / F.col("n") - mean * mean
    m3 = (F.col("s3") / F.col("n") - F.lit(3.0) * mean
          * (F.col("s2") / F.col("n")) + F.lit(2.0) * mean * mean * mean)
    return (agg.select("event_type", "n",
                       F.round(mean, 6).alias("mean"),
                       F.round(va, 6).alias("var_pop"),
                       F.round(m3 / (va * F.sqrt(va)), 6).alias("skewness"))
               .orderBy("event_type"))  # bounded: one row per type


QUERIES = {
    "moment_profile": q_moment_profile,
    "value_histogram": q_value_histogram,
    "value_quantile_bins": q_value_quantile_bins,
    "winsorize_events": q_winsorize_events,
    "mad_outlier_events": q_mad_outlier_events,
    "ks_drift_events": q_ks_drift_events,
    "table_diff": q_table_diff,
    "upsert_latest": q_upsert_latest,
    "pivot_user_events": q_pivot_user_events,
    "pricing_summary": q_pricing_summary,
    "filter_time_range": q_filter_time_range,
    "orders_by_nation": q_orders_by_nation,
    "revenue_by_nation_q5": q_revenue_by_nation_q5,
    "promo_revenue_share": q_promo_revenue_share,
    "left_join_fillna": q_left_join_fillna,
    "top_users": q_top_users,
    "union_event_slices": q_union_event_slices,
    "retention_after_deletes": q_retention_after_deletes,
    "json_props": q_json_props,
    "unpivot_order_measures": q_unpivot_order_measures,
    "summary_stats": q_summary_stats,
    "data_profile": q_data_profile,
    "key_skew_profile": q_key_skew_profile,
}

def _sql_winsorize() -> str:
    from ._util import sql_dsum
    return f"""
WITH ev AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
), bounds AS (
  SELECT event_type,
         MIN(CASE WHEN rn = CEIL({WINSOR_LO} * n) THEN value END) AS lo,
         MIN(CASE WHEN rn = CEIL({WINSOR_HI} * n) THEN value END) AS hi
  FROM ranked GROUP BY event_type
), clipped AS (
  SELECT e.event_type, b.lo, b.hi, e.value,
         LEAST(GREATEST(e.value, b.lo), b.hi) AS v
  FROM ev e JOIN bounds b USING (event_type)
)
SELECT event_type, COUNT(*) AS n,
       MIN(lo) AS p_lo, MIN(hi) AS p_hi,
       CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_lo,
       CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_hi,
       ROUND({sql_dsum('v')} / COUNT(*), 6) AS winsorized_mean
FROM clipped GROUP BY event_type
"""


_SQL_KS_CW = ("OVER (PARTITION BY event_type ORDER BY value "
              "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")

_SQL_KS = f"""
WITH ev AS (
  SELECT event_type, value, epoch_us(ts) AS us
  FROM events WHERE value IS NOT NULL
), sp AS (
  SELECT event_type, value,
         CAST(us >= (MIN(us) OVER (PARTITION BY event_type)
                     + MAX(us) OVER (PARTITION BY event_type)) / 2
              AS INT) AS is_b
  FROM ev
), cdf AS (
  SELECT event_type, is_b,
         SUM(1 - is_b) {_SQL_KS_CW} AS ca,
         SUM(is_b) {_SQL_KS_CW} AS cb,
         SUM(1 - is_b) OVER (PARTITION BY event_type) AS na,
         SUM(is_b) OVER (PARTITION BY event_type) AS nb
  FROM sp
), agg AS (
  SELECT event_type,
         CAST(MIN(na) AS BIGINT) AS n_first,
         CAST(MIN(nb) AS BIGINT) AS n_second,
         ROUND(MAX(ABS(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                       - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))), 6)
           AS ks
  FROM cdf GROUP BY event_type
)
SELECT event_type, n_first, n_second, ks,
       CAST(ks > {KS_DRIFT_THRESHOLD} AS INT) AS drifted
FROM agg
"""

_SQL_MAD = f"""
WITH ev AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
), r1 AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
), med AS (
  SELECT event_type, MIN(value) AS med FROM r1
  WHERE rn = CEIL(n / 2.0) GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.event_id, ABS(e.value - m.med) AS adev
  FROM ev e JOIN med m USING (event_type)
), r2 AS (
  SELECT event_type, adev,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY adev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type, MIN(adev) AS mad FROM r2
  WHERE rn = CEIL(n / 2.0) GROUP BY event_type
)
SELECT e.event_type, COUNT(*) AS n,
       MIN(m.med) AS median,
       ROUND(MIN(d.mad), 6) AS mad,
       CAST(SUM(CASE WHEN 0.6745 * ABS(e.value - m.med) / d.mad
                          > {MAD_Z_MAX} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM ev e JOIN med m USING (event_type) JOIN mad d USING (event_type)
GROUP BY e.event_type
HAVING ROUND(MIN(d.mad), 6) > 0
"""

ORACLE = {
    "winsorize_events": _sql_winsorize(),
    "mad_outlier_events": _SQL_MAD,
    "ks_drift_events": _SQL_KS,
    "pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  -- two traps here: (a) decimal multiplies must step widths so DuckDB
  -- never overflows 38 and silently falls back to DOUBLE products;
  -- (b) DuckDB's DECIMAL→DOUBLE cast double-rounds at high scale, so
  -- reduce the (exact, <=4-decimal) sum to scale 6 before the cast —
  -- the scaled integer then fits 2^53 and both engines cast exactly
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(27,12))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,12)) * (1 + CAST(l_tax AS DECIMAL(12,6))) AS DECIMAL(30,18))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    "filter_time_range": f"""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE event_type IN ('purchase', 'error')
  AND ts >= TIMESTAMP '{CUTOFF}'
  AND value IS NOT NULL
ORDER BY event_id
""",
    "orders_by_nation": f"""
SELECT n_name, COUNT(*) AS order_count,
       {sql_dsum('o_totalprice')} AS total_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    "revenue_by_nation_q5": f"""
SELECT n_name,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                          * (1 - CAST(l_discount AS DECIMAL(12,6)))
                     AS DECIMAL(27,12)))
            AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q5_TO} 00:00:00'
GROUP BY n_name
ORDER BY n_name
""",
    "promo_revenue_share": f"""
WITH j AS (
  SELECT p_type,
         CAST(CAST(l_extendedprice AS DECIMAL(18,6))
              * (1 - CAST(l_discount AS DECIMAL(12,6)))
           AS DECIMAL(27,12)) AS dp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q14_TO} 00:00:00'
), s AS (
  SELECT
    CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN dp END)
         AS DECIMAL(38,6)) AS DOUBLE) AS promo_revenue,
    CAST(CAST(SUM(dp) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
  FROM j
)
SELECT promo_revenue, total_revenue,
       ROUND((100 * promo_revenue) / total_revenue, 6)
         AS promo_share_pct
FROM s
""",
    "left_join_fillna": f"""
WITH base AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
), p AS (
  SELECT user_id, COUNT(*) AS n_purchases,
         {sql_dsum('value')} AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT base.user_id, n_events,
       COALESCE(n_purchases, 0) AS n_purchases,
       COALESCE(purchase_value, 0.0) AS purchase_value
FROM base LEFT JOIN p ON base.user_id = p.user_id
ORDER BY base.user_id
""",
    "top_users": """
SELECT user_id, COUNT(*) AS n FROM events
GROUP BY user_id ORDER BY n DESC, user_id ASC LIMIT 10
""",
    "union_event_slices": """
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
ORDER BY event_id
""",
    "retention_after_deletes": None,  # filled below ORACLE (hash helper)
    "json_props": """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
ORDER BY event_id
""",
    "unpivot_order_measures": """
SELECT o_orderkey, measure, val FROM (
  SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS val FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey' AS measure, CAST(o_custkey AS DOUBLE) AS val FROM orders
) WHERE val IS NOT NULL
ORDER BY o_orderkey, measure
""",
    "summary_stats": f"""
SELECT l_returnflag,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       {sql_davg('l_extendedprice')} AS mean_price,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    "key_skew_profile": f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS n_events
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
), stats AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS total, COUNT(*) AS n_keys
  FROM counts
)
SELECT user_id, n_events,
       n_events * 1000000 // total AS share_ppm,
       ROUND(CAST(n_events * n_keys AS DOUBLE) / total, 6) AS skew_factor,
       n_keys
FROM counts, stats
ORDER BY n_events DESC, user_id LIMIT {SKEW_TOP_N}
""",
    "data_profile": """
SELECT ROUND(AVG(CAST(value IS NULL AS INT)), 6) AS value_null_ratio,
       ROUND(AVG(CAST(props IS NULL AS INT)), 6) AS props_null_ratio,
       ROUND(AVG(CAST(user_id IS NULL AS INT)), 6) AS user_null_ratio,
       MIN(ts) AS min_ts, MAX(ts) AS max_ts, COUNT(*) AS n_rows
FROM events
""",
}


def _retention_sql() -> str:
    from .sampling import _sql_hash_bucket  # deferred: avoids import cycle
    hb = _sql_hash_bucket("user_id", 100)
    return f"""
SELECT event_type, COUNT(*) AS n_kept,
       COUNT(DISTINCT user_id) AS n_users_kept
FROM events
WHERE user_id IS NOT NULL AND NOT {hb} < {DELETE_PCT}
GROUP BY event_type ORDER BY event_type
"""


ORACLE["retention_after_deletes"] = _retention_sql()


def _table_diff_sql() -> str:
    from .sampling import _sql_hash_bucket
    hb = _sql_hash_bucket("doc_id", 100)
    fp = ("md5(concat_ws(chr(31), "
          "COALESCE(CAST({text} AS VARCHAR), chr(2)), "
          "COALESCE(CAST(lang AS VARCHAR), chr(2)), "
          "COALESCE(CAST(source AS VARCHAR), chr(2)), "
          "COALESCE(CAST(n_chars AS VARCHAR), chr(2))))")
    return f"""
WITH o AS (
  SELECT doc_id, {fp.format(text="text")} AS h_old FROM documents
), n AS (
  SELECT doc_id,
         {fp.format(text=f"CASE WHEN {hb} < {DIFF_EDIT_PCT} "
                         "THEN text || ' [edited]' ELSE text END")} AS h_new
  FROM documents WHERE {hb} >= {DIFF_DROP_PCT}
)
SELECT doc_id,
       CASE WHEN h_old IS NULL THEN 'added'
            WHEN h_new IS NULL THEN 'removed'
            WHEN h_old <> h_new THEN 'changed' END AS status
FROM o FULL OUTER JOIN n USING (doc_id)
WHERE (h_old IS NULL) OR (h_new IS NULL) OR (h_old <> h_new)
"""


ORACLE["table_diff"] = _table_diff_sql()


def _upsert_sql() -> str:
    from .sampling import _sql_hash_bucket  # deferred: avoids import cycle
    hb = _sql_hash_bucket("event_id", 100)
    return f"""
WITH e AS (
  SELECT event_id, ts, user_id, event_type, value, {hb} AS hb FROM events
), u AS (
  SELECT event_id, ts, user_id, event_type, value, 'u' AS op, 0 AS src
  FROM e
  UNION ALL
  SELECT event_id, ts + INTERVAL 1 HOUR, user_id, event_type,
         value + 1.0, 'u', 1
  FROM e WHERE hb < {UPSERT_UPDATE_PCT}
  UNION ALL
  SELECT event_id, ts, user_id, event_type, value, 'd', 1
  FROM e WHERE hb >= {UPSERT_UPDATE_PCT} AND hb < {UPSERT_DELETE_PCT}
), o AS (
  SELECT *, epoch_us(ts) * 2 + src AS ord FROM u
), m AS (
  SELECT event_id,
         max_by(ts, ord) AS ts, max_by(op, ord) AS op,
         max_by(user_id, ord) AS user_id,
         max_by(event_type, ord) AS event_type,
         max_by(value, ord) AS value
  FROM o GROUP BY event_id
)
SELECT event_id, ts, user_id, event_type, value FROM m WHERE op = 'u'
"""


ORACLE["upsert_latest"] = _upsert_sql()


ORACLE["pivot_user_events"] = f"""
SELECT user_id,
       {", ".join(
           f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
           f"AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id
"""


# bin math written as the SAME expression tree the Spark side builds
# (((value - mn) / (mx - mn)) * 20, floor, clamp; lo/hi = mn + bin *
# span / 20.0) so every double op matches bit-for-bit
ORACLE["value_histogram"] = f"""
WITH ev AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
), stats AS (
  SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
  FROM ev GROUP BY event_type
), binned AS (
  SELECT e.event_type, s.mn, s.mx,
         CASE WHEN s.mx - s.mn = 0 THEN CAST(0 AS BIGINT)
              ELSE LEAST(CAST({HIST_BINS - 1} AS BIGINT),
                         CAST(FLOOR((e.value - s.mn) / (s.mx - s.mn)
                                    * {HIST_BINS}) AS BIGINT))
         END AS bin
  FROM ev e JOIN stats s USING (event_type)
)
SELECT event_type, bin,
       ROUND(mn + CAST(bin AS DOUBLE) * (mx - mn) / {float(HIST_BINS)}, 6)
         AS bin_lo,
       ROUND(mn + CAST(bin + 1 AS DOUBLE) * (mx - mn) / {float(HIST_BINS)}, 6)
         AS bin_hi,
       COUNT(*) AS n
FROM binned
GROUP BY event_type, mn, mx, bin
ORDER BY event_type, bin
"""


ORACLE["value_quantile_bins"] = f"""
WITH ev AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
), t AS (
  SELECT event_type, value,
         NTILE({EQD_BINS}) OVER (PARTITION BY event_type
                                 ORDER BY value, event_id) AS tile
  FROM ev
)
SELECT event_type, CAST(tile AS INT) AS tile, COUNT(*) AS n,
       MIN(value) AS lo, MAX(value) AS hi
FROM t GROUP BY event_type, tile
ORDER BY event_type, tile
"""


# identical staged decimal widths and double expression trees as the
# Spark side; VARCHAR hop on each sum avoids DuckDB's DECIMAL->DOUBLE
# double-rounding
ORACLE["moment_profile"] = """
WITH ev AS (
  SELECT event_type, CAST(value AS DECIMAL(12,6)) AS d FROM events
  WHERE value IS NOT NULL
), agg AS (
  SELECT event_type, COUNT(d) AS n,
         CAST(CAST(SUM(d) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(d * d) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(SUM((d * d) * d) AS VARCHAR) AS DOUBLE) AS s3
  FROM ev GROUP BY event_type
)
SELECT event_type, n,
       ROUND(s1 / n, 6) AS mean,
       ROUND(s2 / n - (s1 / n) * (s1 / n), 6) AS var_pop,
       ROUND((s3 / n - 3.0 * (s1 / n) * (s2 / n)
              + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * SQRT(s2 / n - (s1 / n) * (s1 / n))), 6) AS skewness
FROM agg ORDER BY event_type
"""
