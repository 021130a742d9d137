"""Data-quality validation suite — the declarative expectation checks
(uniqueness, referential integrity, completeness, range) a warehouse
runs against every load, emitted as one auditable row per check:
(check_name, n_rows, n_violations, pass). No reference twin (the
reference pipeline validates payload bytes only, sources/validation.py
covers that); shapes follow public practice (Great Expectations / dbt
tests / Deequ).

Spark-first shapes — each check is one aggregation or one broadcast
anti join, never a row-by-row assertion loop:
  * unique_key      — groupBy(key) HAVING count>1: violations = extra
                      copies (rows minus distinct keys), one hash agg.
  * fk_integrity    — orphaned facts via LEFT ANTI against the
                      (broadcast) dimension's key set — the
                      referential-integrity shape missing from the
                      join family until now; facts never shuffle.
  * not_null        — conditional count, free in a single agg pass.
  * accepted_range / accepted_values — same conditional-count pass.
All per-table checks share ONE scan+agg per table (merged like
text_signals); the union of check rows is bounded by the number of
checks. At 100 TB each check stays a partial-combinable aggregate; the
dimension key set broadcasts (orders→customer: customers are the small
side by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import table

VALUE_LO, VALUE_HI = 0.0, 10_000.0   # accepted range for events.value
EVENT_TYPES_OK = ("click", "purchase", "signup", "view", "error")


def _check(name: str, n_rows, n_viol):
    return F.struct(F.lit(name).alias("check_name"),
                    n_rows.cast("long").alias("n_rows"),
                    n_viol.cast("long").alias("n_violations"))


def dq_events_checks(ev: DataFrame) -> DataFrame:
    """Single-scan conditional-aggregate pass over events: uniqueness
    (via distinct-count arithmetic), completeness, range, domain."""
    dup_viol = F.count("event_id") - F.count_distinct("event_id")
    checks = F.array(
        _check("events.event_id_unique", F.count("*"), dup_viol),
        _check("events.ts_not_null", F.count("*"),
               F.count(F.when(F.col("ts").isNull(), 1))),
        _check("events.user_id_not_null", F.count("*"),
               F.count(F.when(F.col("user_id").isNull(), 1))),
        _check("events.value_in_range", F.count("value"),
               F.count(F.when((F.col("value") < VALUE_LO)
                              | (F.col("value") > VALUE_HI), 1))),
        _check("events.event_type_in_domain", F.count("event_type"),
               F.count(F.when(~F.col("event_type").isin(*EVENT_TYPES_OK),
                              1))),
    )
    return (ev.agg(checks.alias("_c"))
              .select(F.explode("_c").alias("c"))
              .select("c.check_name", "c.n_rows", "c.n_violations"))


def dq_fk_orphans(facts: DataFrame, fact_key: str,
                  dim: DataFrame, dim_key: str,
                  name: str) -> DataFrame:
    """Referential integrity: count facts whose key has no dimension
    row — ONE pass: left join against the dimension's distinct key
    set, then a conditional aggregate (total + orphans from the same
    scan). NULL fact keys are a completeness problem, not a
    referential one — excluded here, the not_null family covers them.
    No hard F.broadcast() hint: a dimension key set is unbounded at
    scale (billion-key dims exist); AQE broadcasts when the runtime
    size is small and otherwise degrades to a shuffled join — a hard
    hint would override the threshold and OOM."""
    hits = (dim.select(F.col(dim_key).alias(fact_key)).distinct()
               .withColumn("_hit", F.lit(1)))
    return (facts.filter(F.col(fact_key).isNotNull())
                 .join(hits, fact_key, "left")
                 .agg(F.count("*").alias("_n"),
                      F.count(F.when(F.col("_hit").isNull(), 1))
                       .alias("_v"))
                 .select(F.lit(name).alias("check_name"),
                         F.col("_n").cast("long").alias("n_rows"),
                         F.col("_v").cast("long").alias("n_violations")))


# The fixture tables are clean — every check would trivially pass and
# the violation-counting arithmetic would never be hash-checked (the
# pii_redact / link_customer_batch precedent). So the registered query
# audits the fixture UNION a deterministic planted bad batch (a
# DQ_DIRTY_PCT hash slice re-emitted with duplicate ids, NULLed fields,
# out-of-range values, off-domain types, and orphaned FKs), built
# identically on both engines; lineitem.orderkey_fk stays clean so the
# pass outcome is exercised too. A clean-table all-pass run is pinned
# in pytest.
DQ_DIRTY_PCT = 2
DQ_ORPHAN_OFFSET = 90_000_000


def _planted_dirty_events(ev: DataFrame) -> DataFrame:
    from .sampling import _hash_bucket
    eid = F.col("event_id")
    bad = (ev.filter(_hash_bucket(eid, 100) < DQ_DIRTY_PCT)
             .select(eid,  # same id → uniqueness violations
                     F.when(eid % 3 == 0,
                            F.lit(None).cast("timestamp"))
                      .otherwise(F.col("ts")).alias("ts"),
                     F.when(eid % 2 == 0, F.lit(None).cast("long"))
                      .otherwise(F.col("user_id")).alias("user_id"),
                     F.concat(F.lit("bot_"), F.col("event_type"))
                      .alias("event_type"),
                     F.lit(VALUE_HI * 2).alias("value"),
                     F.col("props")))
    return ev.unionByName(bad)


def _planted_dirty_orders(orders: DataFrame) -> DataFrame:
    from .sampling import _hash_bucket
    bad = (orders.filter(_hash_bucket(F.col("o_orderkey"), 100)
                         < DQ_DIRTY_PCT)
                 .withColumn("o_custkey",
                             F.col("o_custkey") + DQ_ORPHAN_OFFSET))
    return orders.unionByName(bad)


def q_dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _planted_dirty_events(table(spark, sf_dir, "events"))
    orders = _planted_dirty_orders(table(spark, sf_dir, "orders"))
    customer = table(spark, sf_dir, "customer")
    lineitem = table(spark, sf_dir, "lineitem")
    rows = (dq_events_checks(ev)
            .unionByName(dq_fk_orphans(orders, "o_custkey",
                                       customer, "c_custkey",
                                       "orders.custkey_fk"))
            .unionByName(dq_fk_orphans(lineitem, "l_orderkey",
                                       orders, "o_orderkey",
                                       "lineitem.orderkey_fk")))
    return (rows.select("check_name", "n_rows", "n_violations",
                        (F.col("n_violations") == 0).cast("int")
                        .alias("pass"))
                .orderBy("check_name"))  # bounded: one row per check


QUERIES = {
    "dq_suite": q_dq_suite,
}

_DOMAIN = ", ".join(f"'{t}'" for t in EVENT_TYPES_OK)


def _sql_dirty() -> str:
    from .sampling import _sql_hash_bucket
    return f"""
events_d AS (
  SELECT * FROM events
  UNION ALL
  SELECT event_id,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE ts END AS ts,
         CASE WHEN event_id % 2 = 0 THEN NULL ELSE user_id END AS user_id,
         'bot_' || event_type AS event_type,
         {VALUE_HI * 2} AS value,
         props
  FROM events
  WHERE {_sql_hash_bucket("event_id", 100)} < {DQ_DIRTY_PCT}
), orders_d AS (
  SELECT * FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey + {DQ_ORPHAN_OFFSET}, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders
  WHERE {_sql_hash_bucket("o_orderkey", 100)} < {DQ_DIRTY_PCT}
)"""


ORACLE = {
    "dq_suite": f"""
WITH {_sql_dirty()},
checks AS (
  SELECT 'events.event_id_unique' AS check_name,
         COUNT(*) AS n_rows,
         COUNT(event_id) - COUNT(DISTINCT event_id) AS n_violations
  FROM events_d
  UNION ALL
  SELECT 'events.ts_not_null', COUNT(*),
         SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
  FROM events_d
  UNION ALL
  SELECT 'events.user_id_not_null', COUNT(*),
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
  FROM events_d
  UNION ALL
  SELECT 'events.value_in_range', COUNT(value),
         SUM(CASE WHEN value < {VALUE_LO} OR value > {VALUE_HI}
                  THEN 1 ELSE 0 END)
  FROM events_d
  UNION ALL
  SELECT 'events.event_type_in_domain', COUNT(event_type),
         SUM(CASE WHEN event_type NOT IN ({_DOMAIN}) THEN 1 ELSE 0 END)
  FROM events_d
  UNION ALL
  SELECT 'orders.custkey_fk', COUNT(*),
         SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
  FROM orders_d o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
  WHERE o.o_custkey IS NOT NULL
  UNION ALL
  SELECT 'lineitem.orderkey_fk', COUNT(*),
         SUM(CASE WHEN k.o_orderkey IS NULL THEN 1 ELSE 0 END)
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders_d) k
    ON l.l_orderkey = k.o_orderkey
  WHERE l.l_orderkey IS NOT NULL
)
SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(COALESCE(n_violations, 0) AS BIGINT) AS n_violations,
       CAST(COALESCE(n_violations, 0) = 0 AS INT) AS pass
FROM checks
ORDER BY check_name
""",
}
