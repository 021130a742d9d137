"""Record linkage / entity resolution: match a dirty inbound batch of
customer records against the clean master table — blocking join first,
multi-field verification second. The record-level completion of the
fuzzy-matching family (queries/dedup.py:fuzzy_term_pairs is the
term-level SymSpell core this reuses for blocking).

Scale shape (the whole point of blocking): candidate pairs come from an
EQUALITY join on SymSpell delete-1 signatures of the name — never an
all-pairs comparison, never a levenshtein theta-join. The dirty batch
side is typically small vs the master, and each record emits
O(len(name)) signatures, so the join is |dirty|·len + |master|·len
keyed rows; the expensive per-pair verification (levenshtein + field
agreement) runs only on blocked candidates. At 100 TB the master's
signature index is exactly the shape you'd precompute and bucket.

Verification is multi-field (the Fellegi–Sunter discipline, rule-form):
  * name levenshtein <= 1   (the blocking guarantee bound)
  * same nationkey          (exact agreement field)
  * |acctbal diff| <= BAL_TOL (numeric tolerance field)
A candidate failing ANY rule is not linked — the fixture plants some
balance perturbations beyond tolerance precisely so the driver's hash
check exercises the reject path, not just the happy path.

Fixture: the master is `customer`; the dirty batch is a deterministic
hash slice with a planted 2nd-char name deletion and an integer balance
perturbation (custkey % 7 - 3, so |Δ| = 3 cases fall outside BAL_TOL
and must be rejected). Both engines build the identical batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import table
from .dedup import _delete_sigs
from .sampling import _hash_bucket, _sql_hash_bucket

DIRTY_PCT = 30        # % of customers (by key hash) forming the batch
BAL_TOL = 2.5         # max acctbal disagreement for a link
DIRTY_ID_OFFSET = 10_000_000


def link_records(dirty: DataFrame, master: DataFrame,
                 bal_tol: float = BAL_TOL) -> DataFrame:
    """(dirty_id, c_custkey, lev, bal_diff) for every dirty record that
    links to a master record under the three-rule verification.

    dirty:  (dirty_id, d_name, d_nationkey, d_acctbal)
    master: (c_custkey, c_name, c_nationkey, c_acctbal)
    """
    # each array in its own projection stage + explode_outer: the house
    # rules that keep the delete-signature transform tree out of scan
    # Filters (see fuzzy_term_pairs; plan-guard-enforced)
    d_sigs = (dirty.filter(F.col("d_name").isNotNull())
                   .select("dirty_id", "d_name", "d_nationkey", "d_acctbal",
                           _delete_sigs(F.col("d_name")).alias("_sigs"))
                   .select("dirty_id", "d_name", "d_nationkey", "d_acctbal",
                           F.explode_outer("_sigs").alias("sig")))
    m_sigs = (master.filter(F.col("c_name").isNotNull())
                    .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                            _delete_sigs(F.col("c_name")).alias("_sigs"))
                    .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                            F.explode_outer("_sigs").alias("sig")))
    cand = (d_sigs.join(m_sigs, "sig")
                  .select("dirty_id", "d_name", "d_nationkey", "d_acctbal",
                          "c_custkey", "c_name", "c_nationkey", "c_acctbal")
                  .distinct())
    lev = F.levenshtein("d_name", "c_name")
    bal_diff = F.abs(F.col("d_acctbal") - F.col("c_acctbal"))
    return (cand.filter((lev <= 1)
                        & (F.col("d_nationkey") == F.col("c_nationkey"))
                        & (bal_diff <= bal_tol))
                .select("dirty_id", "c_custkey",
                        lev.alias("lev"), bal_diff.alias("bal_diff")))


def q_link_customer_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer") \
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    nm = F.col("c_name")
    dirty = (c.filter(_hash_bucket(F.col("c_custkey"), 100) < DIRTY_PCT)
              .select((F.col("c_custkey") + DIRTY_ID_OFFSET).alias("dirty_id"),
                      F.concat(F.substring(nm, 1, 1),
                               F.substring(nm, F.lit(3), F.length(nm)))
                       .alias("d_name"),
                      F.col("c_nationkey").alias("d_nationkey"),
                      (F.col("c_acctbal")
                       + (F.col("c_custkey") % 7 - 3).cast("double"))
                      .alias("d_acctbal")))
    return link_records(dirty, c)  # O(linked batch): unsorted


QUERIES = {
    "link_customer_batch": q_link_customer_batch,
}


def _oracle_link() -> str:
    sig_list = ("list_distinct(list_append("
                "list_transform(range(1, len({n}) + 1), "
                "i -> substr({n}, 1, i - 1) || substr({n}, i + 1)), {n}))")
    return f"""
WITH master AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
  WHERE c_name IS NOT NULL
), dirty AS (
  SELECT c_custkey + {DIRTY_ID_OFFSET} AS dirty_id,
         substr(c_name, 1, 1) || substr(c_name, 3) AS d_name,
         c_nationkey AS d_nationkey,
         c_acctbal + CAST(c_custkey % 7 - 3 AS DOUBLE) AS d_acctbal
  FROM master
  WHERE {_sql_hash_bucket("c_custkey", 100)} < {DIRTY_PCT}
), ds AS (
  SELECT dirty_id, d_name, d_nationkey, d_acctbal,
         unnest({sig_list.format(n="d_name")}) AS sig
  FROM dirty
), ms AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         unnest({sig_list.format(n="c_name")}) AS sig
  FROM master
), cand AS (
  SELECT DISTINCT dirty_id, d_name, d_nationkey, d_acctbal,
                  c_custkey, c_name, c_nationkey, c_acctbal
  FROM ds JOIN ms USING (sig)
)
SELECT dirty_id, c_custkey,
       levenshtein(d_name, c_name) AS lev,
       ABS(d_acctbal - c_acctbal) AS bal_diff
FROM cand
WHERE levenshtein(d_name, c_name) <= 1
  AND d_nationkey = c_nationkey
  AND ABS(d_acctbal - c_acctbal) <= {BAL_TOL}
"""


ORACLE = {
    "link_customer_batch": _oracle_link(),
}
