"""Data-layout queries: the Z-order (Morton) clustering key, oracle-
checked as exact integer math. The layout WRITER built on this key
(`operators/zorder.py:write_zordered`) is a sink — its data-skipping
payoff is pinned by tests/test_zorder.py (parquet footer-stats pruning
vs a hash layout); this query hash-checks the key construction itself
(quantization + bit interleave) against DuckDB at all SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.zorder import ZORDER_BITS, quantize, sql_zorder_key, zorder_key
from ._util import table


def q_zorder_key_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, l_linenumber, qx, qy, zkey) — the clustering key a
    z-ordered rewrite of lineitem on (extendedprice, quantity) sorts
    by. Stats agg broadcast back as a one-row cross join (the same
    shape both engines plan as a scalar subquery / broadcast)."""
    li = (table(spark, sf_dir, "lineitem")
          .filter(F.col("l_extendedprice").isNotNull()
                  & F.col("l_quantity").isNotNull())
          .select("l_orderkey", "l_linenumber",
                  "l_extendedprice", "l_quantity"))
    stats = li.agg(F.min("l_extendedprice").alias("xmn"),
                   F.max("l_extendedprice").alias("xmx"),
                   F.min("l_quantity").alias("ymn"),
                   F.max("l_quantity").alias("ymx"))
    qx = quantize(F.col("l_extendedprice"), F.col("xmn"), F.col("xmx"))
    qy = quantize(F.col("l_quantity"), F.col("ymn"), F.col("ymx"))
    return (li.crossJoin(F.broadcast(stats))
              .select("l_orderkey", "l_linenumber",
                      qx.alias("qx"), qy.alias("qy"))
              .select("l_orderkey", "l_linenumber", "qx", "qy",
                      zorder_key(F.col("qx"), F.col("qy")).alias("zkey"))
            )  # O(input): unsorted


QUERIES = {
    "zorder_key_lineitem": q_zorder_key_lineitem,
}

_N = 1 << ZORDER_BITS

ORACLE = {
    "zorder_key_lineitem": f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
), stats AS (
  SELECT MIN(l_extendedprice) AS xmn, MAX(l_extendedprice) AS xmx,
         MIN(l_quantity) AS ymn, MAX(l_quantity) AS ymx
  FROM li
), q AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN xmx = xmn THEN CAST(0 AS BIGINT)
              ELSE LEAST(CAST({_N - 1} AS BIGINT),
                         CAST(FLOOR((l_extendedprice - xmn) / (xmx - xmn)
                                    * {_N}) AS BIGINT)) END AS qx,
         CASE WHEN ymx = ymn THEN CAST(0 AS BIGINT)
              ELSE LEAST(CAST({_N - 1} AS BIGINT),
                         CAST(FLOOR((l_quantity - ymn) / (ymx - ymn)
                                    * {_N}) AS BIGINT)) END AS qy
  FROM li CROSS JOIN stats
)
SELECT l_orderkey, l_linenumber, qx, qy,
       {sql_zorder_key("qx", "qy")} AS zkey
FROM q
""",
}
