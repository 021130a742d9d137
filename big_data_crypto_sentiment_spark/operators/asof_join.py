"""As-of (backward) join — attach the most recent right-side value at or
before each left row's timestamp, per key.

Not present in the reference (SURVEY.md §2.3 notes no as-of/range joins)
but it IS the relational form of the reference's resample-last
(analytical_module/arima.py:229-235) and the canonical time-series
enrichment a crypto tick store needs ("price as of tweet time").

Spark-first formulation: NO range join, NO per-row subquery. Tag-union
both sides, then one window pass per key ordered by (ts, side-tag):
`last(value, ignorenulls=True)` carries the latest right value forward
onto each left row. Right rows sort before left rows at equal
timestamps, so ties are inclusive (ts_left == ts_right matches), same
as DuckDB's ASOF JOIN (the oracle twin).

Scale notes: one shuffle on the key, local sort by (ts, tag) — exactly
the cost of a windowed aggregate over the combined stream; at 100 TB
this beats a range-condition join (which Spark would plan as
broadcast-nested-loop or a banded self-join) by orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: tuple[str, ...]) -> DataFrame:
    """left rows + latest right `value_cols` with right.ts <= left.ts.

    left: any columns incl. `key`, `ts`.
    right: `key`, `ts`, *value_cols (ts unique per key for determinism).
    Output: all left columns + value_cols (NULL when no prior right row).
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols])
    r = right.select(
        F.col(key), F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols])
    u = l.unionByName(r.select(*l.columns))
    w = (Window.partitionBy(key).orderBy(ts, "_side")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.select(
        *lcols, "_side",
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(c)
          for c in value_cols])
    return filled.filter(F.col("_side") == 1).drop("_side")
