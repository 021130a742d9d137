"""Time-tolerance (band/range) join — all right rows within ±tolerance
of each left row's timestamp, per key.

Not present in the reference (SURVEY.md §2.3 notes no as-of/range
joins); it is the symmetric sibling of operators/asof_join.py and the
canonical event-correlation query ("clicks within 5 minutes of an
error"). Spark has no native range join, and expressing the inequality
directly plans as a per-key cartesian (or, keyless, a broadcast
nested-loop) — quadratic in key group size.

Spark-first formulation: BUCKETIZE time at the tolerance width. A pair
with |dt| <= tol must land in the same or adjacent buckets, so emitting
each right row into its own bucket and both neighbors turns the range
predicate into an EQUI-join on (keys…, bucket) followed by an exact
|dt| filter. Buckets partition time, so every qualifying pair is seen
exactly once — no distinct needed.

Scale notes: one shuffle per side on (keys…, bucket) with the right
side tripled (bounded, predictable) — versus the nested-loop fallback
whose cost is the product of co-keyed group sizes. Bucket count scales
with the data's time span over the tolerance, so hot keys split across
buckets instead of funneling into one task. Timestamps compare in exact
integer microseconds (unix_micros ↔ DuckDB epoch_us — no float time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_tolerance_join(left: DataFrame, right: DataFrame,
                        keys: list[str], tolerance_s: int,
                        left_ts: str, right_ts: str) -> DataFrame:
    """All (left, right) pairs sharing `keys` with
    |right_ts - left_ts| <= tolerance_s. Output: left columns + right
    columns + dt_us (right minus left, signed microseconds). Column
    names must be disjoint apart from `keys`; both ts columns survive.
    """
    tol_us = int(tolerance_s) * 1_000_000
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l = left.withColumn("_us_l", l_us) \
            .withColumn("_b", F.floor(F.col("_us_l") / tol_us))
    r = right.withColumn("_us_r", r_us) \
             .withColumn("_b", F.explode(F.array(
                 F.floor(r_us / tol_us) - 1,
                 F.floor(r_us / tol_us),
                 F.floor(r_us / tol_us) + 1)))
    dt = F.col("_us_r") - F.col("_us_l")
    return (l.join(r, [*keys, "_b"])
             .filter(F.abs(dt) <= tol_us)
             .withColumn("dt_us", dt)
             .drop("_b", "_us_l", "_us_r"))
