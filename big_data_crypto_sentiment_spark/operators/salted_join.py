"""Salted equi-join for skewed keys.

AQE's skew-join split (enabled in session.get_spark) handles most skew
at runtime; salting is the explicit plan-level tool for the pathological
case — one key holding a double-digit percentage of the fact table, or
skew under a non-AQE engine. Technique: the fact side gets a
deterministic salt in [0, n_salts) appended to the join key; the
dimension side is replicated once per salt value (explode over a literal
range); the join key becomes (key, salt), splitting each hot key's rows
across n_salts tasks.

Cost model: dimension side inflates n_salts×, so pick n_salts ≈ the
skew factor, not more; the fact side is never duplicated. The salt is
pmod(xxhash64(whole fact row), n_salts) — deterministic (safe under
task retries, unlike rand()) and uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Join fact⋈dim on `key` with the hot keys split n_salts ways.

    Output columns = fact columns + dim's non-key columns (like a plain
    `fact.join(dim, key)`); row multiplicity identical to the unsalted
    join for inner/left joins on a unique-keyed dim.
    """
    salt_f = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                    F.lit(n_salts)).cast("int")
    fact_s = fact.withColumn("_salt", salt_f)
    dim_s = (dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))))
    out = fact_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")
