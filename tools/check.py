"""Local driver-mimic: run every queries() entry on Spark and its
oracle_sql() twin on DuckDB at a given sf dir, compare row count, sorted
column names, and values (exact for non-floats, bitwise-or-1e-9-relative
for floats so we catch anything that would break a strict value hash).

Usage: python tools/check.py [sf_dir] [name_filter ...]
       python tools/check.py --all [name_filter ...]   # all 3 SFs,
           one Spark session (session caches evicted between fixtures)
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm_cell(x) for x in v))
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return ("n",)
    if hasattr(v, "isoformat"):
        try:
            if getattr(v, "tzinfo", None) is not None:
                v = v.replace(tzinfo=None)
        except Exception:
            pass
        return ("t", v.isoformat())
    try:
        if pd.isna(v):
            return ("n",)
    except (TypeError, ValueError):
        pass
    return ("v", str(v))


def norm_df(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def cells_equal(a, b, strict: bool) -> bool:
    if a == b:
        return True
    if a[0] == "f" and b[0] == "f" and not strict:
        x, y = a[1], b[1]
        if isinstance(x, str) or isinstance(y, str):
            return x == y
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
    if a[0] == "l" and b[0] == "l" and len(a[1]) == len(b[1]):
        return all(cells_equal(x, y, strict) for x, y in zip(a[1], b[1]))
    return False


def compare(name, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    issues = []
    if len(sdf) != len(ddf):
        issues.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
    if sorted(sdf.columns) != sorted(ddf.columns):
        issues.append(f"columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
    if issues:
        return issues
    s_rows, d_rows = norm_df(sdf), norm_df(ddf)
    n_exact = n_close = n_diff = 0
    first_diff = None
    for sr, dr in zip(s_rows, d_rows):
        if sr == dr:
            n_exact += 1
        elif all(cells_equal(a, b, strict=False) for a, b in zip(sr, dr)):
            n_close += 1
            if first_diff is None:
                first_diff = ("CLOSE", sr, dr)
        else:
            n_diff += 1
            if first_diff is None or first_diff[0] == "CLOSE":
                first_diff = ("DIFF", sr, dr)
    if n_diff:
        issues.append(f"{n_diff} rows differ beyond tolerance; first: {first_diff}")
    elif n_close:
        issues.append(f"HASH-RISK: {n_close} rows float-close but not bit-equal; first: {first_diff}")
    return issues


def main(sf_dir: str = SF_DIR, only: set | None = None):
    import __spark_entry__ as E
    from big_data_crypto_sentiment_spark.session import get_spark

    only = ONLY if only is None else only
    spark = get_spark("check", extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and not any(o in name for o in only):
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {str(ex)[:500]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(sdf)} (no oracle)")
            n_weak += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {str(ex)[:500]}")
            n_fail += 1
            continue
        issues = compare(name, sdf, ddf)
        if issues:
            print(f"FAIL {name}: " + " | ".join(str(i)[:600] for i in issues))
            n_fail += 1
        else:
            print(f"PASS {name} rows={len(sdf)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only), sf_dir={sf_dir}")
    # evict the per-(session, sf_dir) shared caches so a caller looping
    # several fixtures through main() in ONE process never reuses a
    # stale fixture's persisted artifacts
    from big_data_crypto_sentiment_spark.queries import clear_session_caches
    clear_session_caches()
    return 1 if n_fail else 0


if __name__ == "__main__":
    if SF_DIR == "--all":
        rc = 0
        for _sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1"):
            rc |= main(_sf, ONLY)
        sys.exit(rc)
    sys.exit(main())
