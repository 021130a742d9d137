"""Print the ML_FIT_EXPECTED frozen-fit literals for queries/ml.py:
runs ml_ar_train / ml_arma_train / ml_arma_cv / ml_auto_arima at all
three fixture SFs and emits each query's complete output rows
(floats via repr() so literals parse to the bit-identical doubles
round(·, 6) produced; the appended n_events column keys the SF).

Usage: python tools/freeze_ml_fits.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from big_data_crypto_sentiment_spark.queries import (
        all_queries,
        clear_session_caches,
    )
    from big_data_crypto_sentiment_spark.queries.ml import (
        _FROZEN_FIT_COLS,
    )
    from big_data_crypto_sentiment_spark.session import get_spark

    spark = get_spark("freeze_ml_fits",
                      extra_conf={"spark.ui.enabled": "false"})
    qs = all_queries()
    tables: dict[str, list[tuple]] = {n: [] for n in _FROZEN_FIT_COLS}
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        for name, cols in _FROZEN_FIT_COLS.items():
            rows = qs[name](spark, sf_dir).collect()
            for r in sorted(rows, key=lambda r: tuple(
                    str(r[c]) for c in cols[:2])):
                tables[name].append(
                    tuple(r[c] for c in cols) + (r["n_events"],))
        clear_session_caches()
    print("ML_FIT_EXPECTED: dict[str, tuple[tuple, ...]] = {")
    for name, rows in tables.items():
        print(f"    {name!r}: (")
        for row in rows:
            print(f"        {row!r},")
        print("    ),")
    print("}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
