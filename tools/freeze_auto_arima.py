"""Print the AUTO_ARIMA_EXPECTED frozen-selection literals for
queries/ml.py (the ml_auto_arima_orders oracle): runs the real
KPSS + Hyndman–Khandakar selection at all three fixture SFs and emits
one (event_type, n_train, kpss_d0, d, p, q, n_fits) tuple per
(symbol, SF) — n_train disambiguates the SFs in the lookup join.
kpss_d0 is printed via repr() so the frozen literal parses to the
bit-identical double Python's round(·, 6) produced.

Usage: python tools/freeze_auto_arima.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from big_data_crypto_sentiment_spark.queries import clear_session_caches
    from big_data_crypto_sentiment_spark.queries.ml import (
        q_ml_auto_arima_orders,
    )
    from big_data_crypto_sentiment_spark.session import get_spark

    spark = get_spark("freeze_auto_arima",
                      extra_conf={"spark.ui.enabled": "false"})
    rows = []
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        for r in sorted(q_ml_auto_arima_orders(spark, sf_dir).collect(),
                        key=lambda r: (r.event_type, r.n_train)):
            rows.append((r.event_type, r.n_events, r.n_train, r.kpss_d0,
                         r.chosen_d, r.chosen_p, r.chosen_q, r.n_fits))
        clear_session_caches()
    print("AUTO_ARIMA_EXPECTED: tuple[tuple, ...] = (")
    print("    # (event_type, n_events, n_train, kpss_d0_repr,"
          " d, p, q, n_fits)")
    for et, ne, nt, k, d, p, q, nf in rows:
        print(f"    ({et!r}, {ne}, {nt}, {k!r}, {d}, {p}, {q}, {nf}),")
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
