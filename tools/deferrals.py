"""Render the driver-window deferral audit table from the structured
DEFERRALS registry (queries/__init__.py) — the generated replacement for
the hand-maintained comment block COVERAGE.md used to mirror.

Usage: python tools/deferrals.py   # prints the markdown table
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render() -> str:
    from big_data_crypto_sentiment_spark.queries import (
        DEFERRALS,
        all_oracle_sql,
        all_queries,
    )
    names = list(all_queries())
    oracles = all_oracle_sql()
    lines = [
        "| deferred query | since | registry pos | family evidence in-window "
        "| independent evidence |",
        "|---|---|---|---|---|",
    ]
    for name, meta in DEFERRALS.items():
        pos = names.index(name) + 1
        assert name in oracles, f"{name} deferred but not oracle-paired"
        assert pos > 50, f"{name} deferred but sits at driver-window pos {pos}"
        lines.append(
            f"| {name} | r{meta['since']} | {pos} | {meta['family']} "
            f"| {meta['extra']} |")
    lines.append("")
    lines.append(
        f"All {len(DEFERRALS)} deferred pairs re-verified vs DuckDB at "
        "sf0.001 on every pytest run (tests/test_deferred_parity.py); "
        "`python tools/check.py <sf_dir>` covers any SF on demand.")
    return "\n".join(lines)


if __name__ == "__main__":
    print(render())
