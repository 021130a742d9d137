"""Registry/driver-window invariants: the driver hash-checks only the
first 50 queries() entries, so the prefix must stay fully oracle-paired
and every deferred query must still be oracle-paired (checkable by
tools/check.py) — not silently demoted to rows-only."""

import __spark_entry__ as E
from big_data_crypto_sentiment_spark.queries import _DEFER_FROM_WINDOW


def test_window_prefix_is_all_oracle_paired():
    q = list(E.queries())
    o = E.oracle_sql()
    assert len(q) >= 50
    unpaired = [k for k in q[:50] if k not in o]
    assert unpaired == []


def test_deferred_queries_exist_and_stay_paired():
    q = E.queries()
    o = E.oracle_sql()
    for name in _DEFER_FROM_WINDOW:
        assert name in q and name in o, name
    # deferral covers exactly the paired overflow: nothing paired is
    # pushed out beyond it
    paired = [k for k in q if k in o]
    assert len(paired) - len(_DEFER_FROM_WINDOW) == 50


def test_every_oracle_has_a_query_and_vice_versa_names_align():
    q = E.queries()
    o = E.oracle_sql()
    assert [k for k in o if k not in q] == []
