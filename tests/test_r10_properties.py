"""Property pins for the r10 operators: invariants that hold for ANY
input, beyond the planted-example tests.

The Spark-side source-matrix core is checked against a brute-force
Python reference over randomized (doc, source, text) frames — the
in-group pair expansion (higher-order array exprs, positional diagonal
detection) is exactly the kind of index arithmetic a property test
catches off-by-ones in."""

from collections import Counter, defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_crypto_sentiment_spark.jobs.ann_index import (
    maintenance_due,
)

TEXTS = ["alpha beta gamma delta epsilon one",
         "alpha  Beta gamma DELTA epsilon two",   # same 5-word prefix
         "alpha beta gamma delta epsilon",
         "other words entirely here now",
         "short",
         None]
SOURCES = ["srcA", "srcB", "srcC", None]


def _ref_matrix(rows, key_fn):
    """Brute-force reference: group by key, expand pairs per group."""
    groups = defaultdict(list)
    for text, source in rows:
        if text is None or source is None:
            continue
        groups[key_fn(text)].append(source)
    out = Counter()
    for srcs in groups.values():
        if len(srcs) < 2:
            continue
        per_src = Counter(srcs)
        uniq = sorted(per_src)
        for i, a in enumerate(uniq):
            if per_src[a] >= 2:
                out[(a, a)] += 1
            for b in uniq[i + 1:]:
                out[(a, b)] += 1
    return dict(out)


def _norm(text):
    return " ".join(text.lower().split())


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.sampled_from(TEXTS),
                          st.sampled_from(SOURCES)),
                min_size=0, max_size=24))
def test_source_matrix_core_matches_bruteforce(spark, rows):
    from pyspark.sql import functions as F

    from big_data_crypto_sentiment_spark.queries import dedup as D
    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string")
    monkey = df.filter(F.col("text").isNotNull()
                       & F.col("source").isNotNull())
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    got = {(r.src_a, r.src_b): r.n_dup_groups
           for r in D._source_matrix(monkey, F.md5(norm)).collect()}
    want = _ref_matrix(rows, _norm)
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 40), st.integers(1, 10_000), st.integers(0, 10_000),
       st.integers(0, 10_000))
def test_maintenance_policy_invariants(gens, vectors, dup_extra,
                                       appended):
    rows = vectors + dup_extra
    stats = {"generations": gens, "rows": rows, "vectors": vectors,
             "clusters_used": 1,
             "full_rows": max(0, rows - appended)}
    due = maintenance_due(stats)
    # retrain and compact never both fire (retrain subsumes compact)
    assert not (due["retrain"] and due["compact"])
    # any verdict comes with at least one stated reason, and vice versa
    assert bool(due["reasons"]) == (due["retrain"] or due["compact"])
    # a pristine single-generation duplicate-free fully-owned index
    # never triggers anything
    clean = maintenance_due({"generations": 1, "rows": vectors,
                             "vectors": vectors, "full_rows": vectors})
    assert clean == {"compact": False, "retrain": False, "reasons": []}
