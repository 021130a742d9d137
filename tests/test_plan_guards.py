"""Registry-wide physical-plan guards: structural enforcement of the
scale rules every query must obey at 100 TB.

  * No CartesianProduct / BroadcastNestedLoopJoin — pair generation must
    go through an equality key. Exceptions, each individually safe:
    the documented brute-force cosine baseline (`sim_topk_cosine`,
    broadcast crossJoin against a tiny query set is its stated
    contract), and the scalar one-row-broadcast pattern
    (`crossJoin(broadcast(<global aggregate>))` in key_skew_profile /
    mixture_downsample — the build side is exactly one row, so the
    "nested loop" is a single pass attaching constants).
  * No BatchEvalPython — every Python crossing must be Arrow-batched
    (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas), never a
    row-at-a-time Python UDF.

Plans are built (not executed) at sf0.001; queries that fit models at
build time run their fits on the tiny fixture.
"""

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

# query -> reason the nested loop is safe at scale
ALLOW_NESTED_LOOP = {
    "sim_topk_cosine": "documented brute-force baseline, broadcast Q",
    "sim_ivf_recall_contract": "the same brute-force exact side "
                               "(broadcast Q) feeding the recall flag",
    "key_skew_profile": "scalar one-row broadcast (global totals)",
    "mixture_downsample": "scalar one-row broadcast (global totals)",
    "zorder_key_lineitem": "scalar one-row broadcast (global min/max stats)",
    "ml_auto_arima_orders": "scalar one-row broadcast (the global event "
                            "count that keys the frozen-selection lookup)",
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in E.queries().items():
        df = fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_or_nested_loop_joins(plans):
    bad = [n for n, p in plans.items()
           if n not in ALLOW_NESTED_LOOP
           and ("CartesianProduct" in p or "BroadcastNestedLoopJoin" in p)]
    assert bad == []


def test_brute_force_baseline_is_still_broadcast(plans):
    # the allowed nested loop must at least broadcast its small side
    p = plans["sim_topk_cosine"]
    assert "BroadcastNestedLoopJoin" in p or "CartesianProduct" not in p


def test_no_row_at_a_time_python_udfs(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert bad == []


def test_no_higher_order_exprs_in_filter_conditions(plans):
    """InferFiltersFromGenerate can clone an O(n·gram) array-construction
    tree out of a Generate into a scan-stage Filter, where it re-runs
    per INPUT row below the rebalance exchange (observed: the r5
    decontam_overlap 3.8→8.8 s driver regression). Guard registry-wide:
    no physical Filter node's condition may contain a lambda-based
    higher-order function — expensive array math belongs in Project /
    Generate stages, filters must stay cheap enough to push."""
    import re
    bad = []
    for n, p in plans.items():
        for line in p.splitlines():
            if re.search(r"\bFilter\b", line) and "lambdafunction" in line:
                bad.append((n, line.strip()[:140]))
    assert bad == []


def test_time_range_scan_pushes_ts_bound(plans):
    """The S8/S10 pushdown scan must reach parquet as a raw-nanos
    comparison (row-group pruning), not a DataFilter on the converted
    timestamp — see catalog.load_events_range."""
    import re
    pushed = re.search(r"PushedFilters: \[[^\]]*\]",
                       plans["filter_time_range"]).group(0)
    assert "GreaterThanOrEqual(ts," in pushed
