"""The bench contract line must survive the driver's finite stdout
tail capture (~2000 chars): whatever the registry grows to, the
printed JSON stays parseable and under budget, keeps the slowest
entries (the regression-relevant ones), and points at the full map."""

import json
import sys


def _summary_line():
    sys.path.insert(0, "/root/repo")
    from bench import summary_line
    return summary_line


def test_line_under_budget_with_current_registry_names():
    from big_data_crypto_sentiment_spark.queries import all_queries
    summary_line = _summary_line()
    # worst realistic widths: 4-digit seconds with 2 decimals
    timings = {n: 9999.99 for n in all_queries()}
    line = summary_line(timings, 12345.67, 0.1)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["n_queries"] == len(timings)
    assert d["full"] == "BENCH_FULL.json"
    assert len(d["queries"]) >= 40     # enough coverage for regressions


def test_slowest_entries_survive_trimming():
    summary_line = _summary_line()
    timings = {f"q{i:03d}": float(i) for i in range(300)}
    d = json.loads(summary_line(timings, 1.0, 0.01))
    kept = set(d["queries"])
    dropped = set(timings) - kept
    assert kept and dropped
    assert min(timings[k] for k in kept) >= max(
        timings[k] for k in dropped)


def test_tiny_limit_still_valid_json():
    summary_line = _summary_line()
    d = json.loads(_summary_line()({"a": 1.0}, 1.0, 0.1, limit=10))
    assert d["queries"] == {}          # no room -> head only, parseable


def test_bench_compare_loads_all_artifact_shapes(tmp_path):
    import json as _json
    sys.path.insert(0, "/root/repo/tools")
    import bench_compare as bc
    full = tmp_path / "full.json"
    full.write_text(_json.dumps(
        {"queries": {"a": 1.0, "b": 2.0, "tiny": 0.1}}))
    driver = tmp_path / "driver.json"
    driver.write_text(_json.dumps(
        {"parsed": None,
         "tail": 'garbage "a": 2.1, "b": 2.0, "tiny": 0.4 more'}))
    old, new = bc.load(str(full)), bc.load(str(driver))
    regs, imps, n = bc.compare(old, new, 1.5)
    assert n == 2                      # tiny filtered by MIN_BASE_SEC
    assert [r[1] for r in regs] == ["a"]      # 1.0 -> 2.1
    assert not imps
