"""Diff two bench artifacts and print per-query regressions.

Usage:
    python tools/bench_compare.py OLD NEW [threshold]

OLD/NEW each accept any of:
  * BENCH_FULL.json / BENCH_CLEAN.json (bench.py per-query maps)
  * a driver BENCH_r{N}.json   (parsed line, or regex over the tail
                                when the line outgrew the capture)
  * the raw one-line JSON bench.py prints

Queries faster than 0.2 s in the old run are ignored (sub-second
entries bounce inside scheduler/JIT noise); the default ratio
threshold is 1.5x either way.
"""

from __future__ import annotations

import json
import re
import sys

MIN_BASE_SEC = 0.2


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items() if v >= 0}
    if d.get("parsed") and d["parsed"].get("queries"):
        return {k: float(v) for k, v in d["parsed"]["queries"].items()
                if v >= 0}
    tail = d.get("tail", "")
    return {k: float(v) for k, v in
            re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)}


def compare(old: dict, new: dict, threshold: float):
    common = [k for k in old if k in new and old[k] >= MIN_BASE_SEC]
    regs, imps = [], []
    for k in common:
        ratio = new[k] / old[k] if old[k] else float("inf")
        if ratio > threshold:
            regs.append((ratio, k, old[k], new[k]))
        elif ratio < 1 / threshold:
            imps.append((ratio, k, old[k], new[k]))
    return sorted(regs, reverse=True), sorted(imps), len(common)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = load(sys.argv[1]), load(sys.argv[2])
    regs, imps, n = compare(old, new, threshold)
    print(f"compared {n} common queries (>= {MIN_BASE_SEC}s baseline), "
          f"threshold {threshold}x")
    for ratio, k, a, b in regs:
        print(f"REGRESSION {k}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x)")
    for ratio, k, a, b in imps:
        print(f"improvement {k}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x)")
    if not regs:
        print("no regressions")
    return 1 if regs else 0


if __name__ == "__main__":
    main()
