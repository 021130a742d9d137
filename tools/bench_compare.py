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

Host calibration (r11 verdict #1): bench.py embeds fixed-size
``calibration:*`` probes in every artifact. When BOTH sides carry
them, the host-speed factor — the geometric mean of the probes'
new/old ratios — is measured and DIVIDED OUT of every new timing
before comparing, so a shared-VM slowdown can't masquerade as a plan
regression (and a speedup can't hide one). The factor is printed;
probe entries themselves are never listed as regressions.
"""

from __future__ import annotations

import json
import math
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
            re.findall(r'"([a-z0-9_:]+)":\s*([0-9.]+)', tail)}


def calibration_factor(old: dict, new: dict) -> float | None:
    """Geometric mean of new/old over the shared calibration probes
    (start and end runs both count — averaging them absorbs within-run
    drift). None when either side predates the probes."""
    shared = [k for k in old
              if k.startswith("calibration:") and k in new
              and old[k] > 0 and new[k] > 0]
    if not shared:
        return None
    return math.exp(sum(math.log(new[k] / old[k]) for k in shared)
                    / len(shared))


def compare(old: dict, new: dict, threshold: float,
            factor: float | None = None):
    f = factor or 1.0
    common = [k for k in old if k in new and old[k] >= MIN_BASE_SEC
              and not k.startswith("calibration:")]
    regs, imps = [], []
    for k in common:
        ratio = (new[k] / f) / old[k] if old[k] else float("inf")
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
    factor = calibration_factor(old, new)
    if factor is None:
        print("no shared calibration probes: raw comparison "
              "(host-speed factor UNKNOWN — pre-r12 artifact?)")
    else:
        print(f"host-speed factor {factor:.3f}x (measured from "
              "calibration probes; new timings divided by it)")
    regs, imps, n = compare(old, new, threshold, factor)
    print(f"compared {n} common queries (>= {MIN_BASE_SEC}s baseline), "
          f"threshold {threshold}x")
    for ratio, k, a, b in regs:
        print(f"REGRESSION {k}: {a:.2f}s -> {b:.2f}s raw "
              f"({ratio:.2f}x calibrated)")
    for ratio, k, a, b in imps:
        print(f"improvement {k}: {a:.2f}s -> {b:.2f}s raw "
              f"({ratio:.2f}x calibrated)")
    if not regs:
        print("no regressions")
    return 1 if regs else 0


if __name__ == "__main__":
    main()
