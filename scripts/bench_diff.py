#!/usr/bin/env python3
"""Compare two BENCH_FULL.json artifacts with host-drift normalization.

The host drifts 10-40% (sometimes monotonically across a session), so raw
round-over-round totals conflate drift with real cost. This tool estimates
the drift factor as the MEDIAN per-query ratio over queries present in
both files (a real regression moves one query far off the median; uniform
drift moves the median itself), then reports per-query deltas in
drift-corrected seconds.

Usage: bench_diff.py OLD_BENCH_FULL.json NEW_BENCH_FULL.json [--top N]
"""
import json
import sys
from statistics import median


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = dict(d.get("queries", {}))
    shared = dict(d.get("shared", {}))
    return q, shared, float(d.get("value", 0.0))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 15
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else top
    if len(args) != 2:
        sys.exit(__doc__)
    qa, sa, ta = load(args[0])
    qb, sb, tb = load(args[1])

    common = [k for k in qa if k in qb and qa[k] > 0.05]
    if not common:
        sys.exit("no overlapping queries above noise floor")
    ratios = [qb[k] / qa[k] for k in common]
    drift = median(ratios)
    print(f"old total {ta:.1f}s  new total {tb:.1f}s  "
          f"median per-query ratio (drift estimate) {drift:.3f}x")
    print(f"drift-corrected new total ~{tb / drift:.1f}s  "
          f"({len(common)} overlapping queries)\n")

    added = sorted((k for k in qb if k not in qa), key=lambda k: -qb[k])
    removed = sorted((k for k in qa if k not in qb), key=lambda k: -qa[k])
    if added:
        cost = sum(qb[k] for k in added)
        print(f"added ({cost:.2f}s raw): "
              + ", ".join(f"{k}={qb[k]:.2f}" for k in added))
    if removed:
        print("removed: " + ", ".join(f"{k}={qa[k]:.2f}" for k in removed))
    sh_added = {k: v for k, v in sb.items() if k not in sa}
    if sh_added:
        print("shared added: "
              + ", ".join(f"{k}={v:.2f}" for k, v in sh_added.items()))

    # drift-corrected regressions/improvements on the common surface
    deltas = sorted(((qb[k] / drift - qa[k], k) for k in common),
                    key=lambda t: -abs(t[0]))
    print(f"\ntop {top} drift-corrected movers (new/drift - old, sec):")
    for d, k in deltas[:top]:
        print(f"  {d:+7.2f}  {k}  ({qa[k]:.2f} -> {qb[k]:.2f} raw)")


if __name__ == "__main__":
    main()
