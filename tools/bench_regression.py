#!/usr/bin/env python3
"""Per-round perf-regression guard (round-12 item: make "zero
regressions" machine-checked instead of judge-recomputed).

Usage: bench_regression.py <prev_bench_local.json> <curr_bench_local.json>

Diffs two committed same-session Spark bench artifacts and prints a
MUST-DISPOSITION list: every query present in BOTH whose Spark time
grew by MORE than 1.5x AND more than +0.3 s (both thresholds — the
ratio alone flags noise on sub-100ms queries, the delta alone flags
noise on multi-second ones; a real regression moves both). Exit 1 if
any query trips, 0 otherwise, so the end-of-round rhythm can gate on
it. New/removed queries are listed informationally, never flagged.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)
    return {k: float(v) for k, v in q.items()
            if isinstance(v, (int, float))}


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    prev, curr = load(sys.argv[1]), load(sys.argv[2])
    shared = sorted(set(prev) & set(curr))
    added = sorted(set(curr) - set(prev))
    removed = sorted(set(prev) - set(curr))
    flagged = []
    improved = 0
    for q in shared:
        p, c = prev[q], curr[q]
        if c > p * 1.5 and c > p + 0.3:
            flagged.append((q, p, c))
        elif c < p:
            improved += 1
    print(f"shared={len(shared)} added={len(added)} removed={len(removed)} "
          f"improved={improved} flagged={len(flagged)}")
    if added:
        print(f"  new queries (not gated): {', '.join(added)}")
    if removed:
        print(f"  removed queries: {', '.join(removed)}")
    if flagged:
        print("\nMUST-DISPOSITION (grew >1.5x AND >+0.3s):")
        for q, p, c in flagged:
            print(f"  {q}: {p:.3f}s -> {c:.3f}s "
                  f"({c / p:.2f}x, +{c - p:.3f}s)")
        return 1
    print("no regressions on the shared surface")
    return 0


if __name__ == "__main__":
    sys.exit(main())
