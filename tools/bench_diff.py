#!/usr/bin/env python3
"""Reproducible shared-suite bench diff (r12 verdict item 8).

Usage: tools/bench_diff.py OLD_BENCH_FULL.json NEW_BENCH_FULL.json [N]

Diffs the per-query millisecond maps of two committed BENCH_FULL artifacts
over their SHARED query set and prints the numbers the round-close note
quotes: shared totals, median/p90 per-query ratio (new/old), and the top-N
movers in each direction. Pure committed-artifact arithmetic — no re-runs,
no re-derivation — so drift tracking is reproducible by anyone holding the
two files (the r12 verdict found a 1.047-vs-1.081 discrepancy that came
from diffing uncommitted maps).

Builder-side tooling only — the engine itself has no Python.
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    shared = sorted(k for k in old if k in new and old[k] > 0 and new[k] > 0)
    if not shared:
        print("no shared queries")
        return
    ratios = sorted(((new[k] / old[k], k) for k in shared))
    n = len(ratios)
    med = ratios[(n - 1) // 2][0] if n % 2 else (
        ratios[n // 2 - 1][0] + ratios[n // 2][0]) / 2
    # nearest-rank p90 (ceil(0.9 n) - 1), the Bench noise-block convention
    p90 = ratios[min(n - 1, max(0, -(-9 * n // 10) - 1))][0]
    t_old = sum(old[k] for k in shared) / 1000.0
    t_new = sum(new[k] for k in shared) / 1000.0
    print(f"shared queries: {n}")
    print(f"shared total:   {t_old:.1f} s -> {t_new:.1f} s  "
          f"({t_new / t_old - 1:+.1%} vs old)")
    print(f"ratio new/old:  median {med:.3f}  p90 {p90:.3f}")
    print(f"top {topn} regressions:")
    for r, k in ratios[-topn:][::-1]:
        print(f"  {k}: {old[k]} -> {new[k]} ms ({r:.2f}x)")
    print(f"top {topn} improvements:")
    for r, k in ratios[:topn]:
        print(f"  {k}: {old[k]} -> {new[k]} ms ({r:.2f}x)")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only queries ({len(only_new)}): {', '.join(only_new[:12])}"
              + (" ..." if len(only_new) > 12 else ""))
    if only_old:
        print(f"dropped queries ({len(only_old)}): {', '.join(only_old)}")


if __name__ == "__main__":
    main()
