#!/usr/bin/env python3
"""Per-query performance regression lint.

Usage: python3 tools/perfdiff.py <new_bench.json> <old_bench.json> [ratio] [abs_s]

Compares the per-query medians of two graft.Bench JSON artifacts (the
`queries` map) and FAILS (exit 1) when any query shared by both runs got
slower by more than `ratio` (default 1.5x) AND by more than `abs_s`
seconds absolute (default 0.3 s) — the double condition keeps sub-0.1 s
queries from tripping the gate on scheduler jitter while still catching
the json_props_stats / range_join_events class of silent constant-factor
drift on unchanged plans.

Also reports (without failing): queries only in one run, total deltas,
and the biggest improvements — a regression hidden by a bigger win
elsewhere still prints.

Interpreting a failure: re-run the flagged queries with
SPARK_GRAFT_BENCH_ONLY=<q1,q2> SPARK_GRAFT_BENCH_REPS=5 on an idle VM
first (this host throttles in windows — BASELINE.md documents the
contiguous-spike signature); a paired clean re-run that reproduces the
ratio is a real regression, one that doesn't is measurement noise.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    new = json.load(open(sys.argv[1]))
    old = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    abs_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    nq, oq = new["queries"], old["queries"]
    shared = sorted(set(nq) & set(oq))
    only_new = sorted(set(nq) - set(oq))
    only_old = sorted(set(oq) - set(nq))

    regressions, improvements = [], []
    for q in shared:
        a, b = oq[q], nq[q]
        if b > a * ratio and b - a > abs_s:
            regressions.append((q, a, b))
        elif a > b * ratio and a - b > abs_s:
            improvements.append((q, a, b))

    print(f"shared {len(shared)} queries: "
          f"old total {sum(oq[q] for q in shared):.1f}s -> "
          f"new total {sum(nq[q] for q in shared):.1f}s")
    if only_new:
        print(f"new-only ({len(only_new)}): "
              f"{', '.join(only_new)} = {sum(nq[q] for q in only_new):.1f}s")
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    for q, a, b in sorted(improvements, key=lambda x: x[1] - x[2]):
        print(f"  improved  {q}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")
    for q, a, b in sorted(regressions, key=lambda x: x[1] - x[2], reverse=True):
        print(f"  REGRESSED {q}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")
    if regressions:
        print(f"FAIL: {len(regressions)} quer{'y' if len(regressions) == 1 else 'ies'} "
              f"slower than {ratio}x + {abs_s}s vs {sys.argv[2]}")
        return 1
    print("PASS: no per-query regression beyond "
          f"{ratio}x + {abs_s}s vs {sys.argv[2]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
