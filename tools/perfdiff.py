#!/usr/bin/env python3
"""Per-query performance regression lint, with host-throttle adjudication.

Usage: python3 tools/perfdiff.py <new_bench.json> <old_bench.json> [ratio] [abs_s]

Compares the per-query medians of two graft.Bench JSON artifacts (the
`queries` map) and FAILS (exit 1) when any query shared by both runs got
slower by more than `ratio` (default 1.5x) AND by more than `abs_s`
seconds absolute (default 0.3 s) — the double condition keeps sub-0.1 s
queries from tripping the gate on scheduler jitter while still catching
the json_props_stats / range_join_events class of silent constant-factor
drift on unchanged plans.

Self-adjudication: this VM throttles in multi-minute windows (BASELINE.md
documents the signature), so a raw flag is not yet a verdict. Each flagged
query is classified from evidence already inside the NEW artifact:

  1. REP-REPRODUCED: some rep of the flagged query ran at (close to) the
     old median — a plan regression slows EVERY execution, so one old-speed
     rep disproves the regression outright. -> WARN, not FAIL.
  2. CALIB-ELEVATED: the CPU-calibration sample nearest the query's run
     position (cpu_calib_sec joined on calib_at; legacy artifacts without
     calib_at fall back to the old every-10-queries spacing) is >= 1.4x the
     run's own minimum calib — the host was measurably degraded right
     there. -> WARN.
  3. CONTIGUOUS-CLUSTER: >= 2 other shared queries within +/-3 run-order
     positions are also >= 1.3x elevated AND the cluster spans more than
     one query family AND the nearest calib sample corroborates (>= 1.15x
     the run minimum). The calib corroboration is load-bearing: a
     regression in a widely-shared helper (a prefix pipeline, a quantizer
     primitive) slows alphabetically adjacent queries across families too
     — exactly the throttle signature — but it cannot elevate the PURE-CPU
     calib loop, so an uncorroborated cluster stays a FAIL. -> WARN.
  4. UNSTABLE-REPS: the flagged query's own reps disagree by >= 1.8x — a
     plan regression reproduces on every rep, so a median built from reps
     that wild is a measurement, not a verdict. -> WARN.

Anything flagged with NONE of the four signatures remains a FAIL: it is
uniformly and stably slow, beside a healthy calib, with healthy neighbors
— a real regression. WARNs print prominently; confirm with
SPARK_GRAFT_BENCH_ONLY=<q> SPARK_GRAFT_BENCH_REPS=5 on an idle VM if in
doubt. Legacy artifacts without calib_at carry only ~20 coarse calib
samples, so signal 2 is weaker there; artifacts from the family-boundary
calib era have a sample beside every family.

WARN-count backstop: per-flag adjudication can only excuse ISOLATED noise.
When more than max(6, 10% of shared) flags all land as WARN, the run as a
whole FAILS anyway — a library-wide slowdown (shared-helper regression,
build-config drift) would otherwise print PASS one excused query at a
time. Re-run on an idle host; a genuinely throttled artifact clears on the
re-measure, a real broad regression does not.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    # Driver artifacts wrap the bench line under "parsed".
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no per-query medians (truncated artifact?)")
    return d


def family(name):
    return name.split("_", 1)[0]


def calib_positions(d, n_queries):
    vals = d.get("cpu_calib_sec") or []
    at = d.get("calib_at")
    if at is None:
        # Legacy spacing: start, then after every 10th query, then end.
        at = [-1] + [i for i in range(9, n_queries, 10)][: max(0, len(vals) - 2)]
        at += [n_queries - 1] * (len(vals) - len(at))
    return list(zip(at, vals))


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    new = load(sys.argv[1])
    old = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    abs_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    nq, oq = new["queries"], old["queries"]
    shared = sorted(q for q in set(nq) & set(oq)
                    if isinstance(nq[q], (int, float)) and isinstance(oq[q], (int, float)))
    only_new = sorted(set(nq) - set(oq))
    only_old = sorted(set(oq) - set(nq))
    order = sorted(nq)  # the run executes alphabetically
    pos = {q: i for i, q in enumerate(order)}
    raws = new.get("raws") or {}
    calibs = calib_positions(new, len(order))
    calib_min = min((v for _, v in calibs), default=None)

    def nearest_calib(q):
        if not calibs or calib_min is None:
            return None
        return min(calibs, key=lambda c: abs(c[0] - pos[q]) - (0.5 if c[0] >= pos[q] else 0))

    def adjudicate(q, a, b):
        """Return (verdict, note) for a flagged regression a -> b."""
        clean = [r for r in raws.get(q, []) if isinstance(r, (int, float))]
        if clean and min(clean) <= a * 1.25 + 0.05:
            return ("WARN", f"rep-reproduced: min rep {min(clean):.2f}s ~ old "
                            f"{a:.2f}s — not a plan regression")
        # A retried query's medians are dominated by its end-of-run retry
        # reps; its own retry_calib (sampled right after that set) is the
        # relevant host-health reading, not a mid-run positional sample.
        rc = (new.get("retry_calib") or {}).get(q)
        if rc is not None and calib_min is not None and rc >= 1.4 * calib_min:
            return ("WARN", f"retry-calib-elevated: {rc:.3f}s = "
                            f"{rc / calib_min:.1f}x run min beside the retry set "
                            f"— host throttled")
        nc = nearest_calib(q)
        if nc is not None and nc[1] >= 1.4 * calib_min:
            return ("WARN", f"calib-elevated: calib after q#{nc[0]} = {nc[1]:.3f}s "
                            f"= {nc[1] / calib_min:.1f}x run min — host throttled")
        neighbors = [x for x in shared
                     if x != q and abs(pos[x] - pos[q]) <= 3
                     and nq[x] >= oq[x] * 1.3 and nq[x] - oq[x] > 0.1]
        if (len(neighbors) >= 2 and len({family(x) for x in neighbors + [q]}) >= 2
                and nc is not None and nc[1] >= 1.15 * calib_min):
            return ("WARN", "contiguous-cluster: also elevated nearby: "
                            + ", ".join(neighbors[:4])
                            + f" — with calib {nc[1] / calib_min:.2f}x min, "
                              "throttle-window signature")
        if len(clean) >= 2 and min(clean) > 0 and max(clean) / min(clean) >= 1.8:
            return ("WARN", f"unstable-reps: raws spread "
                            f"{min(clean):.2f}-{max(clean):.2f}s "
                            f"({max(clean) / min(clean):.1f}x) — median untrustworthy")
        return ("FAIL", "stable uniform slowdown beside healthy calib and neighbors")

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
    retried = new.get("retried") or []
    if retried:
        # Bench's in-harness adjudication already re-measured these: their
        # medians merge a contended first set with an end-of-run retry set.
        print(f"retried in-harness ({len(retried)}): {', '.join(retried)}")
    if only_new:
        print(f"new-only ({len(only_new)}): "
              f"{', '.join(only_new)} = "
              f"{sum(nq[q] for q in only_new if isinstance(nq[q], (int, float))):.1f}s")
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    for q, a, b in sorted(improvements, key=lambda x: x[1] - x[2]):
        print(f"  improved  {q}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")

    fails = 0
    for q, a, b in sorted(regressions, key=lambda x: x[1] - x[2], reverse=True):
        verdict, note = adjudicate(q, a, b)
        print(f"  {verdict:4s} slower {q}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x) [{note}]")
        if verdict == "FAIL":
            fails += 1
    if fails:
        print(f"FAIL: {fails} unexplained regression(s) beyond "
              f"{ratio}x + {abs_s}s vs {sys.argv[2]}")
        return 1
    warned = len(regressions) - fails
    warn_cap = max(6, len(shared) // 10)
    if warned > warn_cap:
        print(f"FAIL: {warned} flags all adjudicated WARN exceeds the "
              f"backstop cap {warn_cap} — per-flag excuses cannot clear a "
              "library-wide slowdown; re-measure on an idle host")
        return 1
    tail = f" ({warned} flagged, all machine-adjudicated as host noise)" if warned else ""
    print(f"PASS: no unexplained per-query regression beyond "
          f"{ratio}x + {abs_s}s vs {sys.argv[2]}{tail}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
