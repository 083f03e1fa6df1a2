#!/usr/bin/env python3
"""Three-point scaling-curvature classifier for graft bench artifacts.

Usage: python3 tools/slope3.py <bench_1x.json> <bench_3x.json> <bench_10x.json>

For every query present in all three artifacts, fits the measured wall-time
ratios t(3x)/t(1x) and t(10x)/t(1x) against the candidate cost models
  linear      t ~ n          -> (3.0, 10.0)
  n log n     t ~ n log n    -> (~3.6, ~13.3)   (log base anchored at the 1x corpus)
  n^1.5       t ~ n^1.5      -> (5.20, 31.6)
  quadratic   t ~ n^2        -> (9.0, 100.0)
and reports the best-fitting model by least squared log-ratio error, with a
FIXED-COST caveat: small gates are overhead-bound (harness floor ~0.1-2 s), so
each model is also fit with an additive constant c = t(1x)*max(0, 1 - r3/3)
... rather than over-modeling, we fit model m with offset: t(n) = c + a*f(n),
solving (c, a) exactly from the 1x and 10x points and scoring the 3x residual.
The model whose predicted t(3x) lands closest (relative) wins. Queries under
0.5 s at 10x are labeled overhead-bound and not classified.

Two points cannot distinguish n^1.5 from n log n (the r17 limitation this
tool exists to remove); three can: at (3, 10) the separation between the
models' predicted mid-point is 20-40% -- well above rep noise on >1 s gates.
"""
import json, math, sys

def medians(path):
    line = open(path).read().strip().split('\n')[0]
    return json.loads(line)['queries']

MODELS = {
    'linear':    lambda n: n,
    'n·log n':   lambda n: n * (1 + math.log(n)),   # anchored: f(1)=1
    'n^1.5':     lambda n: n ** 1.5,
    'quadratic': lambda n: n ** 2,
}

def classify(t1, t3, t10):
    best, bestErr = None, 1e18
    for name, f in MODELS.items():
        # Solve t(n) = c + a*f(n) through the 1x and 10x points.
        a = (t10 - t1) / (f(10) - f(1))
        c = t1 - a * f(1)
        if a < 0:  # faster at 10x than 1x: flat/overhead-bound
            continue
        pred3 = c + a * f(3)
        err = abs(math.log(max(pred3, 1e-9) / t3))
        if err < bestErr:
            best, bestErr = name, err
    return best, bestErr

def main():
    b1, b3, b10 = (medians(p) for p in sys.argv[1:4])
    shared = sorted(set(b1) & set(b3) & set(b10))
    print(f"{'query':34s} {'t(1x)':>7s} {'t(3x)':>7s} {'t(10x)':>7s} "
          f"{'r3':>5s} {'r10':>5s}  model (3x residual)")
    for q in shared:
        t1, t3, t10 = b1[q], b3[q], b10[q]
        r3, r10 = t3 / t1, t10 / t1
        if t10 < 0.5:
            verdict = 'overhead-bound (t10 < 0.5s)'
        elif r10 < 1.5:
            verdict = 'flat (bounded-state / probe path)'
        else:
            m, err = classify(t1, t3, t10)
            verdict = f'{m} (|log resid| {err:.2f})' if m else 'sub-linear'
        print(f"{q:34s} {t1:7.2f} {t3:7.2f} {t10:7.2f} {r3:5.1f} {r10:5.1f}  {verdict}")

if __name__ == '__main__':
    main()
