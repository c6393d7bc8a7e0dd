"""Paired interleaved A/B benchmark harness for the tunneled TPU.

Problem (CLAUDE.md): run-to-run dispatch jitter is ~±0.5 ms and identical
programs vary ~2x ACROSS processes, so unpaired comparisons can only
decide multi-x effects. Within one process, though, the slow factors
(host state, tunnel session) drift slowly — so interleaved A/B/A/B pairs
see the same environment and the PER-PAIR delta is informative even when
the absolute numbers are not.

Method:
  * warm both variants (compile + first dispatch),
  * run n_pairs interleaved rounds; each arm is a queue-pipelined block
    of `inner` dispatches with ONE final block_until_ready (per-execution
    overhead amortizes; XLA can't constant-fold across real dispatches),
  * alternate the within-pair order (ABBA scheme) so a linear drift
    cancels instead of biasing one arm,
  * decide with an exact binomial sign test on the per-pair deltas plus
    a bootstrap CI of the median delta.

Decision rule: p < alpha (default 0.01) AND the median-effect CI
excludes zero. Anything else is "undecided" — report, don't conclude.

Usage (library):
    from ab_bench import ab_compare
    res = ab_compare(run_a, run_b, n_pairs=50, inner=20)
    print(res.summary())

`run_a` / `run_b` are zero-arg callables that dispatch `inner`
iterations and block once (the harness times them directly).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field


def _binom_two_sided_p(k: int, n: int) -> float:
    """Exact two-sided sign-test p-value: P(X <= min(k, n-k)) * 2 under
    Binomial(n, 1/2), capped at 1."""
    if n == 0:
        return 1.0
    lo = min(k, n - k)
    total = 0.0
    for i in range(lo + 1):
        total += math.comb(n, i)
    p = 2.0 * total / (2.0 ** n)
    return min(1.0, p)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _bootstrap_median_ci(deltas, n_boot: int = 2000, alpha: float = 0.05,
                         seed: int = 0):
    """Percentile bootstrap CI for the median of `deltas` (no scipy)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    d = np.asarray(deltas)
    meds = np.median(
        d[rng.randint(0, len(d), size=(n_boot, len(d)))], axis=1)
    return (float(np.percentile(meds, 100 * alpha / 2)),
            float(np.percentile(meds, 100 * (1 - alpha / 2))))


@dataclass
class ABResult:
    name_a: str
    name_b: str
    times_a: list = field(default_factory=list)   # ms per inner iter
    times_b: list = field(default_factory=list)
    alpha: float = 0.01

    @property
    def deltas(self):
        return [a - b for a, b in zip(self.times_a, self.times_b)]

    @property
    def p_value(self) -> float:
        wins_b = sum(1 for d in self.deltas if d > 0)
        ties = sum(1 for d in self.deltas if d == 0)
        n = len(self.deltas) - ties
        return _binom_two_sided_p(wins_b, n)

    def decide(self) -> str:
        """'b_faster' / 'a_faster' / 'undecided' at the alpha level."""
        if len(self.deltas) < 10:
            return "undecided"
        lo, hi = _bootstrap_median_ci(self.deltas)
        if self.p_value < self.alpha:
            if lo > 0:
                return "b_faster"
            if hi < 0:
                return "a_faster"
        return "undecided"

    def summary(self) -> str:
        med_a, med_b = _median(self.times_a), _median(self.times_b)
        med_d = _median(self.deltas)
        lo, hi = _bootstrap_median_ci(self.deltas)
        wins_b = sum(1 for d in self.deltas if d > 0)
        n = len(self.deltas)
        speed = med_a / med_b if med_b > 0 else float("inf")
        return (
            f"A={self.name_a}: median {med_a:.4f} ms | "
            f"B={self.name_b}: median {med_b:.4f} ms | "
            f"B/A speedup {speed:.3f}x\n"
            f"pairs={n}, B faster in {wins_b}/{n}, sign-test p={self.p_value:.2e}, "
            f"median delta {med_d:+.4f} ms, 95% CI [{lo:+.4f}, {hi:+.4f}]\n"
            f"verdict: {self.decide()} (alpha={self.alpha})"
        )


def ab_compare(run_a, run_b, n_pairs: int = 50, inner: int = 20,
               name_a: str = "A", name_b: str = "B",
               warmup: int = 3, alpha: float = 0.01,
               verbose: bool = False) -> ABResult:
    """Interleaved paired comparison; see module docstring.

    run_a/run_b: zero-arg callables dispatching `inner` iterations and
    blocking once. Returns an ABResult (times in ms per inner iter).
    """
    for _ in range(warmup):
        run_a()
        run_b()

    res = ABResult(name_a=name_a, name_b=name_b, alpha=alpha)
    for i in range(n_pairs):
        order = (run_a, run_b) if i % 2 == 0 else (run_b, run_a)
        ts = []
        for fn in order:
            t0 = time.perf_counter()
            fn()
            ts.append((time.perf_counter() - t0) / inner * 1e3)
        ta, tb = (ts[0], ts[1]) if i % 2 == 0 else (ts[1], ts[0])
        res.times_a.append(ta)
        res.times_b.append(tb)
        if verbose and (i + 1) % 10 == 0:
            print(f"  pair {i + 1}/{n_pairs}: "
                  f"A {_median(res.times_a):.4f} ms, "
                  f"B {_median(res.times_b):.4f} ms, p={res.p_value:.3g}",
                  flush=True)
    return res
