"""Tunnel-window health probe: is this TPU session clean enough for a
deployment-loop A/B to be decidable?

The tunneled v5e's blocking-sync latency swings 3-25 ms across sessions
and can stall for minutes (CLAUDE.md); round 4's match_icp_async and
fused-ICP A/Bs ended UNDECIDED precisely because they ran in degraded
windows (204 ms/frame walls — host-dispatch-bound, so the one-sync
saving drowned). Gate: measure the round-trip latency of a trivial
dispatch + D2H pull; a window qualifies when the MEDIAN is under the
threshold (default 6 ms) and the p90 under 3x that.

Library:
    from window_health import probe
    h = probe()           # {"median_ms", "p90_ms", "ok", ...}

CLI: prints the dict; exit 0 iff ok.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(n: int = 40, threshold_ms: float = 6.0) -> dict:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tick(x):
        return x + 1

    x = jnp.zeros((8,), jnp.int32)
    tick(x).block_until_ready()  # compile
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        y = tick(x)
        _ = int(y[0])  # blocking D2H pull: one full tunnel round trip
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    med = lat[len(lat) // 2]
    p90 = lat[int(len(lat) * 0.9)]
    return {
        "median_ms": round(med, 3),
        "p90_ms": round(p90, 3),
        "min_ms": round(lat[0], 3),
        "max_ms": round(lat[-1], 3),
        "threshold_ms": threshold_ms,
        "ok": med < threshold_ms and p90 < 3 * threshold_ms,
    }


if __name__ == "__main__":
    h = probe()
    print(h)
    sys.exit(0 if h["ok"] else 1)
