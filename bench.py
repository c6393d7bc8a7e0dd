"""Benchmark: full LINE-2D match step, 360 rotated templates @ 1024x1024.

Baseline (BASELINE.md): the reference CPU does response-map construction in
60 ms and matches 360 rotated templates in 7 ms (≈67 ms total per frame) on
x86. We time the complete device step — gradient extraction, quantization,
spread, response LUT, linearization, batched coarse scoring of all 360
templates, candidate extraction, and pyramid refinement — and compare
against the 67 ms end-to-end frame baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_MS = 67.0  # 60 ms response maps + 7 ms / 360-template match


def main():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    jitted = jax.jit(fn)

    # compile + warmup
    out = jitted(*args)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt_ms = (time.perf_counter() - t0) / iters * 1e3

    print(json.dumps({
        "metric": "match_1024x1024_360templates_e2e_ms",
        "value": round(dt_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / dt_ms, 2),
    }))


if __name__ == "__main__":
    main()
