"""In-process split of the frontend: fused quantize+spread Pallas kernel
vs the response+linearize stage (XLA/MXU), both pyramid levels.

OUTCOME (v5e tunnel): the per-stage numbers are ARTIFACTS. Each
separately-jitted stage reads ~0.6 ms while the composite one-jit
frontend totals 0.652 ms — impossible if the stage numbers were device
time — and trivial jit / trivial-Pallas calls cost 0.02-0.03 ms, ruling
out a fixed dispatch floor. Some per-execution overhead scales with
program footprint on this stack. Only whole-program timings are
meaningful; the frontend's one-jit 0.65 ms stands.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_frontend_split.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=50, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.pallas.frontend_pallas import (
        quant_spread_pallas)
    from shape_based_matching_tpu.ops.response import build_lm_from_spread
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_scene, synthetic_shape_image)

    templ = synthetic_shape_image(256, 0)
    scene = jnp.asarray(synthetic_scene(1024, 1024, templ, 4))
    jax.block_until_ready(scene)
    thr = jnp.float32(30.0) ** 2

    f_pyr = jax.jit(pyr_down_u8)
    l1 = jax.block_until_ready(f_pyr(scene))

    f_qs0 = jax.jit(lambda s: quant_spread_pallas(s, thr, 4))
    f_qs1 = jax.jit(lambda s: quant_spread_pallas(s, thr, 8))
    sp0 = jax.block_until_ready(f_qs0(scene))
    sp1 = jax.block_until_ready(f_qs1(l1))
    f_lm0 = jax.jit(lambda s: build_lm_from_spread(s, 4, 8))
    f_lm1 = jax.jit(lambda s: build_lm_from_spread(s, 8, 8))

    print(f"pyr_down 1024->512        {bench(f_pyr, scene):7.3f} ms")
    print(f"quant+spread L0 (1024,T4) {bench(f_qs0, scene):7.3f} ms")
    print(f"quant+spread L1 ( 512,T8) {bench(f_qs1, l1):7.3f} ms")
    print(f"resp+linearize L0         {bench(f_lm0, sp0):7.3f} ms")
    print(f"resp+linearize L1         {bench(f_lm1, sp1):7.3f} ms")

    # whole frontend in one jit for comparison (overlap effects)
    def whole(s):
        a = build_lm_from_spread(quant_spread_pallas(s, thr, 4), 4, 8)
        d = pyr_down_u8(s)
        b = build_lm_from_spread(quant_spread_pallas(d, thr, 8), 8, 8)
        return a, b

    f_whole = jax.jit(whole)
    print(f"whole frontend (one jit)  {bench(f_whole, scene):7.3f} ms")


if __name__ == "__main__":
    main()
