"""Isolated timing of the two hot Pallas kernels at bench shapes.

coarse: K-template packed4 kernel at L1 of a 1024^2 frame (512^2, T=8).
window: 256-candidate window refinement at L0 (1024^2, T=4).

Queue-pipelined (one block at the end) so numbers are device time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_kernels.py [K] [CAP]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=50, repeats=5):
    """Min over repeats: the tunnel adds ~±0.5 ms run-to-run jitter, so
    a single averaged run cannot A/B sub-ms kernel changes."""
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
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from shape_based_matching_tpu.ops.pallas.refine_pallas import (
        refine_windows_pallas)
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        coarse_similarity_pallas)
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)
    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.response import (
        build_linear_memories_fused)

    det, templ_img = build_rotated_detector(num_templates=K,
                                            num_features=63)
    banks = det._get_banks("bench")
    scene = jnp.asarray(synthetic_scene(1024, 1024, templ_img,
                                        n_instances=4))

    l1 = pyr_down_u8(scene)
    lm1 = build_linear_memories_fused(l1, 30.0, 8, 8)
    lm0 = build_linear_memories_fused(scene, 30.0, 4, 8)
    jax.block_until_ready((lm0, lm1))

    ms = bench(lambda a: coarse_similarity_pallas(a, banks[-1], 8,
                                                  (512, 512)), lm1)
    print(f"coarse packed4  K={K}            {ms:7.3f} ms")

    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randint(0, K, CAP).astype(np.int32))
    x = jnp.asarray(rng.randint(8, 48, CAP).astype(np.int32))
    y = jnp.asarray(rng.randint(8, 48, CAP).astype(np.int32))
    valid = jnp.ones((CAP,), bool)
    ms = bench(lambda a: refine_windows_pallas(
        a, banks[0], 4, (1024, 1024), k, x, y, valid,
        jnp.float32(80.0), skip_invalid=True), lm0)
    print(f"window refine   C={CAP}           {ms:7.3f} ms")


if __name__ == "__main__":
    main()
