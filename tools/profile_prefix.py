"""Cumulative-prefix timing of the flagship match step (one jit per prefix).

Times jit(stage_1..i) for growing i; consecutive deltas are the true
in-context cost of each stage, with XLA fusion boundaries identical to the
e2e program (unlike per-stage timing, which pays launch overhead per stage).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_prefix.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp


def bench(fn, *args, iters=30):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.response import build_linear_memories
    from shape_based_matching_tpu.ops.similarity import (
        coarse_similarity_dispatch, distinct_templates, extract_candidates,
        gather_bank, refine_from_maps)
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    H = W = 1024
    T_levels = (4, 8)
    CAP = 256

    det, templ_img = build_rotated_detector(num_templates=K, num_features=63)
    banks = det._get_banks("bench")
    bank0, bank1 = banks[0], banks[1]
    image = jnp.asarray(synthetic_scene(H, W, templ_img, n_instances=4))

    def upto(stage):
        def fn(image):
            grads1 = quantized_orientations_gray(pyr_down_u8(image),
                                                 jnp.float32(30.0))
            lm1 = build_linear_memories(grads1.angle, T_levels[1])
            lmflat1 = jnp.concatenate(
                [lm1.reshape(-1), jnp.zeros((lm1.shape[-1],), jnp.uint8)])
            if stage == 1:
                return lmflat1
            S, _ = coarse_similarity_dispatch(lm1, lmflat1, bank1,
                                              T_levels[1], (W // 2, H // 2))
            if stage == 2:
                return S
            k, x, y, sc, valid, n_above = extract_candidates(
                S, bank1.nfeat, jnp.float32(85.0), T_levels[1],
                (W // 2) // T_levels[1], CAP)
            if stage == 3:
                return k, x, y, sc, valid
            slots, slot_of_k, _nd = distinct_templates(k, valid, K, 64)
            if stage == 4:
                return slots, slot_of_k
            grads0 = quantized_orientations_gray(image, jnp.float32(30.0))
            lm0 = build_linear_memories(grads0.angle, T_levels[0])
            lmflat0 = jnp.concatenate(
                [lm0.reshape(-1), jnp.zeros((lm0.shape[-1],), jnp.uint8)])
            if stage == 5:
                return lmflat0
            sub = gather_bank(bank0, slots)
            Sfull, _ = coarse_similarity_dispatch(
                lm0, lmflat0, sub, T_levels[0], (W, H), mask_positions=False)
            if stage == 6:
                return Sfull
            return refine_from_maps(Sfull, slot_of_k, bank0, T_levels[0],
                                    (W, H), k, x, y, valid, jnp.float32(85.0))
        return fn

    names = [
        "frontend L1 (pyrdown+quant+linearize)",
        "coarse scoring @L1",
        "extract_candidates",
        "distinct_templates",
        "frontend L0 (quant+linearize 1024^2)",
        "fine maps (gather+score 64 slots @L0)",
        "refine_from_maps",
    ]
    prev = 0.0
    for i, name in enumerate(names, 1):
        t = bench(upto(i), image)
        print(f"prefix {i}: +{name:42s} {t:7.3f} ms (delta {t - prev:+6.3f})")
        prev = t


if __name__ == "__main__":
    main()
