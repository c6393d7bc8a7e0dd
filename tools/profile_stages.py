"""Per-stage timing of the flagship match step on the current backend.

Each stage is jitted separately (donated inputs where safe) and timed
with block_until_ready; numbers are indicative (separate launches lose
XLA fusion across stage boundaries) but good enough to rank costs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stages.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=30):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


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

    def frontend0(image):
        grads0 = quantized_orientations_gray(image, jnp.float32(30.0))
        lm0 = build_linear_memories(grads0.angle, T_levels[0])
        m0 = lm0.shape[-1]
        return lm0, jnp.concatenate([lm0.reshape(-1),
                                     jnp.zeros((m0,), jnp.uint8)])

    def frontend1(image):
        src1 = pyr_down_u8(image)
        grads1 = quantized_orientations_gray(src1, jnp.float32(30.0))
        lm1 = build_linear_memories(grads1.angle, T_levels[1])
        m1 = lm1.shape[-1]
        return lm1, jnp.concatenate([lm1.reshape(-1),
                                     jnp.zeros((m1,), jnp.uint8)])

    t_f0, (lm0, lmflat0) = bench(frontend0, image)
    t_f1, (lm1, lmflat1) = bench(frontend1, image)

    def coarse(lm1, lmflat1):
        return coarse_similarity_dispatch(lm1, lmflat1, bank1, T_levels[1],
                                          (W // 2, H // 2))

    t_coarse, (S, _) = bench(coarse, lm1, lmflat1)

    def extract(S):
        return extract_candidates(S, bank1.nfeat, jnp.float32(85.0),
                                  T_levels[1], (W // 2) // T_levels[1], CAP)

    t_ext, (k, x, y, sc, valid, n_above) = bench(extract, S)

    def distinct(k, valid):
        return distinct_templates(k, valid, K, 64)

    t_dist, (slots, slot_of_k, _nd) = bench(distinct, k, valid)

    def fine(lm0, lmflat0, slots):
        sub = gather_bank(bank0, slots)
        return coarse_similarity_dispatch(lm0, lmflat0, sub, T_levels[0],
                                          (W, H), mask_positions=False)

    t_fine, (Sfull, _) = bench(fine, lm0, lmflat0, slots)

    def refine(Sfull, slot_of_k, k, x, y, valid):
        return refine_from_maps(Sfull, slot_of_k, bank0, T_levels[0], (W, H),
                                k, x, y, valid, jnp.float32(85.0))

    t_ref, _ = bench(refine, Sfull, slot_of_k, k, x, y, valid)

    from __graft_entry__ import entry
    fn, args = entry(num_templates=K)
    t_e2e, _ = bench(fn, *args)

    rows = [
        ("frontend L0 (quant+linearize 1024^2)", t_f0),
        ("frontend L1 (pyrdown+quant+linearize)", t_f1),
        (f"coarse scoring @L1 (K={K})", t_coarse),
        ("extract_candidates", t_ext),
        ("distinct_templates", t_dist),
        ("fine maps (gather+score 64 slots @L0)", t_fine),
        ("refine_from_maps", t_ref),
    ]
    total = sum(t for _, t in rows)
    for name, t in rows:
        print(f"{name:45s} {t:7.3f} ms")
    print(f"{'sum of stages':45s} {total:7.3f} ms")
    print(f"{'e2e (one jit)':45s} {t_e2e:7.3f} ms")


if __name__ == "__main__":
    main()
