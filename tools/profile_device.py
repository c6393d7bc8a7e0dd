"""Device-true prefix profiling via naked queue-pipelined timing: each
prefix of the match pipeline is dispatched R times back-to-back with ONE
block_until_ready at the end — the device queue serializes execution, so
per-call time is device time once the queue is deep (tunnel dispatch
latency overlaps). NOTE: the earlier fori-loop self-timing variant was
unreliable — XLA can constant-fold/hoist perturbed loop bodies and
under-report by 100x; prefix deltas are also confounded by scheduling,
so trust TOTALS more than deltas.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_device.py [K] [R]
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.response import (
        build_linear_memories, build_linear_memories_fused)
    from shape_based_matching_tpu.ops.pallas.refine_pallas import (
        refine_windows_pallas)
    from shape_based_matching_tpu.ops.similarity import (
        coarse_similarity_dispatch, distinct_templates, extract_candidates,
        gather_bank, refine_from_maps, use_pallas_default)
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    H = W = 1024
    T_levels = (4, 8)
    CAP = 256
    fused = use_pallas_default()

    det, templ_img = build_rotated_detector(num_templates=K, num_features=63)
    banks = det._get_banks("bench")
    bank0, bank1 = banks[0], banks[1]
    image = jnp.asarray(synthetic_scene(H, W, templ_img, n_instances=4))

    def build_lm(src, T):
        if fused:
            return build_linear_memories_fused(src, 30.0, T)
        g = quantized_orientations_gray(src, jnp.float32(30.0))
        return build_linear_memories(g.angle, T)

    def stage_outputs(image, stage):
        src1 = pyr_down_u8(image)
        lm1 = build_lm(src1, T_levels[1])
        lmflat1 = jnp.concatenate(
            [lm1.reshape(-1), jnp.zeros((lm1.shape[-1],), jnp.uint8)])
        if stage == 1:
            return (jnp.sum(lm1.astype(jnp.int32)),)
        S, _ = coarse_similarity_dispatch(lm1, lmflat1, bank1,
                                          T_levels[1], (W // 2, H // 2))
        if stage == 2:
            return (jnp.sum(S.astype(jnp.int32)),)
        k, x, y, sc, valid, n_above = extract_candidates(
            S, bank1.nfeat, jnp.float32(85.0), T_levels[1],
            (W // 2) // T_levels[1], CAP)
        if stage == 3:
            return (jnp.sum(x), n_above)
        lm0 = build_lm(image, T_levels[0])
        if stage == 4:
            return (jnp.sum(x), jnp.sum(lm0.astype(jnp.int32)))
        if fused:
            k, x, y, sc, valid = refine_windows_pallas(
                lm0, bank0, T_levels[0], (W, H), k, x, y, valid,
                jnp.float32(85.0))
            return (jnp.sum(x), jnp.sum(valid))
        lmflat0 = jnp.concatenate(
            [lm0.reshape(-1), jnp.zeros((lm0.shape[-1],), jnp.uint8)])
        slots, slot_of_k, _nd = distinct_templates(k, valid, K, 64)
        sub = gather_bank(bank0, slots)
        Sfull, _ = coarse_similarity_dispatch(
            lm0, lmflat0, sub, T_levels[0], (W, H), mask_positions=False)
        k, x, y, sc, valid = refine_from_maps(
            Sfull, slot_of_k, bank0, T_levels[0], (W, H), k, x, y, valid,
            jnp.float32(85.0))
        return (jnp.sum(x), jnp.sum(valid))

    def timed(stage):
        jr = jax.jit(lambda im: sum(jnp.int32(o) for o in
                                    stage_outputs(im, stage)))
        out = jr(image)
        jax.block_until_ready(out)
        n = 12 * R
        t0 = time.perf_counter()
        outs = [jr(image) for _ in range(n)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / n * 1e3

    names = [
        "L1 frontend (pyrdown+lm)",
        "+ coarse @L1",
        "+ extract_candidates",
        "+ L0 frontend (lm)",
        "+ window refinement",
    ]
    prev = 0.0
    for i, name in enumerate(names, 1):
        t = timed(i)
        print(f"prefix {i}: {name:28s} {t:7.3f} ms (delta {t - prev:+6.3f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
