"""Attribute the 10k-template e2e cost: coarse kernel vs candidate
extraction vs refinement.

Times three nested WHOLE programs (per CLAUDE.md, per-stage timings of
separately-jitted pieces are artifacts, but deltas between nested whole
programs bound each suffix stage):
  P1: frontend + coarse scoring (block on S)
  P2: P1 + extract_candidates
  P3: full match step (P2 + window refinement)  == bench e2e

Run:
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_extract_cost.py 10000
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from shape_based_matching_tpu.ops.filters import pyr_down_u8
from shape_based_matching_tpu.ops.response import build_linear_memories_fused
from shape_based_matching_tpu.ops.similarity import (
    coarse_similarity_dispatch, extract_candidates)
from shape_based_matching_tpu.utils.synthetic import (build_rotated_detector,
                                                      synthetic_scene)


def main(num_templates=10000, cap=256):
    H = W = 1024
    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=63)
    banks = det._get_banks("bench")
    scene = jnp.asarray(synthetic_scene(H, W, templ_img, n_instances=4))
    bank1 = banks[1]
    t1 = 8
    w_last = (W // 2) // t1

    @jax.jit
    def p1(image, bank):
        src1 = pyr_down_u8(image)
        lm1 = build_linear_memories_fused(src1, 30.0, t1)
        m1 = lm1.shape[-1]
        lmflat1 = jnp.concatenate([lm1.reshape(-1),
                                   jnp.zeros((m1,), jnp.uint8)])
        S, pos = coarse_similarity_dispatch(lm1, lmflat1, bank, t1,
                                            (W // 2, H // 2))
        return S

    @jax.jit
    def p2(image, bank):
        S = p1(image, bank)
        return extract_candidates(S, bank.nfeat, jnp.float32(85.0), t1,
                                  w_last, cap)

    from shape_based_matching_tpu.ops.similarity import coarse_candidates

    @jax.jit
    def p2b(image, bank):
        src1 = pyr_down_u8(image)
        lm1 = build_linear_memories_fused(src1, 30.0, t1)
        m1 = lm1.shape[-1]
        lmflat1 = jnp.concatenate([lm1.reshape(-1),
                                   jnp.zeros((m1,), jnp.uint8)])
        return coarse_candidates(lm1, lmflat1, bank, t1, (W // 2, H // 2),
                                 jnp.float32(85.0), cap)

    from __graft_entry__ import entry
    fn3, args3 = entry(num_templates=num_templates)
    p3 = jax.jit(fn3)

    progs = [("P1 coarse-only", lambda: p1(scene, bank1)),
             ("P2 +extract(i32 map)", lambda: p2(scene, bank1)),
             ("P2b +extract(cells)", lambda: p2b(scene, bank1)),
             ("P3 full e2e", lambda: p3(*args3))]
    for name, f in progs:
        jax.block_until_ready(f())

    iters = 20
    for rep in range(3):
        line = []
        for name, f in progs:
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = f()
            jax.block_until_ready(out)
            line.append(f"{name}: {(time.perf_counter()-t0)/iters*1e3:7.3f} ms")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10000)
