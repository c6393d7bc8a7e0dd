"""Coarse-kernel knob retune with the paired A/B harness (ab_bench):

  * templates-per-program GROUP (amortizes per-program output DMA +
    bookkeeping — at K=10k and G=2 the kernel runs 5120 programs, so
    per-program overhead is a first-order term),
  * tree UNROLL depth.

Variants compile via the UNJITTED inner implementation wrapped in fresh
jits (the module-level jit would cache-hit across variants since the
knob isn't a traced/static arg).

Run on TPU:
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_coarse_knobs.py \
      [K] [pairs]
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from ab_bench import ab_compare
import shape_based_matching_tpu.ops.pallas.similarity_pallas as sp
from shape_based_matching_tpu.ops.similarity import pack_level_bank


def make_case(K=1000, N=63, T=8, w_img=512, h_img=512, seed=0):
    rng = np.random.RandomState(seed)
    M = (w_img // T) * (h_img // T)
    lm = jnp.asarray(rng.randint(0, 5, (8, T * T, M)).astype(np.uint8))
    templates = []
    for _ in range(K):
        feats = [(int(rng.randint(0, 48)), int(rng.randint(0, 48)),
                  int(rng.randint(0, 8))) for _ in range(N)]
        templates.append({"features": feats, "width": 48, "height": 48})
    return lm, pack_level_bank(templates), (w_img, h_img), T


def build_variant(case, group=None, unroll_cap=None):
    """Fresh-jitted coarse call with the given knob values."""
    lm, bank, size_wh, T = case
    raw = sp._coarse_similarity_pallas.__wrapped__
    old_group, old_unroll = sp._COARSE_GROUP, sp._unroll_for

    def with_knobs(fn):
        def inner(*a, **kw):
            sp._COARSE_GROUP = group if group is not None else old_group
            if unroll_cap is not None:
                sp._unroll_for = lambda rows, leaf_factor=1: min(
                    unroll_cap, max(4, old_unroll(rows, leaf_factor) * 4))
            try:
                return fn(*a, **kw)
            finally:
                sp._COARSE_GROUP = old_group
                sp._unroll_for = old_unroll
        return inner

    @partial(jax.jit, static_argnames=("tag",))
    def f(lm, bank, tag):
        return with_knobs(raw)(lm, bank, T, size_wh, False, True)

    tag = f"g{group}_u{unroll_cap}"
    out = f(lm, bank, tag=tag)  # trace+compile with knobs active
    jax.block_until_ready(out)

    def run(inner_iters=30):
        out = None
        for _ in range(inner_iters):
            out = f(lm, bank, tag=tag)
        jax.block_until_ready(out)

    return run


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    inner = 30
    case = make_case(K=K)

    base = build_variant(case)  # current defaults (G=2)
    for group in (4, 8):
        var = build_variant(case, group=group)
        res = ab_compare(lambda: base(inner), lambda: var(inner),
                         n_pairs=pairs, inner=inner,
                         name_a="G2(default)", name_b=f"G{group}")
        print(f"K={K}:")
        print(res.summary(), flush=True)

    # deeper unroll (cap 64 ~ 4x the adaptive default)
    var = build_variant(case, unroll_cap=64)
    res = ab_compare(lambda: base(inner), lambda: var(inner),
                     n_pairs=pairs, inner=inner,
                     name_a="U(default)", name_b="U4x(cap64)")
    print(res.summary(), flush=True)


if __name__ == "__main__":
    main()
