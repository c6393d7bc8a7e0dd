"""Does the coarse kernel pay for tile padding? A/B: same bank, frames
whose coarsest-level M pads to 8192 bytes (1024x1024 -> M=4096 -> rows_w
16) vs 4096 bytes (1008x1024 -> M=4032 -> rows_w 8).

If per-feature cost tracks rows_w, half the 1024^2 kernel time is
padding — motivating a chunked-grid layout with byte-granular tails.

Run on TPU:
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_pad_cost.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from ab_bench import ab_compare
from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
    coarse_similarity_pallas)
from shape_based_matching_tpu.ops.similarity import pack_level_bank


def make_case(w_img, h_img, K=1000, N=63, T=8, seed=0):
    rng = np.random.RandomState(seed)
    M = (w_img // T) * (h_img // T)
    lm = jnp.asarray(rng.randint(0, 5, (8, T * T, M)).astype(np.uint8))
    templates = []
    for _ in range(K):
        feats = [(int(rng.randint(0, 48)), int(rng.randint(0, 48)),
                  int(rng.randint(0, 8))) for _ in range(N)]
        templates.append({"features": feats, "width": 48, "height": 48})
    bank = pack_level_bank(templates)
    return lm, bank, (w_img, h_img)


def main():
    inner = 30
    # coarsest level of a 1024x1024 frame: 512x512, M=4096 -> M_pad 8192
    lm_a, bank_a, size_a = make_case(512, 512)
    # coarsest level of a 1008x1024 frame: 504x512, M=4032 -> M_pad 4096
    lm_b, bank_b, size_b = make_case(504, 512)

    def run_a():
        out = None
        for _ in range(inner):
            out = coarse_similarity_pallas(lm_a, bank_a, 8, size_a)
        jax.block_until_ready(out)

    def run_b():
        out = None
        for _ in range(inner):
            out = coarse_similarity_pallas(lm_b, bank_b, 8, size_b)
        jax.block_until_ready(out)

    res = ab_compare(run_a, run_b, n_pairs=30, inner=inner,
                     name_a="M4096->pad8192 (rows16)",
                     name_b="M4032->pad4096 (rows8)", verbose=True)
    print(res.summary())


if __name__ == "__main__":
    main()
