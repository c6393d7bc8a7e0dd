"""On-chip paired A/B: masked vs unmasked match through match_batch B=1.

Round 3's single measurements put masked at +11.5% over unmasked
(3.665 vs 3.288 ms) against the bench's ~10% goal, with no way to tell
whether the delta was real (VERDICT r3 weak #4). This decides it with
the ABBA harness: same detector, same frame, the mask rides the fused
Pallas frontend as one extra VMEM input (frontend_pallas.py).

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/exp_masked_ab.py [num_templates]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from ab_bench import ab_compare


def main():
    num_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 360

    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=63)
    frame = synthetic_scene(1024, 1024, templ_img, n_instances=4, seed=3)
    rng = np.random.RandomState(4)
    mask = (rng.rand(1024, 1024) > 0.25).astype(np.uint8) * 255
    frames = jax.device_put(frame[None])
    masks = jax.device_put(mask[None])
    jax.block_until_ready((frames, masks))

    out = det.match_batch(frames, 85.0, as_matches=False)
    out_m = det.match_batch(frames, 85.0, masks=masks, as_matches=False)
    jax.block_until_ready((out, out_m))

    INNER = 30

    def block_unmasked():
        out = None
        for _ in range(INNER):
            out = det.match_batch(frames, 85.0, as_matches=False)
        jax.block_until_ready(out)

    def block_masked():
        out = None
        for _ in range(INNER):
            out = det.match_batch(frames, 85.0, masks=masks,
                                  as_matches=False)
        jax.block_until_ready(out)

    res = ab_compare(block_unmasked, block_masked, n_pairs=40,
                     inner=INNER, name_a="unmasked", name_b="masked",
                     verbose=True)
    print(res.summary())


if __name__ == "__main__":
    main()
