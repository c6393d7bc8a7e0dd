"""On-chip A/B: wide packed4-phase kernel vs packed2 for u16-range banks.

Compares the two bit-identical coarse+extract routes for wide-feature
banks (64..16383 features — the fork's 8191 marquee mode) through
paired interleaved blocks (tools/ab_bench.py):

  A: coarse_words_pallas_counted (packed2 u16, 2 cells/lane)
     + extract_candidates_words_counted
  B: coarse_words_pallas_wide_counted (packed4 phases, 4 cells/lane,
     even/odd u16 widening) + extract_candidates_wide_counted

Both consume the SAME device-resident linear memories; equality of the
extracted candidates is asserted before timing.

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/exp_wide_ab.py [n_templates n_features [dense size]]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from ab_bench import ab_compare


def build_case(num_templates=1000, num_features=128, dense=False,
               size=256):
    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.response import (
        build_linear_memories_fused)
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    det, templ_img = build_rotated_detector(
        num_templates=num_templates, num_features=num_features,
        dense=dense, size=size)
    bank = det._get_banks("bench")[-1]
    frame = synthetic_scene(1024, 1024, templ_img, n_instances=2, seed=11)
    T = 8
    src1 = pyr_down_u8(jnp.asarray(frame))
    lm = build_linear_memories_fused(src1, 30.0, T)
    jax.block_until_ready(lm)
    return lm, bank, T, (512, 512)


def build_case1():
    """The upstream case1 bank (361 x 128f, trained by the compiled C++
    reference) on its real test frame — the wide config that measured
    5.69 ms in round 3."""
    from shape_based_matching_tpu import Detector
    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_color)
    from shape_based_matching_tpu.ops.response import build_linear_memories

    tests_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests")
    sys.path.insert(0, tests_dir)
    from golden_utils import load_mat

    det = Detector(num_features=128, T=(4, 8))
    det.read_classes(["test"], "/root/reference/test/case1/%s_templ.yaml")
    bank = det._get_banks("test")[-1]
    img = load_mat("case1_img.bin")  # color [H, W, 3]
    T = 8
    src1 = pyr_down_u8(jnp.asarray(img))
    grads = quantized_orientations_color(src1, jnp.float32(30.0))
    lm = build_linear_memories(grads.angle, T)
    jax.block_until_ready(lm)
    h, w = img.shape[:2]
    return lm, bank, T, (w // 2, h // 2)


def main():
    from shape_based_matching_tpu.ops.similarity import (
        _rmin_for_threshold, extract_candidates_wide_counted,
        extract_candidates_words_counted)
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        coarse_words_pallas_counted, coarse_words_pallas_wide_counted)

    if len(sys.argv) > 1 and sys.argv[1] == "case1":
        lm, bank, T, size_wh = build_case1()
        threshold = 90.0
    else:
        num_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
        num_features = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        dense = len(sys.argv) > 3 and sys.argv[3] == "dense"
        size = int(sys.argv[4]) if len(sys.argv) > 4 else 256
        lm, bank, T, size_wh = build_case(num_templates, num_features,
                                          dense, size)
        threshold = 88.0
    W = size_wh[0] // T
    M = W * (size_wh[1] // T)
    C = 256
    thr = jnp.float32(threshold)
    rmin, _ = _rmin_for_threshold(bank.nfeat, thr)

    @jax.jit
    def run_packed2(lm):
        words, kcnt, positions, unit = coarse_words_pallas_counted(
            lm, bank, T, size_wh, rmin)
        return extract_candidates_words_counted(
            words, kcnt, positions, bank.nfeat, thr, unit, T, W, C, M)

    @jax.jit
    def run_wide(lm):
        words, kcnt, positions = coarse_words_pallas_wide_counted(
            lm, bank, T, size_wh, rmin)
        return extract_candidates_wide_counted(
            words, kcnt, positions, bank.nfeat, thr, T, W, C, M)

    a = jax.block_until_ready(run_packed2(lm))
    b = jax.block_until_ready(run_wide(lm))
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y)), i
    n_above = int(a[5])
    print(f"parity ok: n_above={n_above}, "
          f"N_slots={int(bank.fx.shape[1])}, K={int(bank.fx.shape[0])}")

    INNER = 30

    def block_a():
        out = None
        for _ in range(INNER):
            out = run_packed2(lm)
        jax.block_until_ready(out)

    def block_b():
        out = None
        for _ in range(INNER):
            out = run_wide(lm)
        jax.block_until_ready(out)

    res = ab_compare(block_a, block_b, n_pairs=40, inner=INNER,
                     name_a="packed2", name_b="wide", verbose=True)
    print(res.summary())


if __name__ == "__main__":
    main()
