"""Wide-feature (u16-range) coarse kernel parity.

The packed4-phase wide kernel (similarity_pallas._make_wide_kernel)
replaces the packed2 route for 64..16383-feature banks — the fork's
marquee 8191-feature mode (README.md:45, u16 accumulators at
line2Dup.cpp:811,931) — at half the per-feature kernel cost. These
tests pin exact equality of the wide route (kernel + in-kernel counts +
extract_candidates_wide_counted) against the XLA map extraction, and
that the Detector actually takes the route for wide banks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shape_based_matching_tpu.ops.similarity import (
    _rmin_for_threshold, coarse_similarity, extract_candidates,
    extract_candidates_wide_counted, pack_level_bank)

ON_TPU = jax.default_backend() == "tpu"

CASES = [
    # (T, w_img, h_img, K, N, thr, C)
    (8, 128, 128, 7, 100, 60.0, 64),     # small wide bank
    (8, 256, 256, 5, 200, 30.0, 256),    # bigger frame, low threshold
    (4, 64, 64, 3, 80, 50.0, 64),        # T=4
    (8, 128, 128, 4, 70, -5.0, 64),      # negative-threshold quirk
    (8, 128, 128, 4, 70, 0.0, 64),       # rmin boundary
    (8, 128, 128, 2, 3000, 45.0, 64),    # deep-phase count (48 phases)
]


def _make_case(rng, T, w_img, h_img, K, N, feat_max=48):
    M = (w_img // T) * (h_img // T)
    lm = jnp.asarray(rng.randint(0, 5, (8, T * T, M)).astype(np.uint8))
    lmflat = jnp.concatenate([lm.reshape(-1), jnp.zeros((M,), jnp.uint8)])
    templates = []
    for k in range(K):
        n = N if k % 2 == 0 else max(64, N - rng.randint(0, N // 2))
        feats = [(int(rng.randint(0, feat_max)),
                  int(rng.randint(0, feat_max)),
                  int(rng.randint(0, 8))) for _ in range(n)]
        templates.append({"features": feats, "width": feat_max,
                          "height": feat_max})
    return lm, lmflat, pack_level_bank(templates)


@pytest.mark.parametrize("case", CASES)
def test_wide_counted_equals_map_extraction(rng, case, monkeypatch):
    import os

    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        coarse_words_pallas_wide_counted)

    if not os.environ.get("SBM_TEST_TPU"):
        monkeypatch.setenv("SBM_PALLAS_INTERPRET", "1")
    T, w_img, h_img, K, N, thr, C = case
    lm, lmflat, bank = _make_case(rng, T, w_img, h_img, K, N)
    assert int(bank.fx.shape[1]) * 4 > 255  # really the wide gate
    W = w_img // T
    M = W * (h_img // T)

    S, _ = coarse_similarity(lmflat, bank, T, (w_img, h_img))
    want = extract_candidates(S, bank.nfeat, jnp.float32(thr), T, W, C)

    rmin, _ = _rmin_for_threshold(bank.nfeat, jnp.float32(thr))
    res = coarse_words_pallas_wide_counted(lm, bank, T, (w_img, h_img),
                                           rmin)
    assert res is not None, "wide route declined a qualifying bank"
    words, kcnt, positions = res
    got = extract_candidates_wide_counted(words, kcnt, positions,
                                          bank.nfeat, jnp.float32(thr),
                                          T, W, C, M)
    va, vb = np.asarray(want[4]), np.asarray(got[4])
    np.testing.assert_array_equal(va, vb)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(want[i])[va],
                                      np.asarray(got[i])[va])
    assert int(want[5]) == int(got[5])


def test_wide_kernel_counts_match_predicate(rng, monkeypatch):
    """kcnt must equal the number of cells with j < pos AND cell >= rmin
    computed from the XLA score map."""
    import os

    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        coarse_words_pallas_wide_counted)

    if not os.environ.get("SBM_TEST_TPU"):
        monkeypatch.setenv("SBM_PALLAS_INTERPRET", "1")
    T, w_img, h_img = 8, 128, 128
    lm, lmflat, bank = _make_case(rng, T, w_img, h_img, 6, 90)
    thr = jnp.float32(40.0)
    rmin, _ = _rmin_for_threshold(bank.nfeat, thr)
    res = coarse_words_pallas_wide_counted(lm, bank, T, (w_img, h_img),
                                           rmin)
    words, kcnt, positions = res
    S, _ = coarse_similarity(lmflat, bank, T, (w_img, h_img),
                             mask_positions=False)
    j = np.arange(S.shape[1])[None, :]
    live = j < np.asarray(positions)[:, None]
    want = (live & (np.asarray(S) >= np.asarray(rmin)[:, None])).sum(1)
    np.testing.assert_array_equal(np.asarray(kcnt), want)


def test_wide_route_declines_narrow_and_huge_banks(rng):
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        coarse_words_pallas_wide_counted)

    T, w_img, h_img = 8, 128, 128
    M = (w_img // T) * (h_img // T)
    lm = jnp.asarray(rng.randint(0, 5, (8, T * T, M)).astype(np.uint8))
    narrow = pack_level_bank([{
        "features": [(1, 1, 0)] * 63, "width": 8, "height": 8}])
    rmin = jnp.zeros((1,), jnp.int32)
    assert coarse_words_pallas_wide_counted(
        lm, narrow, T, (w_img, h_img), rmin) is None
    huge = pack_level_bank([{
        "features": [(1, 1, 0)] * 3, "width": 8, "height": 8}],
        n_pad=16384)
    assert coarse_words_pallas_wide_counted(
        lm, huge, T, (w_img, h_img), rmin) is None


def test_detector_wide_match_interpreted(rng, monkeypatch):
    """Detector-level: a 128-feature bank through the FULL wide dispatch
    (match_batch B=1 + escalating path) equals the XLA route."""
    monkeypatch.setenv("SBM_PALLAS_INTERPRET", "1")
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    # block noise saturates the 128-feature budget on a small template
    # (the star polygon yields ~19 coarse features at this size)
    det, templ_img = build_rotated_detector(num_templates=4,
                                            num_features=128, size=160,
                                            dense=True)
    # coarse level nfeat = 64 -> N_slots * 4 = 256 > 255: the wide gate
    assert int(det._get_banks("bench")[-1].fx.shape[1]) * 4 > 255
    scene = synthetic_scene(384, 384, templ_img, n_instances=2, seed=5)

    def keys(ms):
        return [(m.template_id, m.x, m.y, round(m.similarity, 4))
                for m in ms]

    det.use_pallas = False
    want = det.match(scene, 70.0)
    want_esc = det._match_escalating(scene, 70.0)
    det.use_pallas = True
    got = det.match(scene, 70.0)
    got_esc = det._match_escalating(scene, 70.0)
    assert len(want) > 0
    assert keys(got) == keys(want)
    assert keys(got_esc) == keys(want_esc) == keys(want)
