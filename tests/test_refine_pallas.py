"""Window-refinement Pallas kernel vs XLA refine_candidates equivalence.

refine_candidates is the exact per-candidate replica of the reference's
local-similarity loop (line2Dup.cpp:1221-1293), so bit-equality against it
covers reference parity for every bank class — including pathological
banks (templates wider than image - 16T) and the fx == width edge reads.
Interpret mode on CPU; the same check compiles on real TPU via
SBM_TEST_TPU=1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shape_based_matching_tpu.ops.pallas.refine_pallas import (
    refine_windows_pallas, window_refine_supported)
from shape_based_matching_tpu.ops.similarity import (pack_level_bank,
                                                     refine_candidates)

ON_TPU = jax.default_backend() == "tpu"


def _random_case(rng, n_ori, w_img, h_img, T, templates, n_cand=96):
    Wd, Hd = w_img // T, h_img // T
    M = Wd * Hd
    lm = rng.randint(0, 5 if n_ori == 8 else 9,
                     (n_ori, T * T, M)).astype(np.uint8)
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    bank = pack_level_bank(templates)
    K = len(templates)
    k = jnp.asarray(rng.randint(0, K, n_cand), jnp.int32)
    x = jnp.asarray(rng.randint(0, w_img // 2, n_cand), jnp.int32)
    y = jnp.asarray(rng.randint(0, h_img // 2, n_cand), jnp.int32)
    valid = jnp.asarray(rng.rand(n_cand) > 0.2)
    return jnp.asarray(lm), lmflat, bank, k, x, y, valid


def _assert_equal(lm, lmflat, bank, T, size, k, x, y, valid, thr):
    r0 = refine_candidates(lmflat, bank, T, size, k, x, y, valid,
                           jnp.float32(thr))
    r1 = refine_windows_pallas(lm, bank, T, size, k, x, y, valid,
                               jnp.float32(thr), interpret=not ON_TPU)
    for a, b, name in zip(r0, r1, ("k", "x", "y", "sim", "valid")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


@pytest.mark.parametrize("T,hw", [(4, 256), (8, 256), (4, 128)])
def test_window_refine_equals_xla(rng, T, hw):
    templates = []
    for _ in range(17):
        n = int(rng.randint(5, 64))
        feats = [(int(rng.randint(0, 65)), int(rng.randint(0, 65)),
                  int(rng.randint(0, 8))) for _ in range(n)]
        templates.append({"features": feats, "width": 64, "height": 64})
    lm, lmflat, bank, k, x, y, valid = _random_case(
        rng, 8, hw, hw, T, templates)
    _assert_equal(lm, lmflat, bank, T, (hw, hw), k, x, y, valid, 60.0)


def test_window_refine_pathological_bank(rng):
    """Templates wider than image - 16T: the border clamp inverts and
    features rotate off-image (zero reads, refine_candidates semantics)."""
    T, hw = 4, 256
    templates = []
    for _ in range(4):
        feats = [(int(rng.randint(0, 231)), int(rng.randint(0, 231)),
                  int(rng.randint(0, 8))) for _ in range(40)]
        templates.append({"features": feats, "width": 230, "height": 230})
    lm, lmflat, bank, k, x, y, valid = _random_case(
        rng, 8, hw, hw, T, templates)
    _assert_equal(lm, lmflat, bank, T, (hw, hw), k, x, y, valid, 60.0)


def test_window_refine_edge_features(rng):
    """fx == width / fy == height with T | width: flat reads continue into
    the next linear-memory row (continuation columns / zero pad)."""
    T, hw = 4, 256
    templates = [{"features": [(64, 64, 3), (0, 0, 1), (64, 0, 5),
                               (0, 64, 7)],
                  "width": 64, "height": 64}]
    lm, lmflat, bank, k, x, y, valid = _random_case(
        rng, 8, hw, hw, T, templates)
    _assert_equal(lm, lmflat, bank, T, (hw, hw), k, x, y, valid, 10.0)


def test_window_refine_16ori_and_wide(rng):
    """16-orientation mode and >63-feature (wide-accumulate) templates."""
    T, hw = 4, 256
    templates = []
    for _ in range(5):
        n = int(rng.randint(70, 120))
        feats = [(int(rng.randint(0, 97)), int(rng.randint(0, 97)),
                  int(rng.randint(0, 16))) for _ in range(n)]
        templates.append({"features": feats, "width": 96, "height": 96})
    lm, lmflat, bank, k, x, y, valid = _random_case(
        rng, 16, hw, hw, T, templates)
    _assert_equal(lm, lmflat, bank, T, (hw, hw), k, x, y, valid, 50.0)


def test_map_window_refine_equals_xla(rng):
    """refine_from_maps_pallas (map-window extract kernel) vs the XLA
    refine_from_maps, including slot_of_k == -1 overflow-invalidated
    candidates (distinct cap smaller than the true distinct count)."""
    from shape_based_matching_tpu.ops.pallas.refine_pallas import (
        refine_from_maps_pallas)
    from shape_based_matching_tpu.ops.similarity import (
        coarse_similarity, distinct_templates, gather_bank,
        refine_from_maps)

    T, hw = 4, 256
    templates = []
    for _ in range(17):
        n = int(rng.randint(5, 64))
        feats = [(int(rng.randint(0, 65)), int(rng.randint(0, 65)),
                  int(rng.randint(0, 8))) for _ in range(n)]
        templates.append({"features": feats, "width": 64, "height": 64})
    lm, lmflat, bank, k, x, y, valid = _random_case(
        rng, 8, hw, hw, T, templates)
    slots, slot_of_k, _nd = distinct_templates(k, valid, 17, 8)
    sub = gather_bank(bank, slots)
    Sfull, _ = coarse_similarity(lmflat, sub, T, (hw, hw),
                                 mask_positions=False)
    r0 = refine_from_maps(Sfull, slot_of_k, bank, T, (hw, hw), k, x, y,
                          valid, jnp.float32(60.0))
    r1 = refine_from_maps_pallas(Sfull, slot_of_k, bank, T, (hw, hw), k, x,
                                 y, valid, jnp.float32(60.0),
                                 interpret=not ON_TPU)
    for a, b, name in zip(r0, r1, ("k", "x", "y", "sim", "valid")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_window_refine_skip_invalid_matches_on_valid_rows(rng):
    """skip_invalid=True must agree with the exact mode on every
    valid=True row (invalid rows are don't-care by contract)."""
    T, hw = 4, 256
    templates = []
    for _ in range(9):
        feats = [(int(rng.randint(0, 65)), int(rng.randint(0, 65)),
                  int(rng.randint(0, 8))) for _ in range(30)]
        templates.append({"features": feats, "width": 64, "height": 64})
    lm, lmflat, bank, k, x, y, valid = _random_case(
        rng, 8, hw, hw, T, templates)
    r0 = refine_windows_pallas(lm, bank, T, (hw, hw), k, x, y, valid,
                               jnp.float32(60.0), interpret=not ON_TPU)
    r1 = refine_windows_pallas(lm, bank, T, (hw, hw), k, x, y, valid,
                               jnp.float32(60.0), interpret=not ON_TPU,
                               skip_invalid=True)
    v = np.asarray(valid)
    for a, b, name in zip(r0, r1, ("k", "x", "y", "sim", "valid")):
        np.testing.assert_array_equal(np.asarray(a)[v], np.asarray(b)[v],
                                      err_msg=name)
    np.testing.assert_array_equal(np.asarray(r0[4]), np.asarray(r1[4]))


def test_window_refine_supported_gate():
    assert window_refine_supported((1024, 1024), 4)
    assert window_refine_supported((1024, 1024), 4, n_ori=16)
    assert not window_refine_supported((8192, 8192), 4)


def test_window_refine_feature_chunked_equals_one_shot(rng, monkeypatch):
    """Wide banks split the feature axis across kernel calls (the SMEM
    meta block caps one call at _WINDOW_MAX_SLOTS slots — the
    8191-feature mode). Chunked patches sum exactly, so forcing tiny
    chunks on an ordinary bank must stay bit-identical to the XLA
    reference path."""
    from shape_based_matching_tpu.ops.pallas import refine_pallas

    T, hw, n_ori = 4, 128, 8
    templates = []
    for _ in range(9):
        n = int(rng.randint(20, 64))
        feats = [(int(rng.randint(0, 65)), int(rng.randint(0, 65)),
                  int(rng.randint(0, n_ori))) for _ in range(n)]
        templates.append({"features": feats, "width": 64, "height": 64})
    lm, lmflat, bank, k, x, y, valid = _random_case(
        rng, n_ori, hw, hw, T, templates, n_cand=48)
    # 3 chunks over a 64-slot bank (the jit cache keys on the implicit
    # chunk count via the traced graph, so clear it first)
    monkeypatch.setattr(refine_pallas, "_WINDOW_MAX_SLOTS", 24)
    refine_pallas._refine_windows_pallas.clear_cache()
    try:
        _assert_equal(lm, lmflat, bank, T, (hw, hw), k, x, y, valid, 55.0)
    finally:
        refine_pallas._refine_windows_pallas.clear_cache()
