"""Pallas kernel vs XLA fallback equivalence (interpret mode on CPU).

The same check runs compiled on real TPU hardware via SBM_TEST_TPU=1 (and is
part of the bench pipeline); interpret mode keeps it in the default CI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
    coarse_similarity_pallas)
from shape_based_matching_tpu.ops.similarity import (coarse_similarity,
                                                     pack_level_bank)

ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.parametrize("mask_positions", [True, False])
def test_pallas_coarse_equals_xla(rng, mask_positions):
    T = 8
    H = W = 256
    M = (H // T) * (W // T)
    L = 8 * T * T * M
    lm = rng.randint(0, 5, (8, T * T, M)).astype(np.uint8)
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    templates = []
    for _ in range(23):
        n = int(rng.randint(5, 64))
        feats = [(int(rng.randint(0, 64)), int(rng.randint(0, 64)),
                  int(rng.randint(0, 8))) for _ in range(n)]
        templates.append({"features": feats, "width": 64, "height": 64})
    bank = pack_level_bank(templates)

    S0, p0 = coarse_similarity(lmflat, bank, T, (W, H),
                               mask_positions=mask_positions)
    S1, p1 = coarse_similarity_pallas(jnp.asarray(lm), bank, T, (W, H),
                                      interpret=not ON_TPU,
                                      mask_positions=mask_positions)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    a = np.asarray(S0)
    b = np.asarray(S1)
    if not mask_positions:
        # Beyond `positions` the Pallas roll can wrap around the padded
        # plane (j + shift >= M_pad) where the flat XLA path keeps reading
        # forward; no consumer reads those cells — refine_from_maps stays
        # inside the clamp-proven window. Compare the defined part.
        j = np.arange(a.shape[1])[None, :]
        defined = j < np.asarray(p0)[:, None]
        a = np.where(defined, a, 0)
        b = np.where(defined, b, 0)
    np.testing.assert_array_equal(a, b)


def test_pallas_coarse_wide_bank_u16_packed(rng):
    """>63-feature templates route through the u16-packed kernel
    (2 cells/lane, the reference's u16-accumulator analog,
    line2Dup.cpp:811) — must equal the XLA path exactly."""
    T = 8
    H = W = 256
    M = (H // T) * (W // T)
    lm = rng.randint(0, 5, (8, T * T, M)).astype(np.uint8)
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    templates = []
    for _ in range(7):
        n = int(rng.randint(80, 200))
        feats = [(int(rng.randint(0, 128)), int(rng.randint(0, 128)),
                  int(rng.randint(0, 8))) for _ in range(n)]
        templates.append({"features": feats, "width": 128, "height": 128})
    bank = pack_level_bank(templates)
    assert int(bank.fx.shape[1]) * 4 > 255  # really the packed2 gate

    S0, p0 = coarse_similarity(lmflat, bank, T, (W, H))
    S1, p1 = coarse_similarity_pallas(jnp.asarray(lm), bank, T, (W, H),
                                      interpret=not ON_TPU)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(S0), np.asarray(S1))


def test_pallas_coarse_16ori_packed2(rng):
    """16-orientation banks (responses {0,1,4}, line2Dup_16bit_ori.cpp:575
    LUT) with >=64 features exceed the u8 byte-sum bound (N*4 > 255) and
    route through the u16-packed kernel — must equal the XLA path."""
    T = 8
    H = W = 256
    M = (H // T) * (W // T)
    lm = rng.randint(0, 5, (16, T * T, M)).astype(np.uint8)
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    templates = []
    for _ in range(5):
        n = int(rng.randint(70, 100))
        feats = [(int(rng.randint(0, 96)), int(rng.randint(0, 96)),
                  int(rng.randint(0, 16))) for _ in range(n)]
        templates.append({"features": feats, "width": 96, "height": 96})
    bank = pack_level_bank(templates)
    assert 255 < int(bank.fx.shape[1]) * 4 <= 65535  # the packed2 gate

    S0, p0 = coarse_similarity(lmflat, bank, T, (W, H), n_ori=16)
    S1, p1 = coarse_similarity_pallas(jnp.asarray(lm), bank, T, (W, H),
                                      interpret=not ON_TPU)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(S0), np.asarray(S1))


@pytest.mark.parametrize("T,hw", [(8, 256), (8, 1024), (4, 128)])
def test_pallas_coarse_edge_features(rng, T, hw):
    """Features at fx == width / fy == height with T | width (crop_templates
    places the max-x/max-y feature exactly there): consumed cells then read
    up to W bytes PAST the plane into the next grid row of the flat layout.
    The Pallas planes carry those continuation bytes; scores must match the
    flat XLA path bit-for-bit at every consumed position (incl. the 1024²
    T=8 config where M is a whole tile multiple and no alignment pad exists).
    """
    H = W = hw
    M = (H // T) * (W // T)
    lm = rng.randint(0, 5, (8, T * T, M)).astype(np.uint8)
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    wh = 8 * T  # T | width so fx == width lands on grid column wf
    feats = [(wh, wh, 3), (wh, 0, 1), (0, wh, 6), (0, 0, 0), (wh // 2, 7, 2)]
    bank = pack_level_bank([{"features": feats, "width": wh, "height": wh}])
    S0, p0 = coarse_similarity(lmflat, bank, T, (W, H))
    S1, p1 = coarse_similarity_pallas(jnp.asarray(lm), bank, T, (W, H),
                                      interpret=not ON_TPU)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(S0), np.asarray(S1))


def test_pallas_coarse_16ori(rng):
    T = 4
    H = W = 128
    M = (H // T) * (W // T)
    lm = rng.randint(0, 9, (16, T * T, M)).astype(np.uint8)
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    feats = [(int(rng.randint(0, 40)), int(rng.randint(0, 40)),
              int(rng.randint(0, 16))) for _ in range(30)]
    bank = pack_level_bank([{"features": feats, "width": 40, "height": 40}])
    S0, _ = coarse_similarity(lmflat, bank, T, (W, H), n_ori=16)
    S1, _ = coarse_similarity_pallas(jnp.asarray(lm), bank, T, (W, H),
                                     interpret=not ON_TPU)
    np.testing.assert_array_equal(np.asarray(S0), np.asarray(S1))


@pytest.mark.parametrize("group", [4, 8])
def test_pallas_coarse_group_sizes(rng, group, monkeypatch):
    """_COARSE_GROUP (templates per grid program) is a pure scheduling
    knob: any value must stay bit-identical to the XLA path, including
    a K that is not a group multiple (pad rows carry count 0)."""
    import shape_based_matching_tpu.ops.pallas.similarity_pallas as sp

    monkeypatch.setattr(sp, "_COARSE_GROUP", group)
    T = 8
    H = W = 256
    M = (H // T) * (W // T)
    lm = rng.randint(0, 5, (8, T * T, M)).astype(np.uint8)
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    templates = []
    for _ in range(group + 3):  # not a multiple of group
        n = int(rng.randint(5, 64))
        feats = [(int(rng.randint(0, 64)), int(rng.randint(0, 64)),
                  int(rng.randint(0, 8))) for _ in range(n)]
        templates.append({"features": feats, "width": 64, "height": 64})
    bank = pack_level_bank(templates)
    S0, p0 = coarse_similarity(lmflat, bank, T, (W, H),
                               mask_positions=True)
    S1, p1 = coarse_similarity_pallas(jnp.asarray(lm), bank, T, (W, H),
                                      interpret=not ON_TPU,
                                      mask_positions=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(S0), np.asarray(S1))
