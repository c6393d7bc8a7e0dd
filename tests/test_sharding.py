"""Multi-chip sharding on the virtual 8-device CPU mesh.

Validates that the data×templ shard_map program compiles, runs, and produces
the same scores as the single-device path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shape_based_matching_tpu.ops.similarity import (
    LevelBank, coarse_similarity, extract_candidates, pack_level_bank)
from shape_based_matching_tpu.parallel.mesh import (make_mesh,
                                                    multichip_match_step,
                                                    multichip_train_step)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def _random_bank(rng, K, N=8, wh=24):
    templates = []
    for _ in range(K):
        feats = [(int(rng.randint(0, wh)), int(rng.randint(0, wh)),
                  int(rng.randint(0, 8))) for _ in range(N)]
        templates.append({"features": feats, "width": wh, "height": wh})
    return pack_level_bank(templates)


def test_multichip_match_matches_single_device(mesh, rng):
    H = W = 64
    B, K = 4, 16
    images = (rng.rand(B, H, W) * 255).astype(np.uint8)
    bank = _random_bank(rng, K)

    step = multichip_match_step(mesh, (4, 8), (H, W), cand_cap=16)
    scores, counts = step(jnp.asarray(images), bank.fx, bank.fy, bank.label,
                          bank.valid, bank.nfeat, bank.width, bank.height)
    scores = np.asarray(scores)
    n_templ_shards = mesh.devices.shape[1]
    assert scores.shape == (B, n_templ_shards * 16)

    # single-device reference for image 0: counts must agree
    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.response import build_linear_memories

    src = pyr_down_u8(jnp.asarray(images[0]))
    grads = quantized_orientations_gray(src, jnp.float32(30.0))
    lm = build_linear_memories(grads.angle, 8)
    m = lm.shape[-1]
    lmflat = jnp.concatenate([lm.reshape(-1), jnp.zeros((m,), jnp.uint8)])
    S, _ = coarse_similarity(lmflat, bank, 8, (W // 2, H // 2))
    _, _, _, _, _, n_above = extract_candidates(
        S, bank.nfeat, jnp.float32(80.0), 8, (W // 2) // 8, 16)
    total_counts = np.asarray(counts)
    assert int(total_counts[0]) == int(n_above)


def test_multichip_train_step(mesh, rng):
    H = W = 64
    B = 16
    images = (rng.rand(B, H, W) * 255).astype(np.uint8)
    train = multichip_train_step(mesh, (H, W))
    quant, counts, total = train(jnp.asarray(images))
    assert quant.shape == (B, H, W)
    assert int(total) == int(np.asarray(counts).sum())


def test_graft_entry_dryrun():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
