"""Kernel-level parity vs the compiled C++ reference (scalar MIPP build).

Every tensor here was dumped by tools/golden_gen from the reference's own
static kernels on a real 128x128 image crop.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from shape_based_matching_tpu.ops import gradients, response, similarity
from shape_based_matching_tpu.oracle import reference as oracle
from .golden_utils import load_json, load_mat


@pytest.fixture(scope="module")
def kern_img():
    return load_mat("kern_img.bin")  # BGR color crop


def test_quantized_angle_golden(kern_img):
    want = load_mat("kern_quantized.bin")
    got = gradients.quantized_orientations(kern_img, 30.0)
    np.testing.assert_array_equal(np.asarray(got.angle), want)
    # quantize() with empty mask == angle itself (line2Dup.cpp:446-450)
    np.testing.assert_array_equal(np.asarray(got.angle),
                                  load_mat("kern_angle.bin"))


@pytest.mark.parametrize("T", [4, 8])
def test_spread_response_linearize_golden(kern_img, T):
    quant = jnp.asarray(load_mat("kern_quantized.bin"))
    sp = response.spread(quant, T)
    np.testing.assert_array_equal(np.asarray(sp),
                                  load_mat(f"kern_spread_T{T}.bin"))
    resp = response.response_maps(sp)
    for o in range(8):
        np.testing.assert_array_equal(np.asarray(resp[o]),
                                      load_mat(f"kern_resp_T{T}_o{o}.bin"))
    lm = response.linearize(resp, T)
    for o in range(8):
        np.testing.assert_array_equal(np.asarray(lm[o]),
                                      load_mat(f"kern_lm_T{T}_o{o}.bin"))


@pytest.mark.parametrize("T", [4, 8])
def test_similarity_golden(kern_img, T):
    quant = jnp.asarray(load_mat("kern_quantized.bin"))
    lmflat_np = np.asarray(response.build_linear_memories(quant, T))
    h, w = 128, 128
    M = (h // T) * (w // T)
    lmflat = jnp.concatenate([jnp.asarray(lmflat_np.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])

    templ = load_json(f"kern_templ_T{T}.json")
    feats = [tuple(f) for f in templ["features"]]
    bank = similarity.pack_level_bank(
        [{"features": feats, "width": 24, "height": 24}])

    S, positions = similarity.coarse_similarity(lmflat, bank, T, (w, h))
    S = np.asarray(S).reshape(h // T, w // T)

    want16 = load_mat(f"kern_sim_T{T}.bin").astype(np.int64)
    np.testing.assert_array_equal(S, want16)
    # u8 path (<64 features) must agree too
    want8 = load_mat(f"kern_sim64_T{T}.bin").astype(np.int64)
    np.testing.assert_array_equal(S, want8)

    # oracle agrees as well
    lm3 = lmflat_np.reshape(8, T * T, M)
    S_oracle = oracle.similarity(lm3, feats, (24, 24), (w, h), T)
    np.testing.assert_array_equal(S_oracle.astype(np.int64), want16)


@pytest.mark.parametrize("T", [4, 8])
def test_similarity_local_golden(kern_img, T):
    quant = jnp.asarray(load_mat("kern_quantized.bin"))
    lmflat_np = np.asarray(response.build_linear_memories(quant, T))
    h, w = 128, 128
    M = (h // T) * (w // T)

    templ = load_json(f"kern_templ_T{T}.json")
    feats = [tuple(f) for f in templ["features"]]
    lm3 = lmflat_np.reshape(8, T * T, M)
    got = oracle.similarity_local(lm3, feats, (w, h), T, (40, 40))
    want = load_mat(f"kern_simlocal_T{T}.bin").astype(np.int64)
    np.testing.assert_array_equal(got.astype(np.int64), want)
    want8 = load_mat(f"kern_simlocal64_T{T}.bin").astype(np.int64)
    np.testing.assert_array_equal(got.astype(np.int64), want8)
