"""Fused Pallas frontend kernel vs the XLA chain — bit-equality.

The kernel (ops/pallas/frontend_pallas.py) fuses blur->sobel->atan->
vote-quantize->spread; interpret mode runs the same program on CPU. The
reordered response/linearize (build_lm_from_spread) must match
build_linear_memories exactly (response is pointwise, linearize a
permutation). On real TPU hardware the same parity is asserted with
SBM_TEST_TPU=1 (compiled kernel).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from shape_based_matching_tpu.ops.gradients import quantized_orientations_gray
from shape_based_matching_tpu.ops.pallas.frontend_pallas import (
    frontend_supported, quant_spread_pallas)
from shape_based_matching_tpu.ops.response import (
    build_linear_memories, build_linear_memories_fused,
    build_lm_from_spread, spread)
from shape_based_matching_tpu.utils.synthetic import (synthetic_scene,
                                                      synthetic_shape_image)

INTERPRET = not os.environ.get("SBM_TEST_TPU")  # on-chip: compiled


def _images():
    rng = np.random.RandomState(7)
    noise = (rng.rand(128, 256) * 255).astype(np.uint8)
    templ = synthetic_shape_image(96, seed=1)
    scene = synthetic_scene(256, 256, templ, n_instances=3, seed=2)
    flat = np.full((64, 128), 127, np.uint8)  # no gradients anywhere
    return {"noise": noise, "scene": scene, "flat": flat}


@pytest.mark.parametrize("T", [4, 8])
@pytest.mark.parametrize("name", ["noise", "scene", "flat"])
def test_quant_and_spread_parity(T, name):
    img = _images()[name]
    g = quantized_orientations_gray(jnp.asarray(img), jnp.float32(30.0))
    ref_sp = np.asarray(spread(g.angle, T))
    got_sp, got_q = quant_spread_pallas(
        jnp.asarray(img), jnp.float32(30.0) ** 2, T, with_quant=True,
        interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(g.angle))
    np.testing.assert_array_equal(np.asarray(got_sp), ref_sp)


@pytest.mark.parametrize("name,hw", [("odd-w", (128, 244)),
                                     ("odd-h", (124, 256)),
                                     ("small", (48, 72))])
def test_quant_and_spread_parity_padded_sizes(name, hw):
    """Sizes off the (8, 128) tile grid: the kernel pads with edge
    replication and masks with the real dims — must equal the XLA chain
    bit-for-bit, including border votes at the true image edges."""
    rng = np.random.RandomState(hash(name) % 2**31)
    img = (rng.rand(*hw) * 255).astype(np.uint8)
    T = 4
    g = quantized_orientations_gray(jnp.asarray(img), jnp.float32(30.0))
    ref_sp = np.asarray(spread(g.angle, T))
    got_sp, got_q = quant_spread_pallas(
        jnp.asarray(img), jnp.float32(30.0) ** 2, T, with_quant=True,
        interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(g.angle))
    np.testing.assert_array_equal(np.asarray(got_sp), ref_sp)


@pytest.mark.parametrize("T", [4, 8])
@pytest.mark.parametrize("hw", [(128, 256), (120, 244)])
def test_quant_and_spread_parity_color(T, hw):
    """Color path: per-channel blur/sobel + max-|grad|^2 channel select
    with the reference tie rules, fused — vs the XLA color chain."""
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_color)

    rng = np.random.RandomState(11)
    img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
    g = quantized_orientations_color(jnp.asarray(img), jnp.float32(30.0))
    ref_sp = np.asarray(spread(g.angle, T))
    got_sp, got_q = quant_spread_pallas(
        jnp.asarray(img), jnp.float32(30.0) ** 2, T, with_quant=True,
        interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(g.angle))
    np.testing.assert_array_equal(np.asarray(got_sp), ref_sp)


def test_batched_color_and_padded():
    from shape_based_matching_tpu.ops.pallas.frontend_pallas import (
        quant_spread_pallas_batched)
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_color)

    rng = np.random.RandomState(13)
    imgs = (rng.rand(3, 120, 244, 3) * 255).astype(np.uint8)
    got = np.asarray(quant_spread_pallas_batched(
        jnp.asarray(imgs), jnp.float32(30.0) ** 2, 4, interpret=INTERPRET))
    for b in range(3):
        g = quantized_orientations_color(jnp.asarray(imgs[b]),
                                         jnp.float32(30.0))
        np.testing.assert_array_equal(got[b], np.asarray(spread(g.angle, 4)))


@pytest.mark.parametrize("T", [4, 8])
def test_linear_memories_parity(T):
    img = _images()["scene"]
    g = quantized_orientations_gray(jnp.asarray(img), jnp.float32(30.0))
    ref = np.asarray(build_linear_memories(g.angle, T))
    got = np.asarray(build_linear_memories_fused(
        jnp.asarray(img), 30.0, T, interpret=INTERPRET))
    np.testing.assert_array_equal(got, ref)


def test_weak_threshold_respected():
    img = _images()["scene"]
    for thr in (10.0, 60.0):
        g = quantized_orientations_gray(jnp.asarray(img), jnp.float32(thr))
        _, got_q = quant_spread_pallas(
            jnp.asarray(img), jnp.float32(thr) ** 2, 4, with_quant=True,
            interpret=INTERPRET)
        np.testing.assert_array_equal(np.asarray(got_q), np.asarray(g.angle))


def test_frontend_supported_gate():
    assert frontend_supported((1024, 1024), True, 8, False, False)
    assert frontend_supported((1024, 1024), False, 8, False, False)  # color
    assert frontend_supported((1024, 160), True, 8, False, False)  # padded
    assert frontend_supported((1024, 1024), True, 16, False, False)  # 16-ori
    assert frontend_supported((1024, 1024), True, 8, False, True)  # masked
    assert frontend_supported((1024, 1024), True, 16, False, True)
    # PATCH_2843 (compile-time-disabled upstream) stays on the XLA chain
    assert not frontend_supported((1024, 1024), True, 8, True, False)


@pytest.mark.parametrize("T", [4, 8])
@pytest.mark.parametrize("n_ori", [8, 16])
def test_masked_quant_and_spread_parity(T, n_ori):
    """Masked configs (line2Dup.cpp:446-450): the kernel's mask input must
    reproduce where(mask > 0, quantized, 0) before the spread."""
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray as qog)

    img = _images()["scene"]
    rng = np.random.RandomState(3)
    mask = (rng.rand(*img.shape) > 0.4).astype(np.uint8) * 255
    mask[40:80, :] = 0

    g = qog(jnp.asarray(img), jnp.float32(30.0), n_ori)
    ref_q = np.where(mask > 0, np.asarray(g.angle), 0)
    ref_sp = np.asarray(spread(jnp.asarray(ref_q), T))
    got_sp, got_q = quant_spread_pallas(
        jnp.asarray(img), jnp.float32(30.0) ** 2, T, with_quant=True,
        interpret=INTERPRET, n_ori=n_ori, mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(got_q), ref_q)
    np.testing.assert_array_equal(np.asarray(got_sp), ref_sp)


@pytest.mark.parametrize("T", [4, 8])
@pytest.mark.parametrize("name,color", [("scene", False), ("noise", False),
                                        ("color", True)])
def test_16ori_quant_and_spread_parity(T, name, color):
    """16-orientation configs emit u16 single-bit orientations
    (line2Dup_16bit_ori.cpp:216-297) — kernel == XLA chain bit-for-bit."""
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_color, quantized_orientations_gray as qog)

    if color:
        rng = np.random.RandomState(11)
        img = (rng.rand(120, 250, 3) * 255).astype(np.uint8)
        g = quantized_orientations_color(jnp.asarray(img),
                                         jnp.float32(30.0), 16)
    else:
        img = _images()[name]
        g = qog(jnp.asarray(img), jnp.float32(30.0), 16)
    ref_sp = np.asarray(spread(g.angle, T))
    got_sp, got_q = quant_spread_pallas(
        jnp.asarray(img), jnp.float32(30.0) ** 2, T, with_quant=True,
        interpret=INTERPRET, n_ori=16)
    assert np.asarray(got_q).dtype == np.uint16
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(g.angle))
    np.testing.assert_array_equal(np.asarray(got_sp), ref_sp)


def test_16ori_linear_memories_parity():
    """build_linear_memories_fused for n_ori=16: the u16 spread plane
    rides the MXU as two exact byte planes — must equal the unfused
    build_linear_memories bit-for-bit."""
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray as qog)

    img = _images()["scene"]
    for T in (4, 8):
        g = qog(jnp.asarray(img), jnp.float32(30.0), 16)
        ref = np.asarray(build_linear_memories(g.angle, T, 16))
        got = np.asarray(build_linear_memories_fused(
            jnp.asarray(img), 30.0, T, 16, interpret=INTERPRET))
        np.testing.assert_array_equal(got, ref)


def test_batched_masked_parity():
    """Frame-batched masked frontend (one program, per-frame mask
    blocks) == per-frame XLA chain."""
    from shape_based_matching_tpu.ops.pallas.frontend_pallas import (
        quant_spread_pallas_batched)
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray as qog)

    rng = np.random.RandomState(5)
    imgs = (rng.rand(3, 64, 128) * 255).astype(np.uint8)
    masks = (rng.rand(3, 64, 128) > 0.3).astype(np.uint8) * 255
    got = np.asarray(quant_spread_pallas_batched(
        jnp.asarray(imgs), jnp.float32(30.0) ** 2, 4, interpret=INTERPRET,
        masks=jnp.asarray(masks)))
    for b in range(3):
        g = qog(jnp.asarray(imgs[b]), jnp.float32(30.0))
        ref_q = np.where(masks[b] > 0, np.asarray(g.angle), 0)
        ref_sp = np.asarray(spread(jnp.asarray(ref_q), 4))
        np.testing.assert_array_equal(got[b], ref_sp)
