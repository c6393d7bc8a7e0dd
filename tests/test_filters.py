"""Bit-exactness of the JAX filter ops vs cv2 and vs the NumPy oracle."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from shape_based_matching_tpu.ops import filters
from shape_based_matching_tpu.oracle import reference as oracle
from shape_based_matching_tpu.utils.cv_resize import resize_linear_u8


@pytest.fixture(params=["gray", "color"])
def img(request, rng):
    if request.param == "gray":
        return rng.randint(0, 256, (57, 83), dtype=np.uint8)
    return rng.randint(0, 256, (57, 83, 3), dtype=np.uint8)


def test_gaussian_blur7(img):
    want = cv2.GaussianBlur(img, (7, 7), 0, 0, borderType=cv2.BORDER_REPLICATE)
    got = np.asarray(filters.gaussian_blur7_u8(jnp.asarray(img)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(oracle.gaussian_blur7_u8(img), want)


def test_sobel_f32_gray(rng):
    img = rng.randint(0, 256, (41, 66), dtype=np.uint8)
    for dx in (True, False):
        want = cv2.Sobel(img, cv2.CV_32F, int(dx), int(not dx), ksize=3,
                         borderType=cv2.BORDER_REPLICATE)
        got = np.asarray(filters.sobel3_f32(jnp.asarray(img), dx=dx))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(oracle.sobel3(img, dx=dx).astype(np.float32), want)


def test_sobel_i16_color(rng):
    img = rng.randint(0, 256, (41, 66, 3), dtype=np.uint8)
    for dx in (True, False):
        want = cv2.Sobel(img, cv2.CV_16S, int(dx), int(not dx), ksize=3,
                         borderType=cv2.BORDER_REPLICATE)
        got = np.asarray(filters.sobel3_i32(jnp.asarray(img), dx=dx))
        np.testing.assert_array_equal(got.astype(np.int16), want)


def test_pyr_down(img):
    h, w = img.shape[:2]
    want = cv2.pyrDown(img, dstsize=(w // 2, h // 2))
    got = np.asarray(filters.pyr_down_u8(jnp.asarray(img)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(oracle.pyr_down_u8(img), want)


def test_resize_nearest(rng):
    m = (rng.randint(0, 2, (33, 47), dtype=np.uint8)) * 255
    for oh, ow in [(16, 23), (8, 11), (33, 47)]:
        want = cv2.resize(m, (ow, oh), interpolation=cv2.INTER_NEAREST)
        got = np.asarray(filters.resize_nearest(jnp.asarray(m), (oh, ow)))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(oracle.resize_nearest(m, (oh, ow)), want)


def test_erode3(rng):
    m = (rng.randint(0, 2, (33, 47), dtype=np.uint8)) * 255
    want = cv2.erode(m, None, borderType=cv2.BORDER_REPLICATE)
    got = np.asarray(filters.erode3_u8(jnp.asarray(m)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(oracle.erode3_u8(m), want)


def test_resize_linear_u8_vs_opencv46_golden():
    """Golden data generated from the OpenCV 4.6 C++ library (the version the
    reference links against; Python cv2 5.0 changed INTER_LINEAR downscale
    semantics and cannot serve as the oracle). Downscales must be bit-exact;
    upscales tolerate ±1 LSB (OpenCV dispatches a different Q8 kernel there).
    """
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "resize_golden.bin")
    with open(path, "rb") as f:
        g = np.frombuffer(f.read(57 * 83), np.uint8).reshape(57, 83)
        c = np.frombuffer(f.read(40 * 61 * 3), np.uint8).reshape(40, 61, 3)
        for scale in [0.1, 0.2, 0.26, 0.5, 0.9, 1.0, 1.1, 1.5, 2.0]:
            for src in (g, c):
                w, h = np.frombuffer(f.read(8), np.int32)
                n = int(h) * int(w) * (3 if src.ndim == 3 else 1)
                shape = (int(h), int(w)) + ((3,) if src.ndim == 3 else ())
                want = np.frombuffer(f.read(n), np.uint8).reshape(shape)
                got = resize_linear_u8(src, scale, scale)
                assert got.shape == want.shape
                diff = np.abs(got.astype(int) - want.astype(int))
                if scale <= 1.0:
                    assert diff.max() == 0, (scale, src.shape, diff.max())
                else:
                    assert diff.max() <= 1, (scale, src.shape, diff.max())
