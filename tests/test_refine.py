"""Subpixel/ICP pose refinement accuracy on synthetic scenes."""

import numpy as np
import pytest

from shape_based_matching_tpu import Detector
from shape_based_matching_tpu.models.refine import refine_detections
from shape_based_matching_tpu.utils.cv_resize import resize_linear_u8
from shape_based_matching_tpu.utils.synthetic import synthetic_shape_image


def _paste(scene, img, x, y):
    h, w = img.shape
    scene[y : y + h, x : x + w] = np.maximum(scene[y : y + h, x : x + w], img)
    return scene


def _rotate_float(img, angle_deg):
    """Float bilinear rotation about the image center (test-side only)."""
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    a = np.radians(angle_deg)
    sx = np.cos(a) * (xx - cx) + np.sin(a) * (yy - cy) + cx
    sy = -np.sin(a) * (xx - cx) + np.cos(a) * (yy - cy) + cy
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    fx = np.clip(sx - x0, 0, 1)
    fy = np.clip(sy - y0, 0, 1)
    v = ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x0 + 1])
         + fy * ((1 - fx) * img[y0 + 1, x0] + fx * img[y0 + 1, x0 + 1]))
    return np.clip(v, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def trained():
    templ = synthetic_shape_image(128, seed=1)
    det = Detector(num_features=64)
    tid = det.add_template(templ, "s", np.full_like(templ, 255))
    assert tid == 0
    return det, templ


def test_refine_recovers_small_rotation(trained):
    det, templ = trained
    rot = _rotate_float(templ, 2.0)  # 2 degrees, below the template grid
    scene = np.zeros((256, 256), np.uint8)
    _paste(scene, rot, 60, 70)
    matches = det.match(scene, 70.0)
    assert matches
    refined = refine_detections(det, scene, matches[:1])
    assert refined
    r = refined[0]
    # ICP should see the +2° residual (sign: image-frame rotation)
    assert abs(abs(r["angle_delta"]) - 2.0) < 0.7, r
    assert abs(r["scale"] - 1.0) < 0.05
    assert r["residual"] < 1.5


def test_refine_recovers_scale(trained):
    det, templ = trained
    scaled = resize_linear_u8(templ, 1.05, 1.05)
    scene = np.zeros((256, 256), np.uint8)
    _paste(scene, scaled, 50, 40)
    matches = det.match(scene, 60.0)
    assert matches
    refined = refine_detections(det, scene, matches[:1])
    assert refined
    r = refined[0]
    assert abs(r["scale"] - 1.05) < 0.03, r
    assert abs(r["angle_delta"]) < 1.0


def test_refine_exact_position(trained):
    det, templ = trained
    scene = np.zeros((256, 256), np.uint8)
    _paste(scene, templ, 64, 48)
    matches = det.match(scene, 85.0)
    assert matches
    m = matches[0]
    t0 = det.get_templates("s", 0)[0]
    # ground-truth match origin: paste position + template crop corner.
    # The discrete grid (x ≡ T/2-1 mod T) cannot represent it exactly; the
    # subpixel refinement must recover it.
    true_x = 64 + t0.tl_x
    true_y = 48 + t0.tl_y
    refined = refine_detections(det, scene, [m])
    assert refined
    r = refined[0]
    assert abs(r["x"] - true_x) < 0.7, (r, true_x)
    assert abs(r["y"] - true_y) < 0.7, (r, true_y)
    assert abs(r["angle_delta"]) < 0.5
    assert abs(r["scale"] - 1.0) < 0.02
    assert r["residual"] < 0.8


def _shear_float(img, shear_x):
    """x' = x + shear_x * y bilinear warp (test-side only)."""
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    sx = (xx - cx) - shear_x * (yy - cy) + cx
    sy = yy
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    fx = np.clip(sx - x0, 0, 1)
    fy = np.clip(sy - y0, 0, 1)
    v = ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x0 + 1])
         + fy * ((1 - fx) * img[y0 + 1, x0] + fx * img[y0 + 1, x0 + 1]))
    return np.clip(v, 0, 255).astype(np.uint8)


def test_refine_affine_recovers_shear(trained):
    det, templ = trained
    sheared = _shear_float(templ, 0.04)  # 4% x-shear
    scene = np.zeros((256, 256), np.uint8)
    _paste(scene, sheared, 60, 70)
    matches = det.match(scene, 60.0)
    assert matches
    refined = refine_detections(det, scene, matches[:1], model="affine",
                                iterations=5)
    assert refined
    r = refined[0]
    A = r["affine"]
    # recovered b (x-from-y coupling) should track the injected shear
    assert abs(A[0, 1] - 0.04) < 0.02, A
    assert abs(A[0, 0] - 1.0) < 0.03 and abs(A[1, 1] - 1.0) < 0.03, A
    assert r["residual"] < 1.5
    # sim2 cannot represent shear: its residual should be no better
    base = refine_detections(det, scene, matches[:1], iterations=5)
    assert base and r["residual"] <= base[0]["residual"] + 0.05
