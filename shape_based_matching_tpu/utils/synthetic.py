"""Synthetic scenes + template banks for benchmarks and entry points.

Self-contained (no reference fixtures needed): draws an anchor-like polygon
shape, trains one template from it, and derives K rotated variants via the
direct feature-rotation path (line2Dup.cpp:1409-1451 equivalent) — the same
construction the reference's angle_test demo uses.
"""

from __future__ import annotations

import numpy as np


def synthetic_shape_image(size: int = 256, seed: int = 0) -> np.ndarray:
    """A textured polygon on dark background; strong, well-spread edges."""
    rng = np.random.RandomState(seed)
    img = (rng.rand(size, size) * 20).astype(np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    c = size / 2.0
    # spiky star polygon: radius modulated by angle
    ang = np.arctan2(yy - c, xx - c)
    rad = np.hypot(yy - c, xx - c)
    rmax = size * (0.28 + 0.10 * np.cos(3 * ang) + 0.06 * np.sin(7 * ang))
    inside = rad < rmax
    img[inside] = 200
    hole = rad < size * (0.08 + 0.03 * np.sin(5 * ang))
    img[hole] = 40
    return img


def synthetic_scene(h: int, w: int, templ: np.ndarray, n_instances: int = 3,
                    seed: int = 1) -> np.ndarray:
    """Paste template instances into a noisy scene."""
    rng = np.random.RandomState(seed)
    scene = (rng.rand(h, w) * 25).astype(np.uint8)
    th, tw = templ.shape
    for i in range(n_instances):
        y = rng.randint(0, h - th)
        x = rng.randint(0, w - tw)
        region = scene[y : y + th, x : x + tw]
        scene[y : y + th, x : x + tw] = np.maximum(region, templ)
    return scene


def synthetic_block_noise_image(size: int = 512, block: int = 4,
                                seed: int = 0) -> np.ndarray:
    """Binary block noise: strong edges EVERYWHERE — the only synthetic
    texture dense enough to saturate the fork's 8191-feature mode
    (README.md:45; a polygon outline tops out near ~2k candidates)."""
    rng = np.random.RandomState(seed)
    blocks = (rng.rand(size // block, size // block) > 0.5)
    img = np.kron(blocks, np.ones((block, block), bool))
    return np.where(img, 220, 30).astype(np.uint8)


def build_rotated_detector(num_templates: int = 360, num_features: int = 63,
                           T=(4, 8), size: int = 256, seed: int = 0,
                           dense: bool = False):
    """Detector with one trained template + (num_templates-1) rotations.

    `dense=True` trains on block noise instead of the star polygon —
    feature-saturated templates for wide-feature (up to 8191) configs."""
    from ..models.detector import Detector

    det = Detector(num_features=num_features, T=T)
    templ_img = (synthetic_block_noise_image(size, seed=seed) if dense
                 else synthetic_shape_image(size, seed))
    mask = np.full_like(templ_img, 255)
    tid = det.add_template(templ_img, "bench", mask)
    assert tid == 0, "synthetic template training failed"
    step = 360.0 / num_templates
    c = size / 2.0
    det.add_templates_rotate("bench", 0,
                             [i * step for i in range(1, num_templates)],
                             (c, c))
    return det, templ_img
