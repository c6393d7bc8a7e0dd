"""16-orientation mode (ori_16bit_experiment capability parity).

The reference's 16-bit experiment (test/ori_16bit_experiment/
line2Dup_16bit_ori.cpp) has no buildable header or golden driver, so the
contract here is oracle-based: the JAX ops must agree exactly with the NumPy
oracle that follows the experiment's C++ (32 angle buckets -> &15, CV_16U
single-bit images, the vendored SIMILARITY_LUT's responses {0,1,4} —
line2Dup_16bit_ori.cpp:575, NOT LUT_gen.cpp's graded 8..0 table — score
still raw*100/(4*nfeat)), plus an end-to-end synthetic detection check.
Compiled-reference goldens live in tests/test_golden_16ori.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from shape_based_matching_tpu import Detector
from shape_based_matching_tpu.ops import gradients, response
from shape_based_matching_tpu.oracle import reference as oracle
from shape_based_matching_tpu.utils.synthetic import (synthetic_scene,
                                                      synthetic_shape_image)


def test_hysteresis_16_matches_oracle(rng):
    mag = (rng.rand(40, 52).astype(np.float32) * 5000.0)
    ang = (rng.rand(40, 52).astype(np.float32) * 360.0)
    want = oracle.hysteresis_quantize(mag, ang, 900.0, n_ori=16)
    got = np.asarray(gradients.hysteresis_quantize(
        jnp.asarray(mag), jnp.asarray(ang), jnp.float32(900.0), 16))
    assert want.dtype == np.uint16 and got.dtype == np.uint16
    np.testing.assert_array_equal(got, want)


def test_response_maps_16_lut_semantics(rng):
    s = rng.randint(0, 1 << 16, (12, 16)).astype(np.uint16)
    got = np.asarray(response.response_maps(jnp.asarray(s), 16))
    want = oracle.response_maps(s, 16)
    np.testing.assert_array_equal(got, want)
    # Vendored-LUT ground truth (line2Dup_16bit_ori.cpp:575): response =
    # max over SET LIVE bits of w(distance), w = 4 (d<=2), 1 (d in {3,4}),
    # 0 beyond. Bits 12..15 are dead: the reference's nibble split reads
    # the top segment via (s & (15 << 16)) >> 16 == 0 (cpp:639).
    def w(d):
        return 4 if d <= 2 else (1 if d <= 4 else 0)
    for val in [0, 1, 3, 1 << 15, (1 << 7) | (1 << 9), (1 << 13) | 2]:
        img = np.full((4, 4), val, np.uint16)
        r = oracle.response_maps(img, 16)
        for ori in range(16):
            best = 0
            for b in range(12):  # live bits only
                if val & (1 << b):
                    d = min((b - ori) % 16, (ori - b) % 16)
                    best = max(best, w(d))
            assert r[ori][0, 0] == best, (val, ori)


def test_spread_16bit(rng):
    q = rng.randint(0, 1 << 16, (24, 32)).astype(np.uint16)
    want = oracle.spread(q, 8)
    got = np.asarray(response.spread(jnp.asarray(q), 8))
    np.testing.assert_array_equal(got, want)


def test_16ori_end_to_end_detection():
    templ = synthetic_shape_image(128, seed=2)
    det = Detector(num_features=48, num_orientations=16)
    mask = np.full_like(templ, 255)
    tid = det.add_template(templ, "shape", mask)
    assert tid == 0
    for a in (90.0, 180.0, 270.0):
        det.add_template_rotate("shape", 0, a, (64.0, 64.0))
    # 16-ori labels must exceed 8 somewhere for a shape with all edge
    # directions present
    labels = {f.label for f in det.get_templates("shape", 0)[0].features}
    assert max(labels) > 7

    scene = synthetic_scene(256, 256, templ, n_instances=1, seed=9)
    matches = det.match(scene, 60.0)
    assert matches
    assert matches[0].template_id == 0
    # even an exact instance scores well below 100 in this mode: features
    # labeled 12..15 can never respond (the reference's dead-nibble bug,
    # see ops/response.response_maps) — the compiled experiment behaves
    # the same (goldens: the train frame's own match scores ~82.5)
    assert matches[0].similarity > 70.0


def test_16ori_yaml_roundtrip(tmp_path):
    templ = synthetic_shape_image(96, seed=4)
    det = Detector(num_features=32, num_orientations=16)
    det.add_template(templ, "s", np.full_like(templ, 255))
    det.save_settings(str(tmp_path / "det.yaml"))
    det.write_classes(str(tmp_path / "%s.yaml.gz"))
    det2 = Detector.load_settings(str(tmp_path / "det.yaml"))
    assert det2.num_orientations == 16
    det2.read_classes(["s"], str(tmp_path / "%s.yaml.gz"))
    f1 = [(f.x, f.y, f.label) for f in det.get_templates("s", 0)[0].features]
    f2 = [(f.x, f.y, f.label) for f in det2.get_templates("s", 0)[0].features]
    assert f1 == f2
