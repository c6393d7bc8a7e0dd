"""Coverage for less-exercised paths: masks, many-feature templates,
non-default pyramid depths, geometry consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from shape_based_matching_tpu import Detector
from shape_based_matching_tpu.ops import response, similarity
from shape_based_matching_tpu.oracle import reference as oracle
from shape_based_matching_tpu.utils.synthetic import (synthetic_scene,
                                                      synthetic_shape_image)


def test_match_with_mask_equals_masked_quantization(rng):
    """quantize() zeroes orientations outside the mask
    (line2Dup.cpp:446-450): masking out half the image must kill matches
    whose features fall there."""
    templ = synthetic_shape_image(96, seed=3)
    det = Detector(num_features=32)
    det.add_template(templ, "s", np.full_like(templ, 255))
    scene = synthetic_scene(192, 192, templ, n_instances=1, seed=11)
    full = det.match(scene, 75.0)
    assert full

    all_mask = np.full(scene.shape, 255, np.uint8)
    same = det.match(scene, 75.0, mask=all_mask)
    assert ([(m.x, m.y, m.similarity) for m in full]
            == [(m.x, m.y, m.similarity) for m in same])

    # mask out the matched region entirely -> no match there
    m = full[0]
    t0 = det.get_templates("s", 0)[0]
    blocked = all_mask.copy()
    x0 = max(0, m.x - 8)
    y0 = max(0, m.y - 8)
    blocked[y0 : m.y + t0.height + 8, x0 : m.x + t0.width + 8] = 0
    masked = det.match(scene, 75.0, mask=blocked)
    assert all(abs(mm.x - m.x) > 4 or abs(mm.y - m.y) > 4 for mm in masked)


def test_similarity_many_features(rng):
    """>63-feature path (the reference's u16 mode, 8191 cap): i32 accumulation must
    equal the oracle for a 300-feature template."""
    T = 8
    h = w = 128
    q = rng.randint(0, 256, (h, w), dtype=np.uint8)
    lm = np.asarray(response.build_linear_memories(jnp.asarray(q), T))
    M = (h // T) * (w // T)
    feats = [(int(rng.randint(0, 100)), int(rng.randint(0, 100)),
              int(rng.randint(0, 8))) for _ in range(300)]
    bank = similarity.pack_level_bank(
        [{"features": feats, "width": 100, "height": 100}])
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    S, _ = similarity.coarse_similarity(lmflat, bank, T, (w, h))
    want = oracle.similarity(lm, feats, (100, 100), (w, h), T)
    np.testing.assert_array_equal(
        np.asarray(S).reshape(h // T, w // T), want.astype(np.int32))


@pytest.mark.parametrize("T_levels,scene_size", [((4,), 256),
                                                 ((4, 8, 8), 512)])
def test_nondefault_pyramid_depths(T_levels, scene_size):
    # NOTE: 3 levels need a roomy scene: the refinement border is 8*T at
    # each level (line2Dup.cpp:1227), which swallows small images.
    templ = synthetic_shape_image(128, seed=6)
    det = Detector(num_features=48, T=T_levels)
    assert det.pyramid_levels == len(T_levels)
    tid = det.add_template(templ, "s", np.full_like(templ, 255))
    assert tid == 0
    tp = det.get_templates("s", 0)
    assert len(tp) == len(T_levels)
    scene = synthetic_scene(scene_size, scene_size, templ, n_instances=1,
                            seed=8)
    matches = det.match(scene, 70.0)
    assert matches
    assert matches[0].similarity > 80.0


def test_rotate_scale_geometry_consistency():
    """rotateScaleRect must track rotateScaleImage: a bright rect embedded in
    an image keeps its content under the transformed rect."""
    from shape_based_matching_tpu.utils.verify import (rotate_scale_image,
                                                       rotate_scale_rect)

    img = np.zeros((60, 100), np.uint8)
    rect = (20, 10, 30, 24)
    img[10 : 10 + 24, 20 : 20 + 30] = 200
    for angle in (90.0, 180.0, 270.0):
        timg = rotate_scale_image(img, 1.0, angle)
        trect = rotate_scale_rect(rect, 1.0, angle, (100, 60))
        x, y, w, h = trect
        assert w > 0 and h > 0
        inner = timg[y + 2 : y + h - 2, x + 2 : x + w - 2]
        assert inner.size and (inner == 200).mean() > 0.95, (angle, trect)
        # cv::Rect(Point2f, Point2f) truncates: allow a 1px boundary sliver
        # (the reference exhibits the same wobble; cf. test_scalrot.cpp)
        outside = timg.copy()
        outside[max(0, y - 1) : y + h + 1, max(0, x - 1) : x + w + 1] = 0
        assert (outside == 200).sum() == 0, (angle, trect)


def test_crop_templates_negative_odd_min_keeps_c_remainder():
    """C's `min_x % 2 == 1` is FALSE for negative odd values (remainder -1),
    so the reference (line2Dup.cpp:137-140) does NOT even-align a negative
    odd min corner. Rotated features crossing the origin hit this."""
    from shape_based_matching_tpu.models.template import (Feature, Template,
                                                          crop_templates)

    tp = [Template(pyramid_level=0,
                   features=[Feature(-3, -5, 0), Feature(10, 12, 1)])]
    crop_templates(tp)
    t = tp[0]
    # min corner stays (-3, -5): features rebase to (0,0) and (13,17)
    assert (t.tl_x, t.tl_y) == (-3, -5)
    assert (t.features[0].x, t.features[0].y) == (0, 0)
    assert (t.features[1].x, t.features[1].y) == (13, 17)
    # positive odd minima are still even-aligned (3 -> 2)
    tp2 = [Template(pyramid_level=0,
                    features=[Feature(3, 5, 0), Feature(9, 9, 1)])]
    crop_templates(tp2)
    assert (tp2[0].tl_x, tp2[0].tl_y) == (2, 4)

    # the NumPy oracle shares the same semantics
    ot = [{"pyramid_level": 0,
           "features": [{"x": -3, "y": -5, "label": 0},
                        {"x": 10, "y": 12, "label": 1}]}]
    oracle.crop_templates(ot)
    assert (ot[0]["tl_x"], ot[0]["tl_y"]) == (-3, -5)


def test_similarity_edge_overread_matches_framework(rng):
    """Features at fx == width / fy == height with T | width: the C++
    flat read runs past the plane into the next grid row
    (line2Dup.cpp:843-856, no clamp). The oracle's full-image similarity
    must reproduce those continuation bytes exactly like the framework
    paths do (regression: the oracle used to clamp at the plane end)."""
    T = 8
    h = w = 128
    q = rng.randint(0, 256, (h, w), dtype=np.uint8)
    lm = np.asarray(response.build_linear_memories(jnp.asarray(q), T))
    M = (h // T) * (w // T)
    # 24x24 template (T | 24) with max-x/max-y features AT the bbox edge
    # (crop_templates places them there): off + positions > M.
    feats = [(24, 24, 2), (24, 8, 5), (16, 24, 7), (0, 0, 1), (13, 7, 3)]
    bank = similarity.pack_level_bank(
        [{"features": feats, "width": 24, "height": 24}])
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    S, positions = similarity.coarse_similarity(lmflat, bank, T, (w, h))
    assert int(positions[0]) + 51 > M  # the config does overread
    want = oracle.similarity(lm, feats, (24, 24), (w, h), T)
    np.testing.assert_array_equal(
        np.asarray(S).reshape(h // T, w // T), want.astype(np.int32))


def test_similarity_8191_feature_cap(rng):
    """The reference's hard cap: 8191 features per template
    (line2Dup.cpp:811,931 u16 mode; >=8192 raises CV_Error). The XLA
    accumulation must stay exact at the cap (max raw sum 4*8191 = 32764
    fits u16 like the C++), and the framework must reject beyond it."""
    T = 8
    h = w = 64
    q = rng.randint(0, 256, (h, w), dtype=np.uint8)
    lm = np.asarray(response.build_linear_memories(jnp.asarray(q), T))
    M = (h // T) * (w // T)
    feats = [(int(rng.randint(0, 48)), int(rng.randint(0, 48)),
              int(rng.randint(0, 8))) for _ in range(8191)]
    bank = similarity.pack_level_bank(
        [{"features": feats, "width": 48, "height": 48}])
    lmflat = jnp.concatenate([jnp.asarray(lm.reshape(-1)),
                              jnp.zeros((M,), jnp.uint8)])
    S, _ = similarity.coarse_similarity(lmflat, bank, T, (w, h))
    want = oracle.similarity(lm, feats, (48, 48), (w, h), T)
    np.testing.assert_array_equal(
        np.asarray(S).reshape(h // T, w // T), want.astype(np.int32))
    assert int(np.asarray(S).max()) <= 4 * 8191
