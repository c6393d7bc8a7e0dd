"""Spatial (row-sharded huge-frame) matching equivalence on the CPU mesh.

The sharded match must produce the exact single-device Detector match
list — same (template, x, y, score) set — for every instance placement,
including instances that straddle shard-band boundaries (the halo
guarantees band candidates see bit-identical linear memories and
refinement windows)."""

import numpy as np
import pytest

import jax

from shape_based_matching_tpu.parallel.spatial import (default_halo,
                                                       make_spatial_mesh,
                                                       match_huge_frame,
                                                       slice_tiles)
from shape_based_matching_tpu.utils.synthetic import (build_rotated_detector,
                                                      synthetic_scene)


def _keys(matches):
    return sorted((m.template_id, m.x, m.y, round(m.similarity, 4))
                  for m in matches)


def test_spatial_match_equals_single_device():
    det, templ_img = build_rotated_detector(num_templates=8,
                                            num_features=48, size=56)
    banks = det._get_banks("bench")
    halo = default_halo(banks[0], det.T_at_level)
    n = 4
    h, w = 640, 256
    assert h >= h // n + 2 * halo, (halo, h)

    # instances deliberately placed across the whole frame, including on
    # band boundaries (rows 160/320/480)
    scene = synthetic_scene(h, w, templ_img, n_instances=0, seed=3)
    th, tw = templ_img.shape
    for (yy, xx) in [(10, 30), (140, 100), (300, 60), (455, 170),
                     (570, 40)]:
        scene[yy:yy + th, xx:xx + tw] = np.maximum(
            scene[yy:yy + th, xx:xx + tw], templ_img)

    mesh = make_spatial_mesh(n)
    want = det._match_escalating(scene, 80.0)
    got = match_huge_frame(det, scene, 80.0, mesh=mesh)
    assert len(want) > 0
    assert _keys(got) == _keys(want)


def test_slice_tiles_geometry():
    img = np.arange(64 * 4, dtype=np.uint8).reshape(64, 4)
    tiles = slice_tiles(img, 4, halo=8)
    assert tiles.shape == (4, 32, 4)
    # first/last tiles hug the image borders; interior tiles center bands
    np.testing.assert_array_equal(tiles[0], img[0:32])
    np.testing.assert_array_equal(tiles[1], img[8:40])
    np.testing.assert_array_equal(tiles[2], img[24:56])
    np.testing.assert_array_equal(tiles[3], img[32:64])


def test_spatial_rejects_oversize_halo():
    det, templ_img = build_rotated_detector(num_templates=2,
                                            num_features=32, size=56)
    scene = synthetic_scene(256, 256, templ_img, n_instances=1, seed=1)
    with pytest.raises(ValueError):
        match_huge_frame(det, scene, 80.0,
                         mesh=make_spatial_mesh(4), halo=224)


def test_spatial_rejects_too_small_halo():
    """An explicit halo below required_halo would silently produce
    inexact near-band-edge scores; it must raise instead."""
    det, templ_img = build_rotated_detector(num_templates=2,
                                            num_features=32, size=56)
    scene = synthetic_scene(256, 256, templ_img, n_instances=1, seed=1)
    with pytest.raises(ValueError, match="required"):
        match_huge_frame(det, scene, 80.0,
                         mesh=make_spatial_mesh(2), halo=16)


def test_spatial_multi_class_matches_single_device():
    """Multi-class huge-frame match (one merged bank per shard) must be
    exact vs the per-class single-device match lists."""
    from shape_based_matching_tpu.models.detector import Detector
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_shape_image)

    det = Detector(num_features=48, T=(4, 8))
    templs = {}
    for i, (cid, size) in enumerate([("c0", 56), ("c1", 72), ("c2", 64)]):
        t = synthetic_shape_image(size, seed=20 + i)
        templs[cid] = t
        det.add_template(t, cid, np.full_like(t, 255))
        det.add_template_rotate(cid, 0, 25.0 * (i + 1),
                                (size / 2.0, size / 2.0))

    h, w = 640, 256
    scene = synthetic_scene(h, w, templs["c0"], n_instances=0, seed=7)
    # instances of all classes, including on band boundaries (rows 160/320)
    for cid, (yy, xx) in [("c0", (20, 30)), ("c1", (140, 100)),
                          ("c2", (300, 60)), ("c0", (455, 170)),
                          ("c1", (540, 40))]:
        t = templs[cid]
        th, tw = t.shape
        scene[yy:yy + th, xx:xx + tw] = np.maximum(
            scene[yy:yy + th, xx:xx + tw], t)

    want = det._match_escalating(scene, 78.0)  # all classes, exact path
    got = match_huge_frame(det, scene, 78.0, mesh=make_spatial_mesh(4))
    assert len(want) > 0
    assert {m.class_id for m in want} == {"c0", "c1", "c2"}

    def keys(ms):
        return sorted((m.class_id, m.template_id, m.x, m.y,
                       round(m.similarity, 4)) for m in ms)

    assert keys(got) == keys(want)
