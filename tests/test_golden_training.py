"""Template training parity vs the compiled C++ reference.

Covers the full training stack: gradients -> hysteresis quantization ->
greedy 5x5 magnitude NMS -> scattered feature selection -> cropTemplates,
plus addTemplate_rotate feature math, on the bundled case imagery.
"""

import numpy as np
import pytest

from shape_based_matching_tpu import Detector
from shape_based_matching_tpu.models.shape_info import ShapeInfoProducer
from .golden_utils import load_json, load_mat


def _templates_as_tuples(det, class_id):
    out = []
    for tid in range(det.num_templates(class_id)):
        tp = det.get_templates(class_id, tid)
        levels = []
        for t in tp:
            levels.append({
                "width": t.width, "height": t.height,
                "tl_x": t.tl_x, "tl_y": t.tl_y,
                "pyramid_level": t.pyramid_level,
                "features": sorted((f.x, f.y, f.label) for f in t.features),
            })
        out.append(levels)
    return out


def _golden_as_tuples(doc):
    out = []
    for tp in doc["templates"]:
        levels = []
        for t in tp:
            levels.append({
                "width": t["width"], "height": t["height"],
                "tl_x": t["tl_x"], "tl_y": t["tl_y"],
                "pyramid_level": t["pyramid_level"],
                "features": sorted(tuple(f) for f in t["features"]),
            })
        out.append(levels)
    return out


def test_case1_training_parity():
    det = Detector(num_features=128, T=(4, 8))
    img = load_mat("case1_train_img.bin")
    mask = load_mat("case1_train_mask.bin")
    first = det.add_template(img, "test", mask)
    assert first == 0
    cx = img.shape[1] / 2.0
    cy = img.shape[0] / 2.0
    for a in range(45, 360, 45):
        det.add_template_rotate("test", first, float(a), (cx, cy))

    want = _golden_as_tuples(load_json("case1_train_templates.json"))
    got = _templates_as_tuples(det, "test")
    assert len(got) == len(want)
    for tid, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"template {tid} differs"


def test_case0_training_parity():
    det = Detector(num_features=150, T=(4, 8))
    img = load_mat("case0_train_img.bin")
    producer = ShapeInfoProducer(img)
    for i in range(1, 11):
        scale = i / 10.0
        src = producer.transform(img, 0, scale)
        m255 = np.full(img.shape[:2], 255, np.uint8)
        msk = ((producer.transform(m255, 0, scale) > 0) * np.uint8(255))
        tid = det.add_template(src, "circle", msk,
                               num_features=int(150 * scale))
        assert tid == i - 1

    want = _golden_as_tuples(load_json("case0_train_templates.json"))
    got = _templates_as_tuples(det, "circle")
    assert len(got) == len(want)
    for tid, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"template {tid} (scale {(tid+1)/10}) differs"


def test_jabil_sweep_training_parity():
    """The jabil creation sweep (test_jabil.cpp:79-104): angles
    {0,90,180,270} x scales {0.9, 1.0, 1.1}. Scale 1.1 exercises the
    bit-exact INTER_LINEAR *upscale* path of the producer."""
    det = Detector(num_features=150, T=(4, 8),
                   weak_threshold=100.0, strong_threshold=200.0)
    fid = load_mat("jabil_fid_img.bin")
    shapes = ShapeInfoProducer(fid)
    shapes.angle_range = [0.0, 270.0]
    shapes.angle_step = 90.0
    shapes.scale_range = [0.9, 1.1]
    shapes.scale_step = 0.1
    infos = shapes.produce_infos()
    assert len(infos) == 12  # scale-major, angle-minor (line2Dup.h:430-441)
    assert [i.angle for i in infos] == [0.0, 90.0, 180.0, 270.0] * 3
    assert infos[-1].scale > 1.05  # the sweep reaches the 1.1 upscale
    for info in infos:
        tid = det.add_template(shapes.src_of(info), "17",
                               shapes.mask_of(info), info.scale, info.angle,
                               3, "fid.png")
        assert tid >= 0

    want = _golden_as_tuples(load_json("jabil_train_templates.json"))
    got = _templates_as_tuples(det, "17")
    assert len(got) == len(want) == 12
    for tid, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"template {tid} differs"
