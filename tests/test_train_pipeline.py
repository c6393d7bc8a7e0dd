"""Pipelined batch training (Detector.add_templates) parity: must be
bit-identical to sequential add_template calls — same feature lists,
same failure (-1) semantics, same id assignment."""

import numpy as np

from shape_based_matching_tpu import Detector
from shape_based_matching_tpu.utils.synthetic import synthetic_shape_image


def _features(det, cid):
    out = []
    for tid in range(det.num_templates(cid)):
        tp = det.get_templates(cid, tid)
        out.append([
            (t.width, t.height, t.tl_x, t.tl_y,
             tuple((f.x, f.y, f.label) for f in t.features))
            for t in tp
        ])
    return out


def _images(n, size=128, with_flat=True):
    imgs = [synthetic_shape_image(size, seed=100 + i) for i in range(n)]
    if with_flat:  # a featureless frame: extraction must fail (-1)
        imgs[n // 2] = np.full((size, size), 127, np.uint8)
    return np.stack(imgs)


def test_add_templates_matches_sequential():
    imgs = _images(7)
    seq = Detector(num_features=48)
    seq_ids = [seq.add_template(img, "c") for img in imgs]

    bat = Detector(num_features=48)
    bat_ids = bat.add_templates(imgs, "c", chunk=3)

    assert bat_ids == seq_ids
    assert -1 in seq_ids  # the flat frame failed in both
    assert _features(bat, "c") == _features(seq, "c")


def test_add_templates_masked_matches_sequential():
    imgs = _images(5, with_flat=False)
    rng = np.random.RandomState(0)
    masks = (rng.rand(*imgs.shape) > 0.15).astype(np.uint8) * 255

    seq = Detector(num_features=32)
    seq_ids = [seq.add_template(img, "c", m)
               for img, m in zip(imgs, masks)]
    bat = Detector(num_features=32)
    bat_ids = bat.add_templates(imgs, "c", masks, chunk=2)

    assert bat_ids == seq_ids
    assert _features(bat, "c") == _features(seq, "c")


def test_add_templates_overflow_falls_back_exactly():
    imgs = _images(3, with_flat=False)
    seq = Detector(num_features=32)
    for img in imgs:
        seq.add_template(img, "c")
    bat = Detector(num_features=32)
    # tiny cap: every frame overflows -> exact sequential fallback
    ids = bat.add_templates(imgs, "c", cand_cap=8, chunk=2)
    assert ids == [0, 1, 2]
    assert _features(bat, "c") == _features(seq, "c")


def test_add_templates_16ori():
    imgs = _images(3, with_flat=False)
    seq = Detector(num_features=32, num_orientations=16)
    for img in imgs:
        seq.add_template(img, "c")
    bat = Detector(num_features=32, num_orientations=16)
    bat.add_templates(imgs, "c")
    assert _features(bat, "c") == _features(seq, "c")
