"""Randomized end-to-end parity: Detector.match vs the NumPy oracle.

The golden suites pin the bundled case0/1/2 configs against the compiled
C++ reference; this fuzz layer composes the same scalar oracle
primitives into the full matchClass orchestration
(oracle.match_class, line2Dup.cpp:1160-1297) and checks the framework's
device pipeline against it on RANDOM configs — image sizes, feature
counts, template shapes, thresholds — that no golden case covers.
Training is shared (detector-trained templates feed both sides), so any
mismatch isolates to the match pipeline.
"""

import numpy as np
import pytest

from shape_based_matching_tpu.models.detector import Detector
from shape_based_matching_tpu.oracle import reference as oracle
from shape_based_matching_tpu.utils.synthetic import (synthetic_scene,
                                                      synthetic_shape_image)


def _oracle_tps(det, class_id):
    """Detector templates -> oracle dict form (per template, per level)."""
    tps = []
    for tid in range(det.num_templates(class_id)):
        tp = det.get_templates(class_id, tid)
        tps.append([
            {
                "features": [(f.x, f.y, f.label) for f in t.features],
                "width": t.width,
                "height": t.height,
            }
            for t in tp
        ])
    return tps


def _match_sets(matches):
    """Distinct (template, x, y, score) tuples: multiple coarse
    candidates can refine to the same location; the C++ sort+unique and
    the framework's _sort_dedup both collapse those exact duplicates."""
    return sorted({(m.template_id, m.x, m.y,
                    round(float(m.similarity), 4)) for m in matches})


def _oracle_sets(matches):
    return sorted({(m["template_id"], m["x"], m["y"],
                    round(float(m["similarity"]), 4)) for m in matches})


@pytest.mark.parametrize("seed,variant",
                         [(0, "gray"), (1, "gray"), (2, "gray"),
                          (3, "gray"), (4, "color"), (5, "mask"),
                          (6, "16ori"), (7, "3level")])
def test_fuzz_match_parity(seed, variant):
    rng = np.random.RandomState(seed)
    # 3 levels need 8*2^2-tileable dims (T=8 two pyrDowns up)
    stride = 32 if variant == "3level" else 16
    h = stride * rng.randint(160 // stride, 384 // stride)
    w = stride * rng.randint(160 // stride, 384 // stride)
    templ_size = int(rng.choice([96, 128, 160]))
    nfeat = int(rng.choice([31, 63, 100]))
    threshold = float(rng.choice([75.0, 85.0, 92.0]))
    n_inst = rng.randint(1, 4)

    n_ori = 16 if variant == "16ori" else 8
    T = (2, 4, 8) if variant == "3level" else (4, 8)
    det = Detector(num_features=nfeat, T=T, num_orientations=n_ori)
    templ = synthetic_shape_image(templ_size, seed=seed + 10)
    tid = det.add_template(templ, "fuzz", np.full_like(templ, 255))
    assert tid == 0
    for a in (37.0, 90.0, 203.5):
        det.add_template_rotate("fuzz", 0, a,
                                (templ_size / 2.0, templ_size / 2.0))

    scene = synthetic_scene(h, w, templ, n_instances=n_inst,
                            seed=seed + 20)
    mask = None
    if variant == "color":
        # BGR scene with per-channel noise: exercises the max-channel
        # gradient path on both sides
        scene = np.stack([scene,
                          np.clip(scene.astype(np.int16) + 12, 0, 255)
                          .astype(np.uint8),
                          scene // 2], axis=-1)
    elif variant == "mask":
        mask = np.zeros((h, w), np.uint8)
        mask[: 3 * h // 4, : 3 * w // 4] = 255  # exclude a border band

    got = det.match(scene, threshold, ["fuzz"], mask=mask)

    lms, sizes = oracle.build_lm_pyramid(
        scene, det.weak_threshold, det.T_at_level, n_ori=n_ori, mask=mask)
    want = oracle.match_class(lms, sizes, det.T_at_level,
                              _oracle_tps(det, "fuzz"), threshold, "fuzz")

    assert _match_sets(got) == _oracle_sets(want), (
        f"seed={seed} variant={variant} h={h} w={w} nfeat={nfeat} "
        f"thr={threshold}")


def test_fuzz_multi_class_merged_parity():
    """The merged multi-class program vs per-class oracle matches."""
    rng = np.random.RandomState(77)
    h, w = 320, 288
    det = Detector(num_features=63, T=(4, 8))
    templs = {}
    for i, cid in enumerate(("a", "b", "c")):
        t = synthetic_shape_image(96, seed=40 + i)
        templs[cid] = t
        det.add_template(t, cid, np.full_like(t, 255))
        det.add_template_rotate(cid, 0, 30.0 * (i + 1), (48.0, 48.0))

    scene = synthetic_scene(h, w, templs["a"], 1, seed=50)
    scene[180:276, 20:116] = np.maximum(scene[180:276, 20:116],
                                        templs["b"])
    scene[40:136, 170:266] = np.maximum(scene[40:136, 170:266],
                                        templs["c"])

    got = det.match(scene, 72.0)  # merged one-program path
    lms, sizes = oracle.build_lm_pyramid(scene, det.weak_threshold,
                                         det.T_at_level)
    want = []
    for cid in det.class_ids():
        want.extend(oracle.match_class(lms, sizes, det.T_at_level,
                                       _oracle_tps(det, cid), 72.0, cid))

    def gk(m):
        return (m.class_id, m.template_id, m.x, m.y,
                round(float(m.similarity), 4))

    def wk(m):
        return (m["class_id"], m["template_id"], m["x"], m["y"],
                round(float(m["similarity"]), 4))

    assert sorted({gk(m) for m in got}) == sorted({wk(m) for m in want})
    assert len({m.class_id for m in got}) >= 2
