"""Detector API surface + persistence roundtrip + synthetic end-to-end."""

import numpy as np

from shape_based_matching_tpu import Detector
from shape_based_matching_tpu.utils.synthetic import (build_rotated_detector,
                                                      synthetic_scene,
                                                      synthetic_shape_image)


def test_api_surface(tmp_path):
    det, _ = build_rotated_detector(num_templates=8, num_features=32,
                                    size=128)
    assert det.num_classes() == 1
    assert det.class_ids() == ["bench"]
    assert det.num_templates() == 8
    assert det.num_templates("bench") == 8
    assert det.get_t(0) == 4 and det.get_t(1) == 8
    tp = det.get_templates("bench", 3)
    assert len(tp) == det.pyramid_levels
    assert tp[0].pyramid_level == 0

    # roundtrip through the OpenCV-YAML persistence
    fmt = str(tmp_path / "%s.yaml.gz")
    det.write_classes(fmt)
    det.save_settings(str(tmp_path / "detector_linemod.yaml"))

    det2 = Detector.load_settings(str(tmp_path / "detector_linemod.yaml"))
    assert det2.T_at_level == det.T_at_level
    assert det2.num_features == det.num_features
    det2.read_classes(["bench"], fmt)
    assert det2.num_templates("bench") == 8
    t1 = det.get_templates("bench", 5)[0]
    t2 = det2.get_templates("bench", 5)[0]
    assert [(f.x, f.y, f.label) for f in t1.features] == \
           [(f.x, f.y, f.label) for f in t2.features]
    assert (t1.width, t1.height, t1.tl_x, t1.tl_y) == \
           (t2.width, t2.height, t2.tl_x, t2.tl_y)


def test_synthetic_end_to_end_detection():
    det, templ_img = build_rotated_detector(num_templates=4,
                                            num_features=48, size=128)
    scene = synthetic_scene(256, 256, templ_img, n_instances=1, seed=3)
    matches = det.match(scene, 80.0)
    assert matches, "expected at least one detection"
    best = matches[0]
    assert best.similarity > 85.0
    # the unrotated instance should win with template 0
    assert best.template_id == 0


def test_match_size_validation():
    det, _ = build_rotated_detector(num_templates=2, num_features=32,
                                    size=128)
    bad = np.zeros((100, 100), np.uint8)  # 100 not divisible by 16
    try:
        det.match(bad, 90.0)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "multiples of 16" in str(e)


def test_add_template_failure_returns_minus1():
    det = Detector(num_features=63)
    flat = np.zeros((64, 64), np.uint8)  # no gradients at all
    assert det.add_template(flat, "empty") == -1


def test_get_instance_singleton(tmp_path):
    import shape_based_matching_tpu as sbm

    det, _ = build_rotated_detector(num_templates=2, num_features=32,
                                    size=128)
    model_dir = str(tmp_path)
    det.write_classes(model_dir + "/%s.yaml.gz")
    det.save_settings(model_dir + "/detector_linemod.yaml",
                      templates_dir=model_dir)
    sbm.reset_instance()
    inst = sbm.get_instance(model_dir + "/detector_linemod.yaml")
    assert inst.num_templates("bench") == 2
    assert sbm.get_instance() is inst  # singleton
    sbm.reset_instance()


def _match_key_list(matches):
    return [(m.class_id, m.template_id, m.x, m.y, round(m.similarity, 4))
            for m in matches]


def test_match_batch_equals_per_frame_match():
    det, templ_img = build_rotated_detector(num_templates=6,
                                            num_features=48, size=128)
    frames = np.stack([
        synthetic_scene(256, 256, templ_img, n_instances=1, seed=s)
        for s in (3, 4, 5, 7)
    ])
    # reference side: the exact escalating path (match() itself now
    # delegates to the batched program, so compare against the host loop)
    want = [det._match_escalating(f, 80.0) for f in frames]
    got = det.match_batch(frames, 80.0)
    assert len(got) == len(want)
    for b, (g, w) in enumerate(zip(got, want)):
        assert _match_key_list(g) == _match_key_list(w), f"frame {b}"


def test_match_batch_overflow_falls_back_exactly():
    det, templ_img = build_rotated_detector(num_templates=6,
                                            num_features=48, size=128)
    frames = np.stack([
        synthetic_scene(256, 256, templ_img, n_instances=2, seed=s)
        for s in (3, 11)
    ])
    # threshold low enough that >2 coarse candidates exist -> cand_cap=2
    # must overflow and reroute through the exact escalating path
    want = [det.match(f, 55.0) for f in frames]
    got = det.match_batch(frames, 55.0, cand_cap=2, distinct_cap=1)
    for b, (g, w) in enumerate(zip(got, want)):
        assert _match_key_list(g) == _match_key_list(w), f"frame {b}"


def test_match_no_trained_classes_returns_empty():
    """match()/match_batch on an untrained detector (or with class_ids
    that filter to nothing) must return empty lists, not crash (the
    reference's matchClass loop simply runs zero iterations)."""
    from shape_based_matching_tpu import Detector

    det = Detector(num_features=16, T=(4, 8))
    img = np.zeros((64, 64), np.uint8)
    assert det.match(img, 90.0) == []
    assert det.match_batch(img[None], 90.0) == [[]]

    det2, _ = build_rotated_detector(num_templates=2, num_features=16,
                                     size=64)
    assert det2.match(img, 90.0, class_ids=["no-such-class"]) == []


def test_match_batch_packed_output():
    det, templ_img = build_rotated_detector(num_templates=4,
                                            num_features=48, size=128)
    frames = np.stack([
        synthetic_scene(256, 256, templ_img, n_instances=1, seed=s)
        for s in (3, 4)
    ])
    packed = det.match_batch(frames, 80.0, cand_cap=64, as_matches=False)
    k, x, y, sc, valid, overflow = packed["bench"]
    assert k.shape == x.shape == y.shape == sc.shape == valid.shape \
        == (2, 64)
    assert overflow.shape == (2,)
    assert not overflow.any()
    # packed rows reproduce the Match list (pre-dedup superset)
    want = det.match(frames[0], 80.0)
    got = sorted(
        {(int(x[0, i]), int(y[0, i]), round(float(sc[0, i]), 4), int(k[0, i]))
         for i in np.nonzero(valid[0])[0]})
    assert sorted({(m.x, m.y, round(m.similarity, 4), m.template_id)
                   for m in want}) == got


def test_multi_class_match_merges_per_class_results():
    """match() over several classes == union of per-class matches
    (matchClass is per-class independent, line2Dup.cpp:1129-1141)."""
    import numpy as np

    from shape_based_matching_tpu.models.detector import Detector
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_scene, synthetic_shape_image)

    det = Detector(num_features=48, T=(4, 8))
    t_a = synthetic_shape_image(96, seed=1)
    t_b = synthetic_shape_image(96, seed=2)
    det.add_template(t_a, "a", np.full_like(t_a, 255))
    det.add_template_rotate("a", 0, 90.0, (48.0, 48.0))
    det.add_template(t_b, "b", np.full_like(t_b, 255))

    scene = synthetic_scene(256, 256, t_a, n_instances=1, seed=3)
    # paste a b-instance too
    scene[140:236, 20:116] = np.maximum(scene[140:236, 20:116], t_b)

    both = det.match(scene, 80.0)  # all classes
    only_a = det.match(scene, 80.0, ["a"])
    only_b = det.match(scene, 80.0, ["b"])

    def key(m):
        return (m.class_id, m.template_id, m.x, m.y,
                round(float(m.similarity), 4))

    assert sorted(map(key, both)) == sorted(
        map(key, list(only_a) + list(only_b)))
    assert {m.class_id for m in both} == {"a", "b"}


def test_merged_many_class_match_heterogeneous_banks():
    """Merged multi-class program (one launch for all classes) must be
    exact when classes have different feature counts (bank N padding)
    and template sizes."""
    import numpy as np

    from shape_based_matching_tpu.models.detector import Detector
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_scene, synthetic_shape_image)

    det = Detector(num_features=63, T=(4, 8))
    templs = {}
    for i, (cid, size, nfeat) in enumerate(
            [("c0", 80, 20), ("c1", 96, 63), ("c2", 112, 100),
             ("c3", 96, 40)]):
        t = synthetic_shape_image(size, seed=10 + i)
        templs[cid] = t
        det.add_template(t, cid, np.full_like(t, 255), num_features=nfeat)
        det.add_template_rotate(cid, 0, 45.0 + 10 * i,
                                (size / 2.0, size / 2.0))

    scene = synthetic_scene(320, 320, templs["c0"], 1, seed=30)
    for i, cid in enumerate(["c1", "c2", "c3"]):
        t = templs[cid]
        y0, x0 = 40 + 60 * i, 160
        scene[y0:y0 + t.shape[0], x0:x0 + t.shape[1]] = np.maximum(
            scene[y0:y0 + t.shape[0], x0:x0 + t.shape[1]],
            t[: 320 - y0, : 320 - x0])

    merged = det.match(scene, 75.0)  # all 4 classes in one program
    per_class = []
    for cid in det.class_ids():
        per_class.extend(det.match(scene, 75.0, [cid]))

    def key(m):
        return (m.class_id, m.template_id, m.x, m.y,
                round(float(m.similarity), 4))

    assert sorted(map(key, merged)) == sorted(map(key, per_class))
    assert len({m.class_id for m in merged}) >= 3


def test_merged_overflow_escalated_cap(monkeypatch):
    """A frame overflowing the merged multi-class clamp must retry ONE
    merged program at the escalated cap (exact results) and must NOT
    bounce to the per-class escalating path until that cap overflows."""
    import numpy as np

    from shape_based_matching_tpu.models.detector import Detector
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_scene, synthetic_shape_image)

    det = Detector(num_features=48, T=(4, 8))
    templs = {}
    for i, cid in enumerate(["a", "b", "c"]):
        t = synthetic_shape_image(72, seed=40 + i)
        templs[cid] = t
        det.add_template(t, cid, np.full_like(t, 255))
        det.add_template_rotate(cid, 0, 30.0 * (i + 1), (36.0, 36.0))

    scene = synthetic_scene(256, 256, templs["a"], n_instances=2, seed=50)
    for cid, (yy, xx) in [("b", (40, 140)), ("c", (150, 120))]:
        t = templs[cid]
        th, tw = t.shape
        scene[yy:yy + th, xx:xx + tw] = np.maximum(
            scene[yy:yy + th, xx:xx + tw], t)

    thr = 45.0  # low threshold -> many coarse candidates
    expected = []
    for cid in det.class_ids():
        expected.extend(det.match(scene, thr, [cid]))
    assert expected

    esc_calls = []
    orig_esc = det._match_escalating
    monkeypatch.setattr(
        det, "_match_escalating",
        lambda *a, **kw: (esc_calls.append(1), orig_esc(*a, **kw))[1])
    group_calls = []
    orig_group = det._run_batch_group
    monkeypatch.setattr(
        det, "_run_batch_group",
        lambda *a, **kw: (group_calls.append(a[4]),
                          orig_group(*a, **kw))[1])

    # cand_cap=1 * 3 classes = merged cap 3: guaranteed overflow
    got = det.match_batch(scene[None], thr, cand_cap=1, distinct_cap=1)[0]

    def key(m):
        return (m.class_id, m.template_id, m.x, m.y,
                round(float(m.similarity), 4))

    assert sorted(map(key, got)) == sorted(map(key, expected))
    # first launch at the clamped cap, retry at the escalated cap…
    assert len(group_calls) == 2 and group_calls[1] > group_calls[0]
    # …and no per-class fallback
    assert not esc_calls


def test_add_templates_rotate_batch_exact_vs_sequential():
    """The batched rotation sweep must produce BIT-IDENTICAL templates
    to repeated add_template_rotate (same IEEE op sequence incl. the f64
    rotate, f32 narrowing, theta wrap, and the C-remainder even-origin
    crop) — including angles < 0, > 360, and a non-integer center."""
    import numpy as np

    from shape_based_matching_tpu.models.detector import Detector
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_shape_image)

    det = Detector(num_features=32, T=(4, 8))
    img = synthetic_shape_image(128, 3)
    mask = np.full_like(img, 255)
    assert det.add_template(img, "a", mask) == 0
    assert det.add_template(img, "b", mask) == 0
    angles = ([i * 7.3 for i in range(1, 40)]
              + [359.9, 123.456, -5.0, 360.0, 370.5, 720.1])
    c = (64.0, 63.3)
    seq_ids = [det.add_template_rotate("a", 0, a, c) for a in angles]
    bat_ids = det.add_templates_rotate("b", 0, angles, c)
    assert bat_ids == seq_ids  # same id sequence (both append after 0)
    pa, pb = det.class_templates["a"], det.class_templates["b"]
    assert len(pa) == len(pb) == len(angles) + 1
    for tpa, tpb in zip(pa[1:], pb[1:]):
        for ta, tb in zip(tpa, tpb):
            assert (ta.width, ta.height, ta.tl_x, ta.tl_y,
                    ta.pyramid_level) == (tb.width, tb.height, tb.tl_x,
                                          tb.tl_y, tb.pyramid_level)
            assert len(ta.features) == len(tb.features)
            for fa, fb in zip(ta.features, tb.features):
                assert (fa.x, fa.y, fa.label) == (fb.x, fb.y, fb.label)
                assert np.float32(fa.theta) == np.float32(fb.theta)
