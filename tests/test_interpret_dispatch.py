"""Full TPU dispatch graph on CPU via SBM_PALLAS_INTERPRET=1.

CPU CI normally exercises only the XLA fallbacks (use_pallas resolves
False off-TPU); a bug in the Detector's Pallas dispatch plumbing (mode
selection, argument wiring, batched grids) would otherwise surface only
on real hardware. With the env flag set, every Pallas wrapper resolves
interpret=True, so Detector(use_pallas=True) runs the EXACT TPU code
path — fused frontend, packed coarse kernel, window refinement — through
the Pallas interpreter, and must produce the XLA path's match lists
bit-for-bit."""

import numpy as np
import pytest

from shape_based_matching_tpu.utils.synthetic import (build_rotated_detector,
                                                      synthetic_scene)


def _keys(matches):
    return [(m.template_id, m.x, m.y, round(m.similarity, 4))
            for m in matches]


@pytest.fixture
def interpret_env(monkeypatch):
    monkeypatch.setenv("SBM_PALLAS_INTERPRET", "1")


def test_detector_pallas_dispatch_interpreted(interpret_env):
    det, templ_img = build_rotated_detector(num_templates=6,
                                            num_features=32, size=56)
    scene = synthetic_scene(256, 256, templ_img, n_instances=2, seed=5)

    det.use_pallas = False
    want = det._match_escalating(scene, 80.0)
    want_b = det.match_batch(scene[None], 80.0)[0]

    det.use_pallas = True
    got = det._match_escalating(scene, 80.0)
    got_b = det.match_batch(scene[None], 80.0)[0]

    assert len(want) > 0
    assert _keys(got) == _keys(want)
    assert _keys(got_b) == _keys(want_b) == _keys(want)


def test_match_batch_multiframe_counted_interpreted(interpret_env):
    """B>1 vmaps the per-frame program, i.e. the counted coarse kernel
    (extra thr operand broadcast, extra cnt output mapped) runs under
    jax.vmap — the streaming/throughput path. Results must equal the
    XLA route frame for frame."""
    import numpy as np

    det, templ_img = build_rotated_detector(num_templates=6,
                                            num_features=32, size=56)
    frames = np.stack([
        np.asarray(synthetic_scene(256, 256, templ_img, n_instances=2,
                                   seed=s)) for s in (5, 9, 13)])

    det.use_pallas = False
    want = det.match_batch(frames, 80.0)
    det.use_pallas = True
    got = det.match_batch(frames, 80.0)
    assert any(len(w) for w in want)
    for g, w in zip(got, want):
        assert _keys(g) == _keys(w)


def test_match_batch_map_mode_interpreted(interpret_env):
    """cand_cap >= 1024 selects the distinct-template map path with the
    Pallas map-window extract; results must equal the XLA path."""
    det, templ_img = build_rotated_detector(num_templates=6,
                                            num_features=32, size=56)
    scene = synthetic_scene(256, 256, templ_img, n_instances=2, seed=5)

    det.use_pallas = False
    want = det.match_batch(scene[None], 80.0, cand_cap=1024)[0]
    det.use_pallas = True
    got = det.match_batch(scene[None], 80.0, cand_cap=1024)[0]
    assert len(want) > 0
    assert _keys(got) == _keys(want)


def test_masked_match_dispatch_interpreted(interpret_env):
    """Masked match now rides the fused Pallas frontend (round-3 lift of
    the frontend_supported exclusion) — must equal the XLA path."""
    import numpy as np

    det, templ_img = build_rotated_detector(num_templates=4,
                                            num_features=32, size=56)
    scene = synthetic_scene(256, 256, templ_img, n_instances=2, seed=6)
    rng = np.random.RandomState(8)
    mask = (rng.rand(*scene.shape) > 0.2).astype(np.uint8) * 255
    mask[:, 200:] = 0

    det.use_pallas = False
    want = det.match(scene, 70.0, mask=mask)
    det.use_pallas = True
    got = det.match(scene, 70.0, mask=mask)
    assert len(want) > 0
    assert _keys(got) == _keys(want)


def test_16ori_match_dispatch_interpreted(interpret_env):
    """16-orientation match through the fused frontend + packed coarse
    kernels (u16 spread -> byte-split linearize) == XLA path."""
    import numpy as np

    from shape_based_matching_tpu.models.detector import Detector
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_shape_image)

    det = Detector(num_features=48, num_orientations=16)
    templ_img = synthetic_shape_image(96, seed=3)
    det.add_template(templ_img, "s", np.full_like(templ_img, 255))
    det.add_template_rotate("s", 0, 90.0, (48.0, 48.0))
    scene = synthetic_scene(256, 256, templ_img, n_instances=1, seed=7)

    det.use_pallas = False
    want = det.match(scene, 60.0)
    det.use_pallas = True
    got = det.match(scene, 60.0)
    assert len(want) > 0
    assert _keys(got) == _keys(want)
