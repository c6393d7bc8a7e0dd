"""Multi-chip sharding on the virtual 8-device CPU mesh.

The multichip path is the FULL match pipeline (parallel/mesh.py): these
tests assert exact match-list equality — (template_id, x, y, similarity)
— against the single-device Detector.match for every frame, and
element-wise coarse-score equality for every frame and every template
shard, on several mesh shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shape_based_matching_tpu import Detector
from shape_based_matching_tpu.ops.filters import pyr_down_u8
from shape_based_matching_tpu.ops.gradients import quantized_orientations_gray
from shape_based_matching_tpu.ops.response import build_linear_memories
from shape_based_matching_tpu.ops.similarity import coarse_similarity
from shape_based_matching_tpu.parallel.mesh import (make_mesh,
                                                    match_images_sharded,
                                                    multichip_match_step,
                                                    multichip_train_step,
                                                    shard_pad_bank)
from shape_based_matching_tpu.utils.synthetic import (synthetic_scene,
                                                      synthetic_shape_image)


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} (virtual) devices")


@pytest.fixture(scope="module")
def det_and_images():
    templ = synthetic_shape_image(96, seed=3)
    det = Detector(num_features=63)
    tid = det.add_template(templ, "s", np.full_like(templ, 255))
    assert tid == 0
    for theta in (30.0, 60.0, 90.0, 120.0, 150.0):
        det.add_template_rotate("s", 0, theta, (48.0, 48.0))
    images = np.stack([
        np.asarray(synthetic_scene(192, 192, templ, n_instances=2, seed=s))
        for s in (17, 23, 29, 5)
    ])
    return det, images


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 2)])
def test_multichip_match_list_equals_single_device(det_and_images,
                                                   mesh_shape):
    """The sharded pipeline must produce the exact same match list as
    Detector.match — full pyramid refinement included."""
    data, templ_ax = mesh_shape
    _need_devices(data * templ_ax)
    mesh = make_mesh(data * templ_ax, data=data)
    det, images = det_and_images

    single = [det.match(img, 70.0) for img in images]
    multi = match_images_sharded(det, images, 70.0, mesh)

    for b in range(images.shape[0]):
        got = [(m.template_id, m.x, m.y, m.similarity) for m in multi[b]]
        want = [(m.template_id, m.x, m.y, m.similarity) for m in single[b]]
        assert got == want, (b, got[:5], want[:5])
        assert want, f"test scene {b} produced no matches (weak fixture)"


def test_multichip_coarse_scores_elementwise(det_and_images):
    """Element-wise coarse-score parity for ALL images and ALL template
    shards (not just counts)."""
    _need_devices(8)
    mesh = make_mesh(8)  # (2, 4)
    det, images = det_and_images
    banks = det._get_banks("s")
    K = int(banks[-1].fx.shape[0])
    n_templ = mesh.devices.shape[1]
    pbanks = [shard_pad_bank(b, n_templ) for b in banks]

    step = multichip_match_step(mesh, det.T_at_level, images.shape[1:3],
                                cand_cap=64, distinct_cap=16,
                                return_scores=True)
    fields = [f for b in pbanks for f in b]
    *_, S = step(jnp.asarray(images), jnp.float32(30.0), jnp.float32(80.0),
                 *fields)
    S = np.asarray(S)[:, :K]  # drop shard padding rows

    h, w = images.shape[1:3]
    for b in range(images.shape[0]):
        src = pyr_down_u8(jnp.asarray(images[b]))
        grads = quantized_orientations_gray(src, jnp.float32(30.0))
        lm = build_linear_memories(grads.angle, 8)
        m = lm.shape[-1]
        lmflat = jnp.concatenate([lm.reshape(-1), jnp.zeros((m,), jnp.uint8)])
        S_ref, _ = coarse_similarity(lmflat, banks[-1], 8, (w // 2, h // 2))
        np.testing.assert_array_equal(S[b], np.asarray(S_ref))


def test_make_mesh_small_counts():
    """n=2 must give (1, 2) — template parallelism, not a dead (2, 1)."""
    _need_devices(2)
    assert make_mesh(2).devices.shape == (1, 2)
    if len(jax.devices()) >= 4:
        assert make_mesh(4).devices.shape == (2, 2)
    if len(jax.devices()) >= 8:
        assert make_mesh(8).devices.shape == (2, 4)


def test_multichip_train_step(rng):
    _need_devices(8)
    mesh = make_mesh(8)
    H = W = 64
    B = 16
    images = (rng.rand(B, H, W) * 255).astype(np.uint8)
    train = multichip_train_step(mesh, (H, W))
    quant, counts, total = train(jnp.asarray(images))
    assert quant.shape == (B, H, W)
    assert int(total) == int(np.asarray(counts).sum())


def test_graft_entry_dryrun():
    _need_devices(8)
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_multi_class_sharded_equals_single_device():
    """match_images_sharded over several classes == Detector.match (which
    merges per-class matchClass results, line2Dup.cpp:1129-1141)."""
    import numpy as np

    from shape_based_matching_tpu.models.detector import Detector
    from shape_based_matching_tpu.parallel.mesh import (make_mesh,
                                                        match_images_sharded)
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_scene, synthetic_shape_image)

    det = Detector(num_features=48, T=(4, 8))
    t_a = synthetic_shape_image(96, seed=1)
    t_b = synthetic_shape_image(96, seed=2)
    det.add_template(t_a, "a", np.full_like(t_a, 255))
    det.add_template_rotate("a", 0, 90.0, (48.0, 48.0))
    det.add_template(t_b, "b", np.full_like(t_b, 255))

    frames = []
    for s in (3, 4):
        scene = synthetic_scene(256, 256, t_a, n_instances=1, seed=s)
        scene[140:236, 20:116] = np.maximum(scene[140:236, 20:116], t_b)
        frames.append(scene)
    frames = np.stack(frames)

    mesh = make_mesh(8)
    sharded = match_images_sharded(det, frames, 80.0, mesh=mesh)
    single = [det.match(f, 80.0) for f in frames]

    def key(m):
        return (m.class_id, m.template_id, m.x, m.y,
                round(float(m.similarity), 4))

    for a, b in zip(sharded, single):
        assert sorted(map(key, a)) == sorted(map(key, b))
        assert {m.class_id for m in a} == {"a", "b"}
