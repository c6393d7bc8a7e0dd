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
    """The sharded training device half gathers the SAME compacted
    per-frame products the local dispatch produces (bit-exact)."""
    _need_devices(8)
    from shape_based_matching_tpu.models.detector import (
        _batch_train_level)
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_shape_image)

    mesh = make_mesh(8)
    H = W = 64
    B = 16
    images = np.stack([synthetic_shape_image(H, seed=100 + i)
                       for i in range(B)])
    train = multichip_train_step(mesh, (H, W), cand_cap=512)
    outs, total = train(jnp.asarray(images))
    assert len(outs) == 2  # pyramid levels
    thr2 = np.float32(60.0 ** 2)
    strong_lo = float(np.nextafter(np.nextafter(
        thr2, np.float32(0)), np.float32(0)))
    src = jnp.asarray(images)
    zmask = jnp.zeros((1, 1, 1), jnp.uint8)
    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    for l, lvl in enumerate(outs):
        if l > 0:
            src = jax.vmap(pyr_down_u8)(src)
        ref = _batch_train_level(src, zmask, jnp.float32(30.0),
                                 jnp.float32(strong_lo), True, False,
                                 8, False, 512)
        for got, want in zip(lvl, ref):
            assert np.array_equal(np.asarray(got), np.asarray(want))
    assert int(total) == sum(
        int(np.asarray(lvl[3]).sum()) for lvl in outs)


def test_add_templates_sharded_bank_parity(rng):
    """Sharded training sweep == local add_templates == sequential
    add_template: identical template pyramids, bit for bit."""
    _need_devices(8)
    from shape_based_matching_tpu.models.detector import Detector
    from shape_based_matching_tpu.parallel.mesh import (
        add_templates_sharded)
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_shape_image)

    def flat(pyramids):
        return [[(t.width, t.height, t.tl_x, t.tl_y, t.pyramid_level,
                  t.sscale, t.orientation, t.tag_field_id, t.fiducial_src,
                  [(f.x, f.y, f.label) for f in t.features])
                 for t in tp] for tp in pyramids]

    B = 19  # deliberately not a multiple of the device count
    frames = np.stack([synthetic_shape_image(96, seed=500 + i)
                       for i in range(B)])
    det_local = Detector(num_features=63)
    ids_local = det_local.add_templates(frames, "cls")
    det_mesh = Detector(num_features=63)
    ids_mesh = add_templates_sharded(det_mesh, frames, "cls",
                                     mesh=make_mesh(8), chunk_per_dev=1)
    assert ids_mesh == ids_local
    assert flat(det_mesh.class_templates["cls"]) == flat(
        det_local.class_templates["cls"])


def test_add_templates_sharded_masked_parity(rng):
    """Masked sharded sweep parity (the jabil flow trains with masks)."""
    _need_devices(8)
    from shape_based_matching_tpu.models.detector import Detector
    from shape_based_matching_tpu.parallel.mesh import (
        add_templates_sharded)
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_shape_image)

    B = 9
    frames = np.stack([synthetic_shape_image(64, seed=700 + i)
                       for i in range(B)])
    masks = np.full(frames.shape, 255, np.uint8)
    masks[:, :8] = 0
    det_local = Detector(num_features=31)
    ids_local = det_local.add_templates(frames, "cls", object_masks=masks)
    det_mesh = Detector(num_features=31)
    ids_mesh = add_templates_sharded(det_mesh, frames, "cls",
                                     object_masks=masks,
                                     mesh=make_mesh(8), chunk_per_dev=1)
    assert ids_mesh == ids_local
    tl = det_local.write_class("cls")
    tm = det_mesh.write_class("cls")
    assert tl == tm


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


def test_multichip_refine_step_parity(rng):
    """Production tier under the mesh: detect + ICP refine sharded over
    frames == the same flow single-device, pose for pose."""
    _need_devices(8)
    from shape_based_matching_tpu.ops.similarity import pack_level_bank
    from shape_based_matching_tpu.parallel.mesh import (
        _local_refine, multichip_refine_step)
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_scene, synthetic_shape_image)

    det = Detector(num_features=31, T=(4, 8))
    templ = synthetic_shape_image(96, seed=2)
    assert det.add_template(templ, "cls",
                            np.full_like(templ, 255)) == 0
    det.add_templates_rotate("cls", 0, [30.0, 60.0, 120.0], (48, 48))
    banks = det._get_banks("cls")

    H = W = 128
    B = 8
    frames = np.stack([synthetic_scene(H, W, templ, n_instances=1,
                                       seed=40 + i) for i in range(B)])
    T_levels = det.T_at_level
    sizes = [(W >> l, H >> l) for l in range(len(T_levels))]
    mesh = make_mesh(8)
    step = multichip_refine_step(mesh, T_levels, (H, W), cand_cap=64,
                                 distinct_cap=8, top_c=4)
    fields = [f for b in banks for f in b]
    got = step(jnp.asarray(frames), jnp.float32(30.0), jnp.float32(80.0),
               *fields)
    n_valid = int(np.asarray(got[6]).sum())
    assert n_valid > 0, "refine found nothing — test scene too hard"
    # BIT-EXACT vs the same flow run per frame on one device: each
    # frame's whole pipeline runs on exactly one shard, so sharding must
    # not change a single bit of any refined pose.
    args = (banks, T_levels, sizes, jnp.float32(30.0), jnp.float32(80.0),
            64, 8, True, 8, 4, 10, 8)
    per_frame = [_local_refine(jnp.asarray(frames[i:i + 1]), *args)
                 for i in range(B)]
    for i, g in enumerate(got):
        w_ = np.concatenate([np.asarray(p[i]) for p in per_frame])
        np.testing.assert_array_equal(np.asarray(g), w_)
    # vs the B=8 batched single-device run the tolerance is float-level
    # only: XLA compiles the vmapped sim2 solve differently per batch
    # size (reduction order), ~1e-4 after 10 ICP iterations.
    want = _local_refine(jnp.asarray(frames), *args)
    for i in (0, 1, 2, 3):  # dtheta, dscale, tx, ty
        np.testing.assert_allclose(np.asarray(got[i]),
                                   np.asarray(want[i]), atol=2e-3)
