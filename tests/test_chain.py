"""Delta-chain coarse scoring (ops/pallas/chain_plan.py).

Dense template banks score the coarse level as base + signed deltas
between adjacent templates — must be bit-identical to the plain path.
Kernel runs through the Pallas interpreter on CPU (SBM_PALLAS_INTERPRET
is set process-wide by conftest for these tests via env marker below).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shape_based_matching_tpu.ops.pallas.chain_plan import plan_chain
from shape_based_matching_tpu.utils.synthetic import (build_rotated_detector,
                                                      synthetic_scene)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("SBM_PALLAS_INTERPRET", "1")


@pytest.fixture(scope="module")
def dense_detector():
    # 0.24 deg steps on a small shape: adjacent coarse-level templates
    # share most (plane, shift) slots -> the planner engages
    det, templ = build_rotated_detector(num_templates=1500,
                                        num_features=63, size=96)
    return det, templ


def test_planner_engages_on_dense_bank(dense_detector):
    det, _ = dense_detector
    bank = det._get_banks("bench")[-1]
    res = plan_chain(bank, det.T_at_level[-1], (256, 256),
                     det.num_orientations)
    assert res is not None, "planner declined a dense 0.24-deg bank"
    plan, desc = res
    assert desc.unit == 4  # 63 features x resp 4 <= 255 -> u8 cells
    K = plan.emit.shape[0]
    assert K == 1500
    # chain must actually be cheaper than plain scoring
    live = int((plan.meta[:, 0] != (3 * (desc.n_ori * 64 + 1)
                                    + desc.n_ori * 64)).sum())
    assert live < 0.6 * int(np.asarray(bank.nfeat).sum())


def test_planner_declines_sparse_bank():
    # 6-deg steps: deltas cost more than full templates
    det, _ = build_rotated_detector(num_templates=360, num_features=63,
                                    size=96)
    bank = det._get_banks("bench")[-1]
    assert plan_chain(bank, det.T_at_level[-1], (256, 256),
                      det.num_orientations) is None


def test_planner_respects_disable_env(dense_detector, monkeypatch):
    det, _ = dense_detector
    bank = det._get_banks("bench")[-1]
    monkeypatch.setenv("SBM_NO_CHAIN", "1")
    assert plan_chain(bank, det.T_at_level[-1], (256, 256),
                      det.num_orientations) is None


@pytest.mark.parametrize("words_route", [True, False])
def test_chain_match_exact_vs_xla(dense_detector, monkeypatch,
                                  words_route):
    """Full match with the chain engaged == XLA fallback, exactly —
    through the default word-rows extraction AND the cells escape
    hatch (SBM_NO_WORDS_EXTRACT=1)."""
    det, templ = dense_detector
    if not words_route:
        monkeypatch.setenv("SBM_NO_WORDS_EXTRACT", "1")
    scene = synthetic_scene(256, 256, templ, n_instances=2, seed=11)

    det._chain_plans.clear()
    det.use_pallas = True
    m_chain = det.match(scene, 80.0)
    engaged = [v for v in det._chain_plans.values() if v is not None]
    assert engaged, "chain plan did not engage on the dense bank"

    det.use_pallas = False
    m_xla = det.match(scene, 80.0)
    det.use_pallas = None

    key = lambda m: (m.template_id, m.x, m.y, m.similarity)
    assert sorted(map(key, m_chain)) == sorted(map(key, m_xla))
    assert m_chain  # the scene contains instances; must find them


def test_zero_delta_templates_cost_one_substep(dense_detector):
    """Duplicate adjacent templates cost ONE no-op sub-step each, and
    emit rows stay strictly increasing (the row-direct extraction
    inverts emit into a row->template map, so rows must be unique)."""
    det, _ = dense_detector
    bank = det._get_banks("bench")[-1]
    # duplicate every template's arrays pairwise -> zero deltas
    import shape_based_matching_tpu.ops.similarity as sim
    dup = sim.LevelBank(
        fx=jnp.repeat(bank.fx, 2, axis=0),
        fy=jnp.repeat(bank.fy, 2, axis=0),
        label=jnp.repeat(bank.label, 2, axis=0),
        valid=jnp.repeat(bank.valid, 2, axis=0),
        nfeat=jnp.repeat(bank.nfeat, 2, axis=0),
        width=jnp.repeat(bank.width, 2, axis=0),
        height=jnp.repeat(bank.height, 2, axis=0),
    )
    res = plan_chain(dup, det.T_at_level[-1], (256, 256),
                     det.num_orientations)
    assert res is not None
    plan, desc = res
    emit = np.asarray(plan.emit)
    assert (np.diff(emit) > 0).all()
    res1 = plan_chain(bank, det.T_at_level[-1], (256, 256),
                      det.num_orientations)
    assert res1 is not None
    plan1, _ = res1
    # the duplicated bank costs at most K extra no-op sub-steps beyond
    # program-boundary packing slack
    rows_dup = desc.n_programs
    rows_single = res1[1].n_programs
    assert rows_dup <= 2 * rows_single + 2


def test_chain_extraction_rows_equals_cells(dense_detector):
    """Three bit-identical implementations must agree slot for slot
    (incl. n_above) at normal, overflowing-cap and negative (quirk)
    thresholds: extract_candidates_cells on emit-gathered cells,
    extract_candidates_chain on the RAW cell rows, and
    extract_candidates_chain_words on the RAW i32 word rows."""
    from shape_based_matching_tpu.ops.pallas.chain_plan import ChainPlan
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        chain_coarse_rows, chain_coarse_word_rows,
        chain_coarse_word_rows_counted)
    from shape_based_matching_tpu.ops.response import build_linear_memories
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.similarity import (
        _rmin_for_threshold, extract_candidates_cells,
        extract_candidates_chain, extract_candidates_chain_counted,
        extract_candidates_chain_words)

    det, templ = dense_detector
    bank = det._get_banks("bench")[-1]
    T = det.T_at_level[-1]
    size_wh = (256, 256)
    res = plan_chain(bank, T, size_wh, det.num_orientations)
    assert res is not None
    plan, desc = res
    plan = ChainPlan(meta=jnp.asarray(plan.meta),
                     emit=jnp.asarray(plan.emit))

    scene = synthetic_scene(512, 512, templ, n_instances=2, seed=7)
    src1 = pyr_down_u8(jnp.asarray(scene))
    g = quantized_orientations_gray(src1, jnp.float32(30.0))
    lm = build_linear_memories(g.angle, T)

    rows_cells, pos = chain_coarse_rows(lm, bank, plan, desc, T, size_wh)
    word_rows, pos_w = chain_coarse_word_rows(lm, bank, plan, desc, T,
                                              size_wh)
    assert jnp.array_equal(pos, pos_w)
    cells = rows_cells[plan.emit]
    W = size_wh[0] // T
    M = W * (size_wh[1] // T)

    def check(got, want, thr, cap, label):
        va, vb = np.asarray(got[4]), np.asarray(want[4])
        assert np.array_equal(va, vb), (label, thr, cap, "valid")
        assert int(got[5]) == int(want[5]), (label, thr, cap, "n_above")
        for a, b, name in zip(got[:4], want[:4], ("k", "x", "y", "sc")):
            # invalid slots hold implementation-specific garbage
            assert np.array_equal(np.asarray(a)[va], np.asarray(b)[vb]), (
                label, thr, cap, name)

    for thr, cap in ((80.0, 256), (60.0, 16), (-5.0, 64)):
        want = extract_candidates_cells(
            cells, pos, bank.nfeat, jnp.float32(thr), T, W, cap, M)
        got_rows = extract_candidates_chain(
            rows_cells, plan.emit, pos, bank.nfeat, jnp.float32(thr),
            T, W, cap, M)
        check(got_rows, want, thr, cap, "rows")
        got_words = extract_candidates_chain_words(
            word_rows, plan.emit, pos, bank.nfeat, jnp.float32(thr),
            desc.unit, T, W, cap, M)
        check(got_words, want, thr, cap, "words")
        # counted kernel: in-kernel live-pass counts + O(C) extraction
        # (incl. the negative-threshold quirk arithmetic at thr=-5)
        rmin, _ = _rmin_for_threshold(bank.nfeat, jnp.float32(thr))
        words_c, kcnt, pos_c = chain_coarse_word_rows_counted(
            lm, bank, plan, desc, T, size_wh, rmin)
        assert jnp.array_equal(pos_c, pos)
        assert jnp.array_equal(words_c, word_rows)
        got_counted = extract_candidates_chain_counted(
            words_c, kcnt, plan.emit, pos, bank.nfeat,
            jnp.float32(thr), desc.unit, T, W, cap, M)
        check(got_counted, want, thr, cap, "counted")


def test_chain_packed2_wide_bank_cells_exact():
    """>63-feature banks use u16 cells (unit=2): chain cells must equal
    the production packed2 raw cells bit-for-bit."""
    from shape_based_matching_tpu.ops.pallas.chain_plan import ChainPlan
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        chain_coarse_cells, coarse_similarity_pallas)
    from shape_based_matching_tpu.ops.response import build_linear_memories
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.filters import pyr_down_u8

    # 1-level pyramid so the coarse level keeps all 128 features
    # (2-level banks halve to <=63 at L1 and fall back to u8 packing)
    det, templ = build_rotated_detector(num_templates=2400,
                                        num_features=128, size=160,
                                        T=(4,))
    bank = det._get_banks("bench")[-1]
    T = det.T_at_level[-1]
    scene = synthetic_scene(320, 320, templ, n_instances=2, seed=3)
    size_wh = (320, 320)   # 1-level: the frame IS the coarse level
    res = plan_chain(bank, T, size_wh, det.num_orientations)
    assert res is not None, "planner declined the dense wide bank"
    plan, desc = res
    assert desc.unit == 2  # 70 features x resp 4 > 255 -> u16 cells
    plan = ChainPlan(meta=jnp.asarray(plan.meta),
                     emit=jnp.asarray(plan.emit))

    g = quantized_orientations_gray(jnp.asarray(scene),
                                    jnp.float32(30.0))
    lm = build_linear_memories(g.angle, T)
    cells_chain, pos_c = chain_coarse_cells(lm, bank, plan, desc, T,
                                            size_wh)
    cells_prod, pos_p = coarse_similarity_pallas(
        lm, bank, T, size_wh, mask_positions=False, raw_cells=True)
    assert cells_chain.dtype == cells_prod.dtype == jnp.uint16
    assert jnp.array_equal(pos_c, pos_p)
    assert jnp.array_equal(cells_chain, cells_prod)

    # counted route on u16 (unit=2) words: extraction parity vs the
    # compare-pass words route
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        chain_coarse_word_rows, chain_coarse_word_rows_counted)
    from shape_based_matching_tpu.ops.similarity import (
        _rmin_for_threshold, extract_candidates_chain_counted,
        extract_candidates_chain_words)

    W = size_wh[0] // T
    M = W * (size_wh[1] // T)
    thr = jnp.float32(82.0)
    word_rows, pos_w = chain_coarse_word_rows(lm, bank, plan, desc, T,
                                              size_wh)
    rmin, _ = _rmin_for_threshold(bank.nfeat, thr)
    words_c, kcnt, _pc = chain_coarse_word_rows_counted(
        lm, bank, plan, desc, T, size_wh, rmin)
    assert jnp.array_equal(words_c, word_rows)
    want = extract_candidates_chain_words(
        word_rows, plan.emit, pos_w, bank.nfeat, thr, desc.unit, T, W,
        128, M)
    got = extract_candidates_chain_counted(
        words_c, kcnt, plan.emit, pos_w, bank.nfeat, thr, desc.unit, T,
        W, 128, M)
    va, vb = np.asarray(got[4]), np.asarray(want[4])
    assert np.array_equal(va, vb)
    assert int(got[5]) == int(want[5])
    for a, b in zip(got[:4], want[:4]):
        assert np.array_equal(np.asarray(a)[va], np.asarray(b)[vb])


def test_plan_chain_sharded_shapes(dense_detector):
    """Per-shard plans stack: meta [n_shards*P_max, ...], emit
    [K] with shard-local row indices, shared ChainDesc."""
    from shape_based_matching_tpu.ops.pallas.chain_plan import (
        CHAIN_S, CHAIN_U, plan_chain, plan_chain_sharded)

    det, _ = dense_detector
    bank = det._get_banks("bench")[-1]
    T = det.T_at_level[-1]
    n_shards = 4          # 1500 % 4 == 0 -> K_loc = 375 >= _MIN_K
    res = plan_chain_sharded(bank, n_shards, T, (256, 256),
                             det.num_orientations)
    assert res is not None
    meta, emit, desc = res
    assert meta.shape[0] == n_shards * desc.n_programs
    assert meta.shape[1:] == (7, CHAIN_U, CHAIN_S)
    assert emit.shape == (1500,)
    # every shard's emit rows stay inside ITS padded program block
    assert emit.max() < desc.n_programs * desc.u_out
    # the whole-bank plan and the sharded plan agree on the packing
    plan0, desc0 = plan_chain(bank, T, (256, 256), det.num_orientations)
    assert (desc.unit, desc.rows, desc.m_pad) == (
        desc0.unit, desc0.rows, desc0.m_pad)


def test_chain_sharded_match_exact(dense_detector):
    """match_images_sharded with the templ-sharded chain engaged ==
    single-device Detector.match (XLA), exactly — interpret-mode Pallas
    under shard_map on the virtual CPU mesh."""
    from shape_based_matching_tpu.parallel.mesh import (make_mesh,
                                                        match_images_sharded)

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    det, templ = dense_detector
    frames = np.stack([
        np.asarray(synthetic_scene(256, 256, templ, n_instances=2, seed=s))
        for s in (11, 21)])

    mesh = make_mesh(4, data=2)      # templ axis = 2 -> K_loc = 750
    det._chain_plans_sharded = {}
    multi = match_images_sharded(det, frames, 85.0, mesh,
                                 cand_cap=4096, use_pallas=True)
    engaged = [v for (_bank, v) in det._chain_plans_sharded.values()
               if v is not None]
    assert engaged, "sharded chain plan did not engage on the dense bank"

    det.use_pallas = False
    single = [det.match(f, 85.0) for f in frames]
    det.use_pallas = None

    key = lambda m: (m.template_id, m.x, m.y, m.similarity)
    for got, want in zip(multi, single):
        assert sorted(map(key, got)) == sorted(map(key, want))
    assert any(single), "scenes produced no matches (weak fixture)"


def test_chain_spatial_match_exact(dense_detector):
    """match_huge_frame with the chain engaged (bank replicated, plan at
    TILE size) == single-device Detector.match on the full frame."""
    from shape_based_matching_tpu.parallel.spatial import (make_spatial_mesh,
                                                           match_huge_frame)

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 (virtual) devices")
    det, templ = dense_detector
    frame = np.asarray(synthetic_scene(1024, 256, templ, n_instances=3,
                                       seed=31))

    mesh = make_spatial_mesh(2)
    det._chain_plans.clear()
    got = match_huge_frame(det, frame, 88.0, mesh, cand_cap=4096,
                           use_pallas=True)
    engaged = [v for v in det._chain_plans.values() if v is not None]
    assert engaged, "spatial chain plan did not engage on the dense bank"

    det.use_pallas = False
    want = det.match(frame, 88.0)
    det.use_pallas = None

    key = lambda m: (m.template_id, m.x, m.y, m.similarity)
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert want, "scene produced no matches (weak fixture)"


def test_nonpow2_unroll_tree_regression():
    """rows_w=40 makes _unroll_for return 6 (non-power-of-2); the
    pairwise tree must carry odd tails instead of indexing past the
    list (latent until a 16384-cell coarse plane occurred: any
    1024x1024 frame scored at T=8 as the LAST level)."""
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        _unroll_for, coarse_similarity_pallas)
    from shape_based_matching_tpu.ops.response import build_linear_memories
    from shape_based_matching_tpu.ops.similarity import (coarse_similarity,
                                                         pack_level_bank)

    assert _unroll_for(40) == 6

    rng = np.random.RandomState(0)
    qimg = (1 << rng.randint(0, 8, size=(1024, 1024))).astype(np.uint8)
    lm = build_linear_memories(jnp.asarray(qimg), 8)
    templates = [{
        "features": [(int(x), int(y), int(l))
                     for x, y, l in zip(rng.randint(0, 64, 20),
                                        rng.randint(0, 64, 20),
                                        rng.randint(0, 8, 20))],
        "width": 64, "height": 64,
    } for _ in range(3)]
    bank = pack_level_bank(templates)
    S_pal, pos_p = coarse_similarity_pallas(lm, bank, 8, (1024, 1024))
    m = lm.shape[-1]
    lmflat = jnp.concatenate(
        [lm.reshape(-1), jnp.zeros((m,), jnp.uint8)])
    S_xla, pos_x = coarse_similarity(lmflat, bank, 8, (1024, 1024))
    assert jnp.array_equal(pos_p, pos_x)
    assert jnp.array_equal(S_pal, S_xla)
