"""Attribute the 10k-template e2e cost AFTER the delta-chain landed.

Times nested WHOLE programs (per CLAUDE.md, separately-jitted stage
timings are artifacts; deltas between nested whole programs bound each
suffix stage):

  Q1:  frontend + chain kernel, block on the RAW [P*u_out, rows, 128]
       word tiles (compact per-template output rows)
  Q2:  Q1 + emit gather + bitcast -> cells [K, m_pad]
  Q3:  Q2 + extract_candidates_cells
  Q3w: Q1 + extract_candidates_chain_words on the RAW i32 word tiles
       (no emit gather, no relayout — the production fast path)
  W1:  Q1 + the words compare+count pass only (block on bcnt/n_above) —
       bounds the full-array scan inside extraction
  W2:  W1 + the two-level searchsorted (block on candidate block ids)
  Q4:  full match step (__graft_entry__.entry) == bench e2e

Round-3 history (v5e, K=10k, pre-compact-output): Q1 3.03 ms,
Q3(cells) 9.5 ms, Q3w 5.7 ms, full e2e 6.72 ms.

Run (chip must be otherwise idle):
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_chain_cost.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from shape_based_matching_tpu.ops.filters import pyr_down_u8
from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
    _positions, chain_coarse_word_rows)
from shape_based_matching_tpu.ops.response import \
    build_linear_memories_fused
from shape_based_matching_tpu.ops.similarity import (
    _rmin_for_threshold, extract_candidates_cells,
    extract_candidates_chain_words)
from shape_based_matching_tpu.utils.synthetic import (
    build_rotated_detector, synthetic_scene)


def main(num_templates=10000, cap=256):
    H = W = 1024
    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=63)
    banks = det._get_banks("bench")
    scene = jnp.asarray(synthetic_scene(H, W, templ_img, n_instances=4))
    bank = banks[1]
    T = 8
    size_wh = (W // 2, H // 2)
    w1, h1 = size_wh
    Wd = w1 // T
    M = Wd * (h1 // T)

    chain = det._get_chain(bank, size_wh)
    assert chain is not None, "planner declined — nothing to attribute"
    plan, desc = chain
    print(f"chain: unit={desc.unit} rows={desc.rows} m_pad={desc.m_pad} "
          f"P={desc.n_programs} u_out={desc.u_out} (K={num_templates})",
          flush=True)

    K = int(plan.emit.shape[0])
    cell_dtype = jnp.uint8 if desc.unit == 4 else jnp.uint16
    threshold = jnp.float32(85.0)

    def chain_raw(image):
        src1 = pyr_down_u8(image)
        lm1 = build_linear_memories_fused(src1, 30.0, T)
        words, positions = chain_coarse_word_rows(lm1, bank, plan, desc,
                                                  T, size_wh)
        return words, positions

    @jax.jit
    def q1(image):
        return chain_raw(image)[0]

    @jax.jit
    def q2(image):
        words, _ = chain_raw(image)
        rows_k = words[plan.emit]
        return jax.lax.bitcast_convert_type(rows_k, cell_dtype).reshape(
            K, desc.m_pad)

    @jax.jit
    def q3(image):
        words, positions = chain_raw(image)
        rows_k = words[plan.emit]
        cells = jax.lax.bitcast_convert_type(rows_k, cell_dtype).reshape(
            K, desc.m_pad)
        return extract_candidates_cells(cells, positions, bank.nfeat,
                                        threshold, T, Wd, cap, M)

    @jax.jit
    def q3w(image):
        words, positions = chain_raw(image)
        return extract_candidates_chain_words(
            words, plan.emit, positions, bank.nfeat, threshold,
            desc.unit, T, Wd, cap, M)

    def row_params(positions):
        R = desc.n_programs * desc.u_out
        rmin, t4n = _rmin_for_threshold(bank.nfeat, threshold)
        cell_max = jnp.int32((1 << (32 // desc.unit)) - 1)
        passable = rmin <= cell_max
        quirk = rmin <= 0
        big = jnp.full((1,), 1 << 30, jnp.int32)
        row_tmpl = jnp.full((R,), K, jnp.int32).at[plan.emit].set(
            jnp.arange(K, dtype=jnp.int32))
        pos_row = jnp.concatenate(
            [positions.astype(jnp.int32),
             jnp.zeros((1,), jnp.int32)])[row_tmpl]
        rmin_row = jnp.concatenate([rmin, big])[row_tmpl]
        passable_row = jnp.concatenate(
            [passable, jnp.zeros((1,), jnp.bool_)])[row_tmpl]
        quirk_row = jnp.concatenate(
            [quirk, jnp.zeros((1,), jnp.bool_)])[row_tmpl]
        return pos_row, rmin_row, passable_row, quirk_row

    def count_pass(words, positions):
        """The _extract_words compare+count prefix (verbatim semantics)."""
        pos_row, rmin_row, passable_row, quirk_row = row_params(positions)
        R, rows, lanes = words.shape
        unit = desc.unit
        bits = 32 // unit
        vmask = (1 << bits) - 1
        tr_l = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
        ln_l = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        jbase = ((tr_l * lanes) + ln_l) * unit
        pos_b = pos_row[:, None, None]
        pas_b = passable_row[:, None, None]
        qrk_b = quirk_row[:, None, None]
        rmin_b = rmin_row[:, None, None]
        flags = []
        for s in range(unit):
            v = (words >> (bits * s)) & vmask
            j = jbase[None] + s
            live = j < pos_b
            flags.append((live & pas_b & (v >= rmin_b))
                         | (qrk_b & ~live & (j < M)))
        cnt_blk = sum(jnp.sum(f, axis=2, dtype=jnp.int32) for f in flags)
        return cnt_blk.reshape(-1)

    @jax.jit
    def w1(image):
        words, positions = chain_raw(image)
        bcnt = count_pass(words, positions)
        return jnp.cumsum(bcnt)[-1]

    @jax.jit
    def w2(image):
        words, positions = chain_raw(image)
        bcnt = count_pass(words, positions)
        nb = bcnt.shape[0]
        incl = jnp.cumsum(bcnt)
        ns = -(-nb // 128)
        cnt_p = (jnp.concatenate(
            [bcnt, jnp.zeros((ns * 128 - nb,), jnp.int32)])
            if ns * 128 != nb else bcnt)
        sup = jnp.sum(cnt_p.reshape(ns, 128), axis=1, dtype=jnp.int32)
        sup_incl = jnp.cumsum(sup)
        slots = jnp.arange(cap, dtype=jnp.int32)
        sb = jnp.sum(sup_incl[None, :] <= slots[:, None], axis=1,
                     dtype=jnp.int32)
        sb_safe = jnp.minimum(sb, ns - 1)
        sup_excl = sup_incl - sup
        r1 = slots - sup_excl[sb_safe]
        blk_rows = cnt_p.reshape(ns, 128)[sb_safe]
        blk_incl = jnp.cumsum(blk_rows, axis=1)
        bi = jnp.sum(blk_incl <= r1[:, None], axis=1, dtype=jnp.int32)
        blk = sb_safe * 128 + jnp.minimum(bi, 127)
        return blk, incl[-1]

    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        chain_coarse_word_rows_counted)
    from shape_based_matching_tpu.ops.similarity import (
        extract_candidates_chain_counted)

    @jax.jit
    def q1c(image):
        src1 = pyr_down_u8(image)
        lm1 = build_linear_memories_fused(src1, 30.0, T)
        rmin, _ = _rmin_for_threshold(bank.nfeat, threshold)
        words, kcnt, positions = chain_coarse_word_rows_counted(
            lm1, bank, plan, desc, T, size_wh, rmin)
        return words, kcnt

    @jax.jit
    def q3c(image):
        src1 = pyr_down_u8(image)
        lm1 = build_linear_memories_fused(src1, 30.0, T)
        rmin, _ = _rmin_for_threshold(bank.nfeat, threshold)
        words, kcnt, positions = chain_coarse_word_rows_counted(
            lm1, bank, plan, desc, T, size_wh, rmin)
        return extract_candidates_chain_counted(
            words, kcnt, plan.emit, positions, bank.nfeat, threshold,
            desc.unit, T, Wd, cap, M)

    from __graft_entry__ import entry
    fn4, args4 = entry(num_templates=num_templates)
    q4 = jax.jit(fn4)

    progs = [("Q1 chain-raw", lambda: q1(scene)),
             ("Q2 +emit/cells", lambda: q2(scene)),
             ("Q3 +extract-cells", lambda: q3(scene)),
             ("Q3w words-direct", lambda: q3w(scene)),
             ("W1 +count-pass", lambda: w1(scene)),
             ("W2 +searchsorted", lambda: w2(scene)),
             ("Q1c counted-raw", lambda: q1c(scene)),
             ("Q3c counted-extract", lambda: q3c(scene)),
             ("Q4 full e2e", lambda: q4(*args4))]
    for name, f in progs:
        t0 = time.time()
        jax.block_until_ready(f())
        print(f"compiled {name}: {time.time()-t0:.0f} s", flush=True)

    iters = 20
    for rep in range(3):
        line = []
        for name, f in progs:
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = f()
            jax.block_until_ready(out)
            line.append(
                f"{name}: {(time.perf_counter()-t0)/iters*1e3:7.3f} ms")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10000)
