"""Prototype: delta-encoded ("chain") coarse scoring for dense banks.

Dense rotation/scale sweeps make ADJACENT templates share most of their
coarse-level (plane, shift) feature slots — measured on the synthetic
rotation bank (L1, T=8, 63 feats -> 32 at L1):

    K=10000 (0.036 deg step): adds+subs per step ~3.2  (10% of full 32)
    K=1000  (0.36 deg step):  ~26 (81%)
    K=360   (1.0 deg step):   ~49 (154% -- chaining loses)

Since every feature's score contribution is a pure tile function of its
slot quadruple (idx, b, a, m), and packed-lane integer sums are exact
and order-independent (final per-byte values <= 255; intermediate word
carries cancel exactly), template k's tile can be computed as

    tile_k = tile_{k-1} + sum(adds) - sum(subs)        (bit-exact)

A host-side planner packs templates into grid programs as chains of
fixed-size sub-steps (S slots each): the first template of a chain is a
base (reset + all features, sign +1), subsequent ones are deltas; a
delta costing >= nfeat breaks the chain (rebase). The kernel is fully
static: U_max python-unrolled sub-steps of S slot bodies, an
accumulate-or-reset per sub-step, one VMEM row store per sub-step; the
host gathers each template's final sub-step row afterwards.

At K=10k this cuts coarse kernel feature-work ~5-7x. Not a reference
concept (line2Dup.cpp scores every template independently) — this is
TPU-first exploitation of the enumerated-template structure the
reference's own addTemplate_rotate produces.

Usage:
  PYTHONPATH=... python tools/exp_chain_kernel.py [K] [n_pairs]
  SBM_PALLAS_INTERPRET=1 CHECK_ONLY=1 ... (CPU bit-equality only)
"""

import os
import sys
import time
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from ab_bench import ab_compare  # noqa: E402

INTERPRET = os.environ.get("SBM_PALLAS_INTERPRET", "") == "1"
CHECK_ONLY = os.environ.get("CHECK_ONLY", "") == "1"

S = 4        # feature slots per sub-step
U_MAX = 64   # sub-steps per grid program


def plan_chain(plane, s, nf, *, unit, copies, C, rows, S=S, U_max=U_MAX):
    """numpy planner: pack K templates into chained grid programs.

    plane/s: [K, N] folded plane ids (C = zero plane) and cell shifts;
    nf: [K] live counts. Returns (meta [P, 6, U_max, S] i32,
    emit_row [K] i32 into the flattened [P*U_max] output rows).

    meta rows: 0 idx, 1 b, 2 a, 3 m, 4 sgn; row 5 slot 0: keep flag
    (0 = reset accumulator before this sub-step).
    """
    plane = np.asarray(plane)
    s = np.asarray(s)
    nf = np.asarray(nf)
    K = plane.shape[0]
    zp = (copies - 1) * (C + 1) + C if copies > 1 else C
    PAD = (zp, 0, 0, 128, 1)

    def slot(p, sh, sgn):
        sw = sh // unit
        r = sh % unit
        idx = r * (C + 1) + p if copies > 1 else p
        return (idx, (rows - sw // 128) % rows, (128 - sw % 128) % 128,
                128 - sw % 128, sgn)

    def feats(k):
        n = int(nf[k])
        return Counter(zip(plane[k, :n].tolist(), s[k, :n].tolist()))

    programs = []   # list of list of sub-steps; sub-step = (keep, [slots])
    emit = np.zeros(K, np.int64)
    cur = []        # sub-steps of the open program
    prev = None     # previous template's feature Counter (chain tail)

    def flush():
        nonlocal cur, prev
        if cur:
            programs.append(cur)
        cur = []
        prev = None

    for k in range(K):
        fk = feats(k)
        if prev is not None:
            adds = fk - prev
            subs = prev - fk
            use_delta = (sum(adds.values()) + sum(subs.values())
                         < sum(fk.values()))
        else:
            use_delta = False
        if use_delta:
            slots = ([slot(p, sh, 1) for (p, sh), c in adds.items()
                      for _ in range(c)]
                     + [slot(p, sh, -1) for (p, sh), c in subs.items()
                        for _ in range(c)])
            keep0 = 1
        else:
            slots = [slot(p, sh, 1) for (p, sh), c in fk.items()
                     for _ in range(c)]
            keep0 = 0
        if not slots and prev is not None:
            emit[k] = emit[k - 1]      # zero-delta template: free
            prev = fk
            continue
        need = max(1, -(-len(slots) // S))
        if len(cur) + need > U_max:
            flush()
            # restart as base
            slots = [slot(p, sh, 1) for (p, sh), c in fk.items()
                     for _ in range(c)]
            keep0 = 0
            need = max(1, -(-len(slots) // S))
        slots += [PAD] * (need * S - len(slots))
        for u in range(need):
            keep = keep0 if u == 0 else 1
            cur.append((keep, slots[u * S:(u + 1) * S]))
        emit[k] = (len(programs)) * U_max + len(cur) - 1
        # emit index above assumes cur belongs to program len(programs);
        # recorded BEFORE flush of this program, so it's correct.
        prev = fk
    flush()

    P = len(programs)
    meta = np.zeros((P, 6, U_max, S), np.int32)
    meta[:, 0] = zp
    meta[:, 3] = 128
    meta[:, 4] = 1
    meta[:, 5, :, 0] = 1    # trailing no-op sub-steps keep the acc
    for p, prog in enumerate(programs):
        for u, (keep, slots) in enumerate(prog):
            meta[p, 5, u, 0] = keep
            for sl, (i_, b_, a_, m_, g_) in enumerate(slots):
                meta[p, 0, u, sl] = i_
                meta[p, 1, u, sl] = b_
                meta[p, 2, u, sl] = a_
                meta[p, 3, u, sl] = m_
                meta[p, 4, u, sl] = g_
    return meta, emit.astype(np.int32)


def _make_chain_kernel(U_max=U_MAX, S_=S):
    def kernel(meta_ref, lm_ref, out_ref):
        rows = lm_ref.shape[1]
        lanes = lm_ref.shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        acc = jnp.zeros((rows, lanes), jnp.int32)
        for u in range(U_max):
            keep = meta_ref[0, 5, u, 0]
            vals = []
            for sl in range(S_):
                idx = meta_ref[0, 0, u, sl]
                b = meta_ref[0, 1, u, sl]
                a = meta_ref[0, 2, u, sl]
                m = meta_ref[0, 3, u, sl]
                sg = meta_ref[0, 4, u, sl]
                p = lm_ref[idx]
                x = pltpu.roll(p, b, axis=0)
                l = pltpu.roll(x, a, axis=1)
                l1 = pltpu.roll(l, rows - 1, axis=0)
                vals.append(jnp.where(col < m, l, l1) * sg)
            while len(vals) > 1:
                vals = [vals[v] + vals[v + 1]
                        for v in range(0, len(vals), 2)]
            acc = acc * keep + vals[0]
            out_ref[0, u] = acc

    return kernel


def chain_cells(meta, lm4, emit, rows_w, C):
    """Run the chain kernel; returns packed cells rows [K, rows, 128]."""
    P = meta.shape[0]
    out = pl.pallas_call(
        _make_chain_kernel(),
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, 6, U_MAX, S), lambda k: (k, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(lm4.shape, lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, U_MAX, rows_w, 128),
                               lambda k: (k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, U_MAX, rows_w, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=INTERPRET,
    )(meta, lm4)
    return out.reshape(P * U_MAX, rows_w, 128)[emit]


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    inner = 20

    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        coarse_similarity_pallas)
    from shape_based_matching_tpu.ops.response import build_linear_memories
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    t0 = time.time()
    det, templ_img = build_rotated_detector(num_templates=K,
                                            num_features=63)
    bank = det._get_banks("bench")[1]
    scene = jnp.asarray(synthetic_scene(1024, 1024, templ_img, 4))
    l1 = pyr_down_u8(scene)
    qg = quantized_orientations_gray(l1, 30.0)
    lm = build_linear_memories(qg.angle, 8)
    jax.block_until_ready(lm)
    print(f"setup K={K}: {time.time() - t0:.1f} s", flush=True)

    T, (w_img, h_img) = 8, (512, 512)
    W, H = w_img // T, h_img // T
    M = W * H
    C = 8 * T * T
    M_pad = -(-(M + max(W, 1)) // 4096) * 4096
    P_ = M_pad - M
    rows_w = M_pad // 512

    @jax.jit
    def prep(lm_):
        lm2 = lm_.reshape(C, M)
        reps = -(-P_ // M)
        ext = jnp.concatenate([lm2, jnp.zeros((reps, M), jnp.uint8)], 0)
        cont = jnp.concatenate(
            [ext[i + 1:i + 1 + C] for i in range(reps)], axis=1)[:, :P_]
        lm2 = jnp.concatenate([lm2, cont], axis=1)
        lm3 = jnp.concatenate(
            [lm2, jnp.zeros((1, M_pad), jnp.uint8)], axis=0)
        flatp = jnp.concatenate(
            [lm3, jnp.zeros((C + 1, 4), jnp.uint8)], axis=1)
        copies = jnp.stack([flatp[:, r:r + M_pad] for r in range(4)])
        return jax.lax.bitcast_convert_type(
            copies.reshape(4, C + 1, rows_w * 128, 4), jnp.int32
        ).reshape(4 * (C + 1), rows_w, 128)

    lm4 = jax.block_until_ready(prep(lm))

    # folded plane/shift arrays (host numpy)
    fx = np.asarray(bank.fx)
    fy = np.asarray(bank.fy)
    lab = np.asarray(bank.label)
    val = np.asarray(bank.valid)
    inb = val & (fx >= 0) & (fx < w_img) & (fy >= 0) & (fy < h_img)
    plane = np.where(inb, lab * (T * T) + (fy % T) * T + (fx % T), C)
    s = np.where(inb, (fy // T) * W + fx // T, 0)
    nf = np.where(val.any(axis=1), np.asarray(bank.nfeat), 0)

    t0 = time.time()
    meta, emit = plan_chain(plane, s, nf, unit=4, copies=4, C=C,
                            rows=rows_w)
    Pn = meta.shape[0]
    slots_used = int((meta[:, 0] != (3 * (C + 1) + C)).sum())
    print(f"plan: {time.time() - t0:.1f} s, {Pn} programs "
          f"({Pn * U_MAX} sub-steps for {K} templates), "
          f"{slots_used} live slots vs {int(nf.sum())} plain "
          f"({slots_used / max(1, int(nf.sum())):.2f}x)", flush=True)

    meta_d = jnp.asarray(meta)
    emit_d = jnp.asarray(emit)

    run_chain = jax.jit(lambda m, l, e: chain_cells(m, l, e, rows_w, C))
    cells_chain = jax.block_until_ready(run_chain(meta_d, lm4, emit_d))

    f_prod = jax.jit(lambda lm_, b: coarse_similarity_pallas(
        lm_, b, T, (w_img, h_img), interpret=INTERPRET,
        raw_cells=True)[0])
    cells_prod = jax.block_until_ready(f_prod(lm, bank))

    chain_u8 = jax.lax.bitcast_convert_type(
        cells_chain, jnp.uint8).reshape(K, M_pad)
    eq = bool(jnp.array_equal(chain_u8, cells_prod))
    print(f"bit-equal chain vs production (full M_pad): {eq}", flush=True)
    if not eq:
        d = np.argwhere(np.asarray(chain_u8) != np.asarray(cells_prod))
        print("first diffs:", d[:5])
        sys.exit(1)
    if CHECK_ONLY:
        print("check-only: done")
        return

    def blk_chain():
        out = None
        for _ in range(inner):
            out = run_chain(meta_d, lm4, emit_d)
        jax.block_until_ready(out)

    def blk_prod():
        out = None
        for _ in range(inner):
            out = f_prod(lm, bank)
        jax.block_until_ready(out)

    res = ab_compare(blk_prod, blk_chain, n_pairs=n_pairs, inner=inner,
                     name_a="prod_packed4", name_b="chain")
    print(res.summary())


if __name__ == "__main__":
    main()
