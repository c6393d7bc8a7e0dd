"""A/B: packed4 coarse kernel vs a variant with all per-feature scalars
(flat copy*plane index, both rotate amounts, select bound) precomputed on
the XLA side into the SMEM meta — zero scalar arithmetic in the feature
loop. Measures whether the kernel is partly scalar-issue bound.

OUTCOME: YES — landed in similarity_pallas.py. 1.87 -> 1.47 ms at U8
(scalars alone), 0.96 ms at U32 (deeper tree on the lighter loop);
bit-equal. Reproduced across runs (a >significant effect on this noisy
tunnel, unlike the window-kernel experiments in exp_window_i32.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_meta_precompute.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=50, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best, out


def _make_kernel_v2(UNROLL):
  def _kernel_v2(meta_ref, lm_ref, out_ref):
    n_feats = meta_ref[0, 0, meta_ref.shape[2] - 1]
    rows = lm_ref.shape[1]
    lanes = lm_ref.shape[2]

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)

    def one(n):
        idx = meta_ref[0, 1, n]
        b = meta_ref[0, 2, n]
        a = meta_ref[0, 3, n]
        m = meta_ref[0, 4, n]
        p = lm_ref[idx]
        x = pltpu.roll(p, b, axis=0)
        l = pltpu.roll(x, a, axis=1)
        l1 = pltpu.roll(l, rows - 1, axis=0)
        return jnp.where(col < m, l, l1)

    def body(i, acc):
        base = i * UNROLL
        vals = [one(base + u) for u in range(UNROLL)]
        while len(vals) > 1:
            nxt = [vals[p] + vals[p + 1] for p in range(0, len(vals) - 1, 2)]
            if len(vals) % 2:
                nxt.append(vals[-1])
            vals = nxt
        return acc + vals[0]

    # ceil-blocks: padded slots index the zero plane, so the last block
    # needs no masking and there is no serial tail.
    nb = (n_feats + UNROLL - 1) // UNROLL
    acc = jax.lax.fori_loop(
        0, nb, body, jnp.zeros((rows, lanes), jnp.int32))
    out_ref[0] = acc
  return _kernel_v2


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        coarse_similarity_pallas)
    from shape_based_matching_tpu.ops.response import build_linear_memories
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    det, templ_img = build_rotated_detector(num_templates=K, num_features=63)
    bank = det._get_banks("bench")[1]
    scene = jnp.asarray(synthetic_scene(1024, 1024, templ_img, 4))
    l1 = pyr_down_u8(scene)
    qg = quantized_orientations_gray(l1, 30.0)
    lm = build_linear_memories(qg.angle, 8)
    jax.block_until_ready(lm)
    T, size_wh = 8, (512, 512)

    f_ref = jax.jit(lambda lm_, b: coarse_similarity_pallas(
        lm_, b, T, size_wh, interpret=False)[0])
    t_ref, S_ref = bench(f_ref, lm, bank)
    print(f"packed4 (current)   K={K}   {t_ref:7.3f} ms")

    # --- v2 path: same math, scalars precomputed --------------------------
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    n_ori = int(lm.shape[0])
    C = n_ori * T * T
    N_slots = int(bank.fx.shape[1])
    gran = 4096
    M_pad = -(-(M + max(W, 1)) // gran) * gran
    P = M_pad - M

    @jax.jit
    def prep(lm_, b):
        lm2 = lm_.reshape(C, M)
        reps = -(-P // M)
        ext = jnp.concatenate([lm2, jnp.zeros((reps, M), jnp.uint8)], 0)
        cont = jnp.concatenate(
            [ext[i + 1:i + 1 + C] for i in range(reps)], axis=1)[:, :P]
        lm2 = jnp.concatenate([lm2, cont], axis=1)
        lm3 = jnp.concatenate(
            [lm2, jnp.zeros((1, M_pad), jnp.uint8)], axis=0)
        flatp = jnp.concatenate(
            [lm3, jnp.zeros((C + 1, 4), jnp.uint8)], axis=1)
        copies = jnp.stack([flatp[:, r:r + M_pad] for r in range(4)])
        rows_w = M_pad // 512
        lm4 = jax.lax.bitcast_convert_type(
            copies.reshape(4, C + 1, rows_w * 128, 4), jnp.int32
        ).reshape(4 * (C + 1), rows_w, 128)

        inb = (b.valid & (b.fx >= 0) & (b.fx < w_img)
               & (b.fy >= 0) & (b.fy < h_img))
        plane = b.label * (T * T) + (b.fy % T) * T + (b.fx % T)
        plane = jnp.where(inb, plane, C)
        s = jnp.where(inb, (b.fy // T) * W + b.fx // T, 0)
        sw = s // 4
        r = s % 4
        q = sw // 128
        rem = sw % 128
        idx = r * (C + 1) + plane
        bb = jnp.remainder(rows_w - q, rows_w)
        aa = jnp.remainder(128 - rem, 128)
        mm = 128 - rem
        nf = jnp.where(b.valid.any(axis=1), b.nfeat, 0).astype(jnp.int32)
        npad = 64 - idx.shape[1] % 64 if idx.shape[1] % 64 else 0
        zp = 3 * (C + 1) + C  # copy-3 zero plane
        idx = jnp.concatenate(
            [idx, jnp.full((idx.shape[0], npad), zp, idx.dtype)], axis=1)
        bb = jnp.concatenate(
            [bb, jnp.zeros((bb.shape[0], npad), bb.dtype)], axis=1)
        aa = jnp.concatenate(
            [aa, jnp.zeros((aa.shape[0], npad), aa.dtype)], axis=1)
        mm = jnp.concatenate(
            [mm, jnp.full((mm.shape[0], npad), 128, mm.dtype)], axis=1)
        pad = jnp.zeros_like(nf)[:, None]
        rowsm = [jnp.concatenate([v, p], axis=1) for v, p in
                 [(idx, nf[:, None]), (idx, pad), (bb, pad), (aa, pad),
                  (mm, pad)]]
        # row 0 carries count in last col (kernel reads [0,0,N]); row 1
        # onward carry idx/b/a/m.
        meta = jnp.stack([rowsm[0], rowsm[1], rowsm[2], rowsm[3],
                          rowsm[4]], axis=1).astype(jnp.int32)
        return lm4, meta

    lm4, meta = jax.block_until_ready(prep(lm, bank))
    rows_w = M_pad // 512
    Kk, _, N1 = meta.shape

    def run_v2(meta_, lm4_, kern):
        return pl.pallas_call(
            kern,
            grid=(Kk,),
            in_specs=[
                pl.BlockSpec((1, 5, N1), lambda k: (k, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((4 * (C + 1), rows_w, 128),
                             lambda k: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows_w, 128), lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Kk, rows_w, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(meta_, lm4_)

    import functools as _ft
    Sp = None
    for UN in (4, 8, 16, 32):
        f_v2 = jax.jit(_ft.partial(run_v2, kern=_make_kernel_v2(UN)))
        t_v2, Sp = bench(f_v2, meta, lm4)
        print(f"packed4 (precomp U{UN:2d})  K={K}   {t_v2:7.3f} ms")

    S2 = jax.lax.bitcast_convert_type(Sp, jnp.uint8).reshape(
        K, M_pad)[:, :M].astype(jnp.int32)
    wf = (bank.width - 1) // T + 1
    hf = (bank.height - 1) // T + 1
    positions = (H - hf) * W + (W - wf) + 1
    j = jnp.arange(M, dtype=jnp.int32)[None, :]
    S2 = jnp.where(j < positions[:, None], S2, 0)
    ok = bool(jnp.array_equal(S_ref, S2))
    print(f"bit-equal: {ok}")


if __name__ == "__main__":
    main()
