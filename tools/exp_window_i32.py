"""A/B: window-refinement kernel variants (i32-prewidened ext, fused
sublane roll, deeper unrolls, bigger candidate groups).

OUTCOME (2 runs on the tunneled v5e): INCONCLUSIVE — kept the u8 kernel.
Run 1: u8 3.62, i32 2.89 ms (i32 -20%). Run 2 (same binaries): u8 2.66,
i32 variants 3.1-5.3 ms. Identical programs vary ~2x across processes on
this tunnel, so ~20% effects are below the measurement noise floor; only
multi-x effects (like the coarse kernel's scalar-precompute + tree
unroll, 1.9 -> 0.96 ms, reproduced consistently) are decidable. Kept for
the measurement harness and as a record of what was tried.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_window_i32.py [K] [CAP]
"""

import functools
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


def _make_window_kernel_i32(UNROLL, fused_roll):
  def _window_kernel_i32(meta_ref, ext_ref, out_ref):
    G = meta_ref.shape[1]
    col16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)

    def one(g, n):
        r0 = meta_ref[0, g, 0, n]
        c0 = meta_ref[0, g, 1, n]
        dr = r0 % 8
        dc = c0 % 128
        slab = ext_ref[pl.ds((r0 // 8) * 8, 24),
                       pl.ds((c0 // 128) * 128, 256)]
        if fused_roll:
            sr = pltpu.roll(slab, jax.lax.rem(24 - dr, 24), axis=0)
            a, b = sr[:, :128], sr[:, 128:]
        else:
            a = pltpu.roll(slab[:, :128], jax.lax.rem(24 - dr, 24), axis=0)
            b = pltpu.roll(slab[:, 128:], jax.lax.rem(24 - dr, 24), axis=0)
        ar = pltpu.roll(a, jax.lax.rem(128 - dc, 128), axis=1)
        br = pltpu.roll(b, jax.lax.rem(128 - dc, 128), axis=1)
        return jnp.where(col16 < 128 - dc, ar[:16, :16], br[:16, :16])

    for g in range(G):
        n_feats = meta_ref[0, g, 0, meta_ref.shape[3] - 1]

        def body(i, acc, g=g):
            base = i * UNROLL
            vals = [one(g, base + u) for u in range(UNROLL)]
            while len(vals) > 1:
                vals = [vals[p] + vals[p + 1]
                        for p in range(0, len(vals), 2)]
            return acc + vals[0]

        acc = jax.lax.fori_loop(
            0, n_feats // UNROLL, body, jnp.zeros((16, 16), jnp.int32))

        def tail(n, acc, g=g):
            return acc + one(g, n)

        acc = jax.lax.fori_loop((n_feats // UNROLL) * UNROLL, n_feats,
                                tail, acc)
        out_ref[0, g] = acc
  return _window_kernel_i32


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "G",
                                              "UNROLL", "fused_roll"))
def refine_windows_i32(lm, bank, T, size_wh, k, x, y, valid, threshold,
                       G=8, UNROLL=8, fused_roll=False):
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    n_ori = int(lm.shape[0])
    C = n_ori * T * T
    border = 8 * T
    offset = T // 2 + (T % 2 - 1)

    width_k = bank.width[k]
    height_k = bank.height[k]
    nfeat_k = bank.nfeat[k].astype(jnp.float32)
    max_x = w_img - width_k - border
    max_y = h_img - height_k - border
    cx = jnp.minimum(jnp.maximum(x * 2 + 1, border), max_x)
    cy = jnp.minimum(jnp.maximum(y * 2 + 1, border), max_y)

    off_x = (cx // T - 8) * T
    off_y = (cy // T - 8) * T
    fx = bank.fx[k] + off_x[:, None]
    fy = bank.fy[k] + off_y[:, None]
    inb = (bank.valid[k]
           & (fx >= 0) & (fx < w_img) & (fy >= 0) & (fy < h_img))
    plane = bank.label[k] * (T * T) + (fy % T) * T + (fx % T)
    r = jnp.where(inb, plane * H + fy // T, C * H)
    c = jnp.where(inb, fx // T, 0)
    nf = jnp.where(valid, bank.nfeat[k], 0).astype(jnp.int32)

    rows = jnp.concatenate([r, nf[:, None]], axis=1)
    cols = jnp.concatenate([c, jnp.zeros_like(nf)[:, None]], axis=1)
    meta = jnp.stack([rows, cols], axis=1).astype(jnp.int32)
    Cc = meta.shape[0]
    Cp = -(-Cc // G) * G
    meta = jnp.pad(meta, ((0, Cp - Cc), (0, 0), (0, 0)))
    meta = meta.reshape(Cp // G, G, 2, meta.shape[2])

    flat2d = lm.reshape(C * H, W)
    below = jnp.concatenate(
        [flat2d[1:], jnp.zeros((1, W), jnp.uint8)], axis=0)
    ext = jnp.concatenate([flat2d, below[:, :16]], axis=1)
    N1 = meta.shape[3]
    w_pad = (((W + 14) // 128) + 2) * 128 - (W + 16)
    ext = jnp.pad(ext, ((0, 32), (0, w_pad))).astype(jnp.int32)  # <- widen

    R, Wext = ext.shape
    patches = pl.pallas_call(
        _make_window_kernel_i32(UNROLL, fused_roll),
        grid=(Cp // G,),
        in_specs=[
            pl.BlockSpec((1, G, 2, N1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R, Wext), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, 16, 16), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cp // G, G, 16, 16), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(meta, ext)

    pf = patches.reshape(Cp, 256)[:Cc]
    best = jnp.argmax(pf, axis=1).astype(jnp.int32)
    raw = jnp.take_along_axis(pf, best[:, None], axis=1)[:, 0]
    sim = raw.astype(jnp.float32) * 100.0 / (4.0 * nfeat_k)
    nx = (cx // T - 8 + best % 16) * T + offset
    ny = (cy // T - 8 + best // 16) * T + offset
    nvalid = valid & (sim >= threshold)
    return k, nx, ny, sim, nvalid


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from shape_based_matching_tpu.ops.pallas.refine_pallas import (
        refine_windows_pallas)
    from shape_based_matching_tpu.ops.response import (
        build_linear_memories_fused)
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    det, templ_img = build_rotated_detector(num_templates=K,
                                            num_features=63)
    banks = det._get_banks("bench")
    scene = jnp.asarray(synthetic_scene(1024, 1024, templ_img, 4))
    lm0 = build_linear_memories_fused(scene, 30.0, 4, 8)
    jax.block_until_ready(lm0)

    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randint(0, K, CAP).astype(np.int32))
    x = jnp.asarray(rng.randint(8, 48, CAP).astype(np.int32))
    y = jnp.asarray(rng.randint(8, 48, CAP).astype(np.int32))
    valid = jnp.ones((CAP,), bool)

    t0, out0 = bench(lambda a: refine_windows_pallas(
        a, banks[0], 4, (1024, 1024), k, x, y, valid,
        jnp.float32(80.0), skip_invalid=True), lm0)
    print(f"window u8  (current)  C={CAP}  {t0:7.3f} ms")

    out1 = None
    for (g_, u_, f_) in ((8, 8, False), (8, 8, True), (8, 16, False),
                         (16, 8, False), (32, 8, False)):
        t1, out1 = bench(lambda a, g=g_, u=u_, f=f_: refine_windows_i32(
            a, banks[0], 4, (1024, 1024), k, x, y, valid,
            jnp.float32(80.0), G=g, UNROLL=u, fused_roll=f), lm0)
        print(f"window i32 G{g_:2d} U{u_:2d} fused={int(f_)}  C={CAP}  {t1:7.3f} ms")

    eq = all(bool(jnp.array_equal(a, b)) for a, b in zip(out0, out1))
    print(f"bit-equal(last): {eq}")


if __name__ == "__main__":
    main()
