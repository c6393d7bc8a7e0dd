"""A/B: packed4 coarse kernel with G templates per grid program.

At K=1000/L1 the measured kernel time (~1.3 ms) exceeds the feature-work
floor (63K features x ~13 cycles ~= 0.87 ms) by ~400 cycles/program —
candidate per-program overhead (output DMA, grid bookkeeping). Grouping G
templates per program amortizes it; accumulators cost G vregs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_coarse_group.py [K]
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


def _make_grouped_kernel(unroll, G):
    def kernel(meta_ref, lm_ref, out_ref):
        rows = lm_ref.shape[1]
        lanes = lm_ref.shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)

        for g in range(G):
            n_feats = meta_ref[g, 0, meta_ref.shape[2] - 1]

            def one(n, g=g):
                idx = meta_ref[g, 0, n]
                b = meta_ref[g, 1, n]
                a = meta_ref[g, 2, n]
                m = meta_ref[g, 3, n]
                p = lm_ref[idx]
                x = pltpu.roll(p, b, axis=0)
                l = pltpu.roll(x, a, axis=1)
                l1 = pltpu.roll(l, rows - 1, axis=0)
                return jnp.where(col < m, l, l1)

            def body(i, acc, one=one):
                base = i * unroll
                vals = [one(base + u) for u in range(unroll)]
                while len(vals) > 1:
                    vals = [vals[v] + vals[v + 1]
                            for v in range(0, len(vals), 2)]
                return acc + vals[0]

            acc = jax.lax.fori_loop(
                0, (n_feats + unroll - 1) // unroll, body,
                jnp.zeros((rows, lanes), jnp.int32))
            out_ref[g] = acc

    return kernel


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        _build_meta, coarse_similarity_pallas)
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
    print(f"packed4 G=1 (current)  K={K}  {t_ref:7.3f} ms")

    # grouped variant, same packed4 preparation
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    n_ori = int(lm.shape[0])
    C = n_ori * T * T
    gran = 4096
    M_pad = -(-(M + max(W, 1)) // gran) * gran
    P = M_pad - M
    rows_w = M_pad // 512

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
        lm4 = jax.lax.bitcast_convert_type(
            copies.reshape(4, C + 1, rows_w * 128, 4), jnp.int32
        ).reshape(4 * (C + 1), rows_w, 128)

        inb = (b.valid & (b.fx >= 0) & (b.fx < w_img)
               & (b.fy >= 0) & (b.fy < h_img))
        plane = b.label * (T * T) + (b.fy % T) * T + (b.fx % T)
        plane = jnp.where(inb, plane, C)
        s = jnp.where(inb, (b.fy // T) * W + b.fx // T, 0)
        nf = jnp.where(b.valid.any(axis=1), b.nfeat, 0).astype(jnp.int32)
        meta = _build_meta(plane, s, nf, unit=4, copies=4, C=C,
                           rows=rows_w, unroll=32)
        return lm4, meta

    lm4, meta = jax.block_until_ready(prep(lm, bank))
    N1 = meta.shape[2]

    def run_grouped(meta_, lm4_, G):
        Kp = -(-K // G) * G
        mpad = jnp.pad(meta_, ((0, Kp - K), (0, 0), (0, 0)))
        Sp = pl.pallas_call(
            _make_grouped_kernel(32, G),
            grid=(Kp // G,),
            in_specs=[
                pl.BlockSpec((G, 4, N1), lambda k: (k, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((4 * (C + 1), rows_w, 128),
                             lambda k: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, rows_w, 128), lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Kp, rows_w, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(mpad, lm4_)
        S = jax.lax.bitcast_convert_type(Sp, jnp.uint8).reshape(
            Kp, M_pad)[:K, :M].astype(jnp.int32)
        wf = (bank.width - 1) // T + 1
        hf = (bank.height - 1) // T + 1
        positions = (H - hf) * W + (W - wf) + 1
        j = jnp.arange(M, dtype=jnp.int32)[None, :]
        return jnp.where(j < positions[:, None], S, 0)

    S2 = None
    for G in (2, 4, 8):
        f = jax.jit(functools.partial(run_grouped, G=G))
        t, S2 = bench(f, meta, lm4)
        print(f"packed4 G={G} (grouped)  K={K}  {t:7.3f} ms")
    print(f"bit-equal(last): {bool(jnp.array_equal(S_ref, S2))}")


if __name__ == "__main__":
    main()
