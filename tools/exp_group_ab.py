"""Decisive coarse-kernel retune: paired A/B through the tunnel noise.

VERDICT r2 weak #1 / next #4: the packed4 coarse kernel measures ~13
cycles/feature-tile vs a ~5-cycle roll+roll+add floor, but the tunnel's
process-level variance hides <2x effects in unpaired runs. This script
uses tools/ab_bench.ab_compare (interleaved ABBA pairs + exact sign test
+ bootstrap CI) to make the retune decidable:

  * GROUP sweep: 2 (production) vs 4 vs 8 templates/program,
  * unroll sweep: 32 (production) vs 16 at GROUP winner,
  * variant `parroll`: the row-carry select fed by two PARALLEL dynamic
    sublane rolls of the plane (depth 4) instead of the serial
    roll->roll->static-roll chain (depth 5) — same op count, shorter
    dependency chain,
  * variant `nocarry` (DELIBERATELY WRONG, diagnostic only): drops the
    static roll + select entirely (roll+roll+add). Its speedup is the
    empirical CEILING any carry-elimination trick could ever win; if
    it's <1.1x the whole direction is dead and gets recorded as such.

All correct variants are asserted bit-equal to production before timing.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_group_ab.py [K] [n_pairs]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from ab_bench import ab_compare  # noqa: E402

# SBM_PALLAS_INTERPRET=1 + CHECK_ONLY=1 validates the variants' bit
# equality on CPU (timing is meaningless there).
INTERPRET = os.environ.get("SBM_PALLAS_INTERPRET", "") == "1"
CHECK_ONLY = os.environ.get("CHECK_ONLY", "") == "1"


def _make_kernel(unroll, G, variant="prod"):
    """Variants of the packed4 rotate-accumulate loop (no stitch)."""

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
                if variant == "prod":
                    x = pltpu.roll(p, b, axis=0)
                    l = pltpu.roll(x, a, axis=1)
                    l1 = pltpu.roll(l, rows - 1, axis=0)
                    return jnp.where(col < m, l, l1)
                if variant == "parroll":
                    # two independent sublane rolls; select BEFORE the
                    # lane roll (source lanes col < rem == 128-m wrap to
                    # the next row), one lane roll on the merged word
                    x = pltpu.roll(p, b, axis=0)
                    x1 = pltpu.roll(p, (b + rows - 1) % rows, axis=0)
                    sel = jnp.where(col < 128 - m, x1, x)
                    return pltpu.roll(sel, a, axis=1)
                if variant == "nocarry":  # WRONG on purpose (floor probe)
                    x = pltpu.roll(p, b, axis=0)
                    return pltpu.roll(x, a, axis=1)
                raise ValueError(variant)

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
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    inner = 30

    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.ops.gradients import (
        quantized_orientations_gray)
    from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
        _build_meta)
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
        return lm4, plane, s, nf

    lm4, plane, s, nf = jax.block_until_ready(prep(lm, bank))

    def build(G, unroll, variant="prod"):
        meta = _build_meta(plane, s, nf, unit=4, copies=4, C=C,
                           rows=rows_w, unroll=unroll)
        N1 = meta.shape[2]
        Kp = -(-K // G) * G
        meta = jnp.pad(meta, ((0, Kp - K), (0, 0), (0, 0)))

        @jax.jit
        def run(meta_, lm4_):
            return pl.pallas_call(
                _make_kernel(unroll, G, variant),
                grid=(Kp // G,),
                in_specs=[
                    pl.BlockSpec((G, 4, N1), lambda k: (k, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((4 * (C + 1), rows_w, 128),
                                 lambda k: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((G, rows_w, 128),
                                       lambda k: (k, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Kp, rows_w, 128),
                                               jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 2**20),
                interpret=INTERPRET,
            )(meta_, lm4_)[:K]

        def block_run(meta_=meta, run=run):
            out = None
            for _ in range(inner):
                out = run(meta_, lm4)
            jax.block_until_ready(out)

        return run, meta, block_run

    # correctness gate: every correct variant bit-equal to production
    run0, meta0, blk0 = build(2, 32)
    S0 = jax.block_until_ready(run0(meta0, lm4))
    variants = {
        "G4_u32": build(4, 32),
        "G8_u32": build(8, 32),
        "G2_u16": build(2, 16),
        "parroll_G2_u32": build(2, 32, "parroll"),
    }
    for name, (run, meta, _) in variants.items():
        Sv = jax.block_until_ready(run(meta, lm4))
        eq = bool(jnp.array_equal(S0, Sv))
        print(f"bit-equal {name}: {eq}", flush=True)
        assert eq, name
    if CHECK_ONLY:
        print("check-only: all variants bit-equal, skipping timing")
        return
    variants["nocarry_G2_u32_WRONG"] = build(2, 32, "nocarry")

    for name, (_, _, blk) in variants.items():
        res = ab_compare(blk0, blk, n_pairs=n_pairs, inner=inner,
                         name_a="G2_u32(prod)", name_b=name)
        print(f"--- {name}\n{res.summary()}", flush=True)


if __name__ == "__main__":
    main()
