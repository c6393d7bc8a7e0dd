"""Pallas TPU kernel: batched coarse similarity, VMEM-resident linear memory.

The coarse score is S[k, j] = sum_n LMflat[off[k, n] + j] over all M
decimated positions (line2Dup.cpp:807-858 flat-offset semantics, including
the deliberate row wrap). The XLA fallback (ops/similarity.py) scans the
feature axis with whole-array gathers, paying an HBM round-trip of the int32
accumulator per feature step — ~32 ms for 360 templates at 1024².

TPU-native formulation: the coarse level's linear memories are tiny
(8·T²·M = 2 MB for a 1024² frame at T=8), so the whole [C, Hd, Wd] stack
stays resident in VMEM and a feature's flat shift decomposes into dynamic
rotates — sublane rotate by dy(+1 for the wrap column), lane rotate by dx,
and a lane-iota select between them:

    S_contrib[r, c] = P[r+dy, c+dx]            where c+dx <  Wd
                    = P[r+dy+1, c+dx-Wd]       where c+dx >= Wd

Positions past the template span are masked after the kernel (identical to
the fallback). Consumed cells CAN read past the plane: crop_templates puts
the max-x feature at fx == width, so when T | width (or T | height) the flat
read off + j reaches up to W cells past M — in the C++ reference and the XLA
fallback that lands in the next grid row of the contiguous linear-memory Mat
(well-defined: the overread never crosses an orientation boundary because it
requires fx%T == 0 / fy%T == 0, never plane T*T-1). Each padded plane
therefore carries the *continuation bytes* of the flat layout (head of the
next plane) instead of zeros, and padding is always >= max(W, 1) cells, so
the kernel reads the same bytes as the flat layout for every consumed cell.

Grid is (K,); each program accumulates its template's [Hd, Wd] score tile in
registers from N feature contributions. No HBM traffic besides the one-time
LM fetch and the final score write.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..similarity import LevelBank


def _resolve_interpret(interpret):
    """None -> the SBM_PALLAS_INTERPRET env flag (lets CPU CI run the
    full TPU dispatch graph through the interpreter)."""
    if interpret is None:
        return os.environ.get("SBM_PALLAS_INTERPRET", "") == "1"
    return bool(interpret)


def _make_rotate_kernel(unroll: int, widen: bool = False,
                        stitch: bool = False, group: int = 1,
                        counted=None):
    """Factory for the rotate-accumulate feature loop shared by every
    coarse-kernel variant.

    All per-feature scalars are PRECOMPUTED on the XLA side into the SMEM
    meta (the kernel was partly scalar-issue bound: at K=1000/L1 the
    packed4 variant drops 1.9 -> ~1.0 ms with precomputed meta + deeper
    tree unroll). meta_ref rows (SMEM [group, R, N1], int32), per
    template in the group:

        0: idx — flat plane index into lm_ref's leading dim (copy-folded
           for preshifted variants: idx = (s % copies)*(C+1) + plane);
           slot [g, 0, N1-1] instead carries the LIVE feature count
        1: b   — sublane (row) roll amount, (rows - sw//128) % rows
        2: a   — lane roll amount, (128 - sw%128) % 128
        3: m   — select bound, 128 - sw%128 in [1, 128]
        4,5 (stitch only): byte shifts 8*(s%4), 8*(3 - s%4)

    Feature slots past the live count (bank padding + meta column padding
    to an unroll multiple) index an all-zero plane with b=a=0, m=128, so
    the loop runs ceil(count/unroll) full tree-unrolled blocks — no
    serial tail, no masking. `group` templates are scored per grid
    program (amortizes per-program output DMA / bookkeeping — measured
    ~20% at K=1000; padded K rows carry count 0 and cost nothing).

    A feature contributes plane<<s (flat left-shift by s cells): rotate
    rows up, lanes left, and select the row-carry image (a STATIC roll of
    the rotated image — row and lane rotates commute) past the lane wrap.
    `widen` converts the u8 plane to i32 before rolling (Mosaic dynamic
    rotates need 32-bit lanes); `stitch` reassembles a byte-phase-shifted
    word from the rolled word pair (packed layout without preshifted
    copies, see _coarse_similarity_pallas).

    `counted=(unit, M)` adds the per-template threshold-count epilogue
    of the chain kernel (see _make_chain_kernel): count the finished
    tile's cells with `j < pos AND cell >= rmin` (thr SMEM input
    [group, 2]) into [128] lane partials (cnt VMEM output [group, 128];
    the lane sum is a tiny XLA pass). Replaces the XLA count pass over
    the whole words array in extract_candidates_words."""

    def kernel(meta_ref, *refs):
        if counted:
            unit_c, _M_true = counted
            thr_ref, lm_ref, out_ref, cnt_ref = refs
        else:
            lm_ref, out_ref = refs
        rows = lm_ref.shape[1]
        lanes = lm_ref.shape[2]

        col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        if counted:
            bits_c = 32 // unit_c
            vmask_c = (1 << bits_c) - 1
            row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
            jbase = (row_i * lanes + col) * unit_c

        for g in range(group):
            n_feats = meta_ref[g, 0, meta_ref.shape[2] - 1]

            def one(n, g=g):
                idx = meta_ref[g, 0, n]
                b = meta_ref[g, 1, n]
                a = meta_ref[g, 2, n]
                m = meta_ref[g, 3, n]
                p = lm_ref[idx]
                if widen:
                    p = p.astype(jnp.int32)
                x = pltpu.roll(p, b, axis=0)
                l = pltpu.roll(x, a, axis=1)
                l1 = pltpu.roll(l, rows - 1, axis=0)
                w1 = jnp.where(col < m, l, l1)
                if not stitch:
                    return w1
                sh1 = meta_ref[g, 4, n]
                sh2 = meta_ref[g, 5, n]
                # W2 = flat roll of W1 by one more word; the double left
                # shift keeps both amounts < 32 so byte phase 0
                # degenerates to W1|0.
                y = pltpu.roll(w1, lanes - 1, axis=1)
                y1 = pltpu.roll(y, rows - 1, axis=0)
                w2 = jnp.where(col < lanes - 1, y, y1)
                return (w1 >> sh1) | ((w2 << sh2) << 8)

            def body(i, acc, one=one):
                # pairwise tree keeps the add dependency chain at
                # log2(unroll) instead of unroll (integer adds: bit-exact
                # either way); _unroll_for can return non-powers-of-2
                # (e.g. 6 at rows=40), so odd levels carry their tail
                base = i * unroll
                vals = [one(base + u) for u in range(unroll)]
                while len(vals) > 1:
                    nxt = [vals[v] + vals[v + 1]
                           for v in range(0, len(vals) - 1, 2)]
                    if len(vals) % 2:
                        nxt.append(vals[-1])
                    vals = nxt
                return acc + vals[0]

            acc = jax.lax.fori_loop(
                0, (n_feats + unroll - 1) // unroll, body,
                jnp.zeros((rows, lanes), jnp.int32))
            out_ref[g] = acc
            if counted:
                pos = thr_ref[0, g, 0]
                rmin = thr_ref[0, g, 1]
                c = jnp.zeros((rows, lanes), jnp.int32)
                for s in range(unit_c):
                    v = (acc >> (bits_c * s)) & vmask_c
                    c += ((jbase < pos - s)
                          & (v >= rmin)).astype(jnp.int32)
                cnt_ref[0, g] = jnp.sum(c, axis=0)

    return kernel


_COARSE_GROUP = 2  # templates per grid program (see _make_rotate_kernel)


def _make_wide_kernel(unroll: int, PB: int, group: int = 1,
                      counted=None):
    """Wide-feature coarse kernel: u8 packed4 PHASES, u16 accumulators.

    The fork's marquee mode is up to 8191 features per template
    (README.md:45), scored with u16 accumulators in the reference
    (line2Dup.cpp:811,931). The packed2 route pays 2x the packed4
    per-feature roll cost (u16 cells halve the lanes AND double the word
    rows). This kernel restores the 4-cells-per-lane feature loop:
    features accumulate in u8 packed4 words for a PHASE of up to
    PB*unroll <= 63 features (byte sums <= 4*63 = 252 never overflow),
    then the phase total widens once into TWO i32 accumulators holding
    u16 halves — acc_e takes the even bytes (cells 4m, 4m+2), acc_o the
    odd (4m+1, 4m+3):

        acc_e += phase & 0x00FF00FF;  acc_o += (phase >> 8) & 0x00FF00FF

    Per-feature work is HALF the packed2 kernel's (same 5 rolls/select
    ops, half the word rows); the widening costs ~5 tile ops per <= 60
    features (~2%). Final u16 values are exact for nfeat <= 16383
    (4*16383 < 65536), which covers the 8191 cap with margin.

    Operands are EXACTLY the packed4 route's (byte-preshifted copies +
    _build_meta(unit=4, copies=4)): phases are fixed ranges of unroll
    blocks (PB per phase, PB*unroll <= 63), and the meta's existing
    column padding (zero-plane no-op slots) makes partial tail blocks
    exact — no reordering, no extra meta, no host planning.

    Output block: [group, 2, rows, 128] i32 — plane 0 = acc_e, 1 =
    acc_o; cell j of template g lives at plane e = j%4 & 1, word
    (row, lane) = divmod((j//4), 128), u16 half s = (j%4) >> 1, i.e.
    j = (row*128 + lane)*4 + 2*s + e (see extract_candidates_wide_*).

    `counted=(M,)` adds the in-register threshold-count epilogue
    (thr SMEM [1, group, 2] (pos, rmin) rows; cnt VMEM [1, group, 128]
    lane partials) — same contract as _make_rotate_kernel's."""
    EMASK = 0x00FF00FF  # plain int: a jnp scalar here would be a

    # captured constant, which pallas_call rejects

    def kernel(meta_ref, *refs):
        if counted:
            (M_true,) = counted
            thr_ref, lm_ref, out_ref, cnt_ref = refs
        else:
            lm_ref, out_ref = refs
        rows = lm_ref.shape[1]
        lanes = lm_ref.shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        if counted:
            row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
            jbase4 = (row_i * lanes + col) * 4

        for g in range(group):
            n_feats = meta_ref[g, 0, meta_ref.shape[2] - 1]
            nblk = (n_feats + unroll - 1) // unroll
            n_phases = (nblk + PB - 1) // PB

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

            def blk(i, a8, one=one):
                base = i * unroll
                vals = [one(base + u) for u in range(unroll)]
                while len(vals) > 1:
                    nxt = [vals[v] + vals[v + 1]
                           for v in range(0, len(vals) - 1, 2)]
                    if len(vals) % 2:
                        nxt.append(vals[-1])
                    vals = nxt
                return a8 + vals[0]

            def phase(ph, carry, blk=blk, nblk=nblk):
                acc_e, acc_o = carry
                b0 = ph * PB
                a8 = jax.lax.fori_loop(
                    b0, jnp.minimum(nblk, b0 + PB), blk,
                    jnp.zeros((rows, lanes), jnp.int32))
                return (acc_e + (a8 & EMASK),
                        acc_o + ((a8 >> 8) & EMASK))

            zz = jnp.zeros((rows, lanes), jnp.int32)
            acc_e, acc_o = jax.lax.fori_loop(0, n_phases, phase, (zz, zz))
            out_ref[g, 0] = acc_e
            out_ref[g, 1] = acc_o
            if counted:
                pos = thr_ref[0, g, 0]
                rmin = thr_ref[0, g, 1]
                c = jnp.zeros((rows, lanes), jnp.int32)
                for e, acc in ((0, acc_e), (1, acc_o)):
                    for s in range(2):
                        v = (acc >> (16 * s)) & 0xFFFF
                        c += ((jbase4 + (2 * s + e) < pos)
                              & (v >= rmin)).astype(jnp.int32)
                cnt_ref[0, g] = jnp.sum(c, axis=0)

    return kernel


def _extend_lm_planes(lm, M: int, M_pad: int, C: int):
    """[C, ., M] linear memories -> flat [C+1, M_pad] u8: each plane's
    pad carries the CONTINUATION bytes of the flat layout (head of the
    next plane — the exact bytes the reference's contiguous Mat holds
    there, see module docstring) and plane C is the all-zero plane for
    invalid/out-of-bounds features."""
    P = M_pad - M
    lm2 = lm.reshape(C, M)
    reps = -(-P // M)
    ext = jnp.concatenate([lm2, jnp.zeros((reps, M), jnp.uint8)], axis=0)
    cont = jnp.concatenate(
        [ext[i + 1:i + 1 + C] for i in range(reps)], axis=1)[:, :P]
    lm2 = jnp.concatenate([lm2, cont], axis=1)
    return jnp.concatenate([lm2, jnp.zeros((1, M_pad), jnp.uint8)], axis=0)


def _pack_copies(flat, C: int, unit: int, rows_w: int):
    """Byte-preshifted packed copies of the flat [C+1, M_pad] planes:
    copy r's words hold cells unit*w+r .. unit*w+r+unit-1, so a feature
    with cell shift s reads copy s%unit at word shift s//unit. unit=4
    packs u8 cells, unit=2 u16 cells; output [unit*(C+1), rows_w, 128]
    i32 word rows."""
    M_pad = flat.shape[1]
    flatp = jnp.concatenate(
        [flat, jnp.zeros((C + 1, unit), jnp.uint8)], axis=1)
    copies = jnp.stack([flatp[:, r:r + M_pad] for r in range(unit)])
    if unit == 4:
        return jax.lax.bitcast_convert_type(
            copies.reshape(4, C + 1, rows_w * 128, 4), jnp.int32
        ).reshape(4 * (C + 1), rows_w, 128)
    c32 = copies.astype(jnp.int32)
    return (c32[..., 0::2] | (c32[..., 1::2] << 16)).reshape(
        2 * (C + 1), rows_w, 128)


def _run_rotate_kernel(meta, lm_in, rows, kern_args, interpret,
                       vmem_mb=100, thr=None, counted=None):
    """Shared pallas_call for every coarse variant: pads K to a group
    multiple (pad rows carry count 0 -> zero kernel work) and scores
    _COARSE_GROUP templates per grid program.

    With `thr` ([K, 2] i32 (pos, rmin) rows) and `counted=(unit, M)`,
    the kernel also emits per-template [128] lane-partial threshold
    counts; returns (out[:K], cnt[:K])."""
    K, R, N = meta.shape
    G = min(_COARSE_GROUP, K)
    Kp = -(-K // G) * G
    meta = jnp.pad(meta, ((0, Kp - K), (0, 0), (0, 0)))
    in_specs = [
        pl.BlockSpec((G, R, N), lambda k: (k, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(lm_in.shape, lambda k: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((G, rows, 128), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Kp, rows, 128), jnp.int32)
    operands = [meta, lm_in]
    if counted is not None:
        # pad rows: rmin = 1<<30 never passes -> count 0 on the zero acc
        thr = jnp.concatenate(
            [thr, jnp.tile(jnp.asarray([[0, 1 << 30]], jnp.int32),
                           (Kp - K, 1))]) if Kp != K else thr
        # 3-D (programs, G, .) blocks: Mosaic wants the block's last two
        # dims to divide (8, 128) or equal the array's
        in_specs.insert(1, pl.BlockSpec((1, G, 2), lambda k: (k, 0, 0),
                                        memory_space=pltpu.SMEM))
        operands.insert(1, thr.reshape(Kp // G, G, 2))
        out_spec = [out_spec,
                    pl.BlockSpec((1, G, 128), lambda k: (k, 0, 0),
                                 memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((Kp // G, G, 128), jnp.int32)]
    res = pl.pallas_call(
        _make_rotate_kernel(*kern_args, group=G, counted=counted),
        grid=(Kp // G,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 2**20),
        interpret=interpret,
    )(*operands)
    if counted is not None:
        out, cnt = res
        return out[:K], cnt.reshape(Kp, 128)[:K]
    return res[:K]


def _unroll_for(rows: int, leaf_factor: int = 1) -> int:
    """Tree depth scaled to the plane tile size: deeper unrolls keep
    winning while the leaf working set stays within the vector register
    file (one (8, 128) i32 vreg per 8 rows; the stitch variant holds two
    live values per leaf). Measured on v5e at K=1000/L1 (rows=8):
    U4 1.47, U8 1.22, U16 1.08, U32 0.96 ms — but a 32-leaf tree of
    4-vreg tiles spills and REGRESSES (case1's packed2 at rows=32)."""
    vregs_per_leaf = max(1, rows // 8) * leaf_factor
    return max(4, min(32, 32 // vregs_per_leaf))


def _build_meta(plane, s, nf, *, unit, copies, C, rows, unroll,
                stitch=False):
    """Precompute the per-feature scalar rows for _make_rotate_kernel.

    plane/s: [K, N] plane ids (C = invalid/zero plane) and cell shifts;
    nf: [K] live counts; unit: LM cells per i32 lane (1/2/4); copies:
    preshifted copies folded into the plane axis; rows: word rows of a
    plane tile."""
    sw = s // unit
    r = s % unit
    q = sw // 128
    rem = sw % 128
    if copies > 1:
        idx = r * (C + 1) + plane
        zp = (copies - 1) * (C + 1) + C
    else:
        idx = plane
        zp = C
    rows_list = [idx,
                 jnp.remainder(rows - q, rows),
                 jnp.remainder(128 - rem, 128),
                 128 - rem]
    fills = [zp, 0, 0, 128]
    if stitch:
        rows_list += [8 * r, 8 * (unit - 1 - r)]
        fills += [0, 0]
    npad = (-plane.shape[1]) % unroll
    out = []
    for v, f in zip(rows_list, fills):
        v = jnp.concatenate(
            [v, jnp.full((v.shape[0], npad), f, v.dtype)], axis=1)
        tailc = nf[:, None] if not out else jnp.zeros_like(nf)[:, None]
        out.append(jnp.concatenate([v, tailc], axis=1))
    return jnp.stack(out, axis=1).astype(jnp.int32)


def coarse_similarity_pallas(lm: jnp.ndarray, bank: LevelBank, T: int,
                             size_wh, interpret: bool | None = None,
                             mask_positions: bool = True,
                             raw_cells: bool = False):
    """Non-jitted shim: resolves `interpret` (None -> env flag) OUTSIDE
    jit so the flag is a true static argument, then delegates."""
    return _coarse_similarity_pallas(lm, bank, T, size_wh,
                                     _resolve_interpret(interpret),
                                     mask_positions, raw_cells)


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "interpret",
                                             "mask_positions", "raw_cells"))
def _coarse_similarity_pallas(lm: jnp.ndarray, bank: LevelBank, T: int,
                              size_wh, interpret: bool,
                              mask_positions: bool = True,
                              raw_cells: bool = False):
    """Drop-in replacement for ops.similarity.coarse_similarity.

    `lm` is the [8, T*T, M] linear-memory stack from
    ops.response.build_linear_memories (NOT the flat+padded form the XLA
    path takes).

    raw_cells=True skips the i32 unpack and positions mask: returns the
    kernel's native cells [K, M_pad] (u8 packed4 / u16 packed2 / i32
    unpacked; pad cells past M are garbage) for
    extract_candidates_cells — the [K, M] i32 map never touches HBM.
    """
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    n_ori = int(lm.shape[0])
    C = n_ori * T * T

    # Pad each plane to an (8 sublanes × 128 lanes) tile multiple (dynamic
    # rotates need aligned shapes). Consumed reads reach up to j + shift
    # <= M + W (see module docstring), so pad by AT LEAST max(W, 1) extra
    # cells and fill the pad of plane p with the head of plane p+1 — the
    # exact bytes the reference's contiguous linear-memory Mat holds there.
    # Packed mode: 4 LM bytes per i32 lane (stitch variant of
    # _make_rotate_kernel; preshifted copies when VMEM allows).
    # Exact iff no byte sum can overflow: max_response * slot_count <= 255
    # (N bounds nfeat, so the gate is static). Padding granularity rises to
    # 4096 so the packed word grid keeps 8-aligned sublanes (Mosaic's
    # dynamic rotate requires it).
    N_slots = int(bank.fx.shape[1])
    max_resp = 4  # both LUTs top out at 4 (16-ori: line2Dup_16bit_ori.cpp:575)
    packed = N_slots * max_resp <= 255
    packed2 = (not packed) and N_slots * max_resp <= 65535
    gran = 4096 if (packed or packed2) else 1024
    M_pad = -(-(M + max(W, 1)) // gran) * gran
    rows = M_pad // 128
    P = M_pad - M
    lm2 = lm.reshape(C, M)
    reps = -(-P // M)  # following planes needed to fill P continuation cells
    ext = jnp.concatenate([lm2, jnp.zeros((reps, M), jnp.uint8)], axis=0)
    cont = jnp.concatenate(
        [ext[i + 1:i + 1 + C] for i in range(reps)], axis=1)[:, :P]
    lm2 = jnp.concatenate([lm2, cont], axis=1)
    lm3 = lm2.reshape(C, rows, 128)
    # plane C is all-zero: invalid/out-of-bounds features land there.
    lm3 = jnp.concatenate([lm3, jnp.zeros((1, rows, 128), jnp.uint8)],
                          axis=0)

    inb = (
        bank.valid
        & (bank.fx >= 0) & (bank.fx < w_img)
        & (bank.fy >= 0) & (bank.fy < h_img)
    )
    plane = bank.label * (T * T) + (bank.fy % T) * T + (bank.fx % T)
    plane = jnp.where(inb, plane, C)
    shift = jnp.where(inb, (bank.fy // T) * W + bank.fx // T, 0)
    # live feature count: pack_level_bank's valid flags are a prefix, so
    # looping n < nfeat covers every live slot; carried in the meta's last
    # column (see _build_meta / _make_rotate_kernel).
    nf = jnp.where(bank.valid.any(axis=1), bank.nfeat, 0).astype(jnp.int32)

    K = plane.shape[0]
    if packed:
        rows_w = M_pad // 512
        # byte-preshifted copies whenever they fit VMEM (with headroom for
        # vmap double-buffering): copy r's words hold bytes 4w+r..4w+r+3,
        # halving the issue-bound kernel's per-feature op count
        use4 = 4 * (C + 1) * M_pad <= 36 * 2**20
        if use4:
            lm4 = _pack_copies(lm3.reshape(C + 1, M_pad), C, 4, rows_w)
            unroll = _unroll_for(rows_w)
            meta = _build_meta(plane, shift, nf, unit=4, copies=4, C=C,
                               rows=rows_w, unroll=unroll)
            Sp = _run_rotate_kernel(meta, lm4, rows_w, (unroll,),
                                    interpret)
        else:
            lm3p = jax.lax.bitcast_convert_type(
                lm3.reshape(C + 1, rows_w * 128, 4), jnp.int32
            ).reshape(C + 1, rows_w, 128)
            unroll = _unroll_for(rows_w, leaf_factor=2)
            meta = _build_meta(plane, shift, nf, unit=4, copies=1, C=C,
                               rows=rows_w, unroll=unroll, stitch=True)
            Sp = _run_rotate_kernel(meta, lm3p, rows_w,
                                    (unroll, False, True), interpret,
                                    vmem_mb=64)
        if raw_cells:
            return (jax.lax.bitcast_convert_type(Sp, jnp.uint8)
                    .reshape(K, M_pad), _positions(bank, T, W, H))
        # unpack bytes -> cells; widen once so downstream integer
        # arithmetic (score * 100) cannot overflow a u8.
        S = jax.lax.bitcast_convert_type(Sp, jnp.uint8).reshape(
            K, M_pad)[:, :M].astype(jnp.int32)
    elif packed2 and 4 * (C + 1) * M_pad <= 36 * 2**20:
        rows_w2 = M_pad // 256
        lmw = _pack_copies(lm3.reshape(C + 1, M_pad), C, 2, rows_w2)
        unroll = _unroll_for(rows_w2)
        meta = _build_meta(plane, shift, nf, unit=2, copies=2, C=C,
                           rows=rows_w2, unroll=unroll)
        Sp = _run_rotate_kernel(meta, lmw, rows_w2, (unroll,), interpret)
        if raw_cells:
            # little-endian bitcast i32 -> [lo, hi] u16 pairs == cell order
            return (jax.lax.bitcast_convert_type(Sp, jnp.uint16)
                    .reshape(K, M_pad), _positions(bank, T, W, H))
        lo = Sp & 0xFFFF
        hi = (Sp >> 16) & 0xFFFF
        S = jnp.stack([lo, hi], axis=-1).reshape(K, M_pad)[:, :M]
    else:
        unroll = _unroll_for(rows)
        meta = _build_meta(plane, shift, nf, unit=1, copies=1, C=C,
                           rows=rows, unroll=unroll)
        # Under vmap (frame-batched match) the LM block index varies
        # with the prepended batch grid dim, so Pallas double-buffers
        # the LM block; at T=4 that is 2 x 8.6 MB and busts the
        # default 16 MB scoped-vmem limit. v5e/v6 have 128 MB VMEM.
        S = _run_rotate_kernel(meta, lm3, rows, (unroll, True), interpret,
                               vmem_mb=64)
        if raw_cells:
            return S.reshape(K, M_pad), _positions(bank, T, W, H)
        S = S.reshape(K, M_pad)[:, :M]
    positions = _positions(bank, T, W, H)
    if mask_positions:
        j = jnp.arange(M, dtype=jnp.int32)[None, :]
        S = jnp.where(j < positions[:, None], S, 0)
    return S, positions


def _positions(bank: LevelBank, T: int, W: int, H: int) -> jnp.ndarray:
    """Valid template positions per template (line2Dup.cpp:816-825)."""
    wf = (bank.width - 1) // T + 1
    hf = (bank.height - 1) // T + 1
    return (H - hf) * W + (W - wf) + 1


# ---------------------------------------------------------------------------
# Delta-encoded chain scoring (dense banks) — see ops/pallas/chain_plan.py
# ---------------------------------------------------------------------------


def _make_chain_kernel(U: int, S: int, counted=None):
    """Chained rotate-accumulate: U python-unrolled sub-steps of S slot
    bodies each. Per sub-step: tree-sum the S signed contributions,
    accumulate into (or reset, keep=0) the running tile, store the tile
    to this sub-step's output row. Signed contributions are word-level
    negations — exact for packed byte/u16 lanes because integer tile
    sums are order-independent and the FINAL per-lane values are the
    same bounded responses the plain kernel produces.

    `counted=(unit, M)` adds the threshold-count epilogue: on each
    template's FINAL sub-step (the last store to its output row), count
    the finished tile's passing cells — `j < pos AND cell >= rmin` with
    (pos, rmin) read from an SMEM thr input [1, u_out, 2] — and store
    the scalar to an SMEM count output [1, u_out]. The quirk term
    (negative thresholds pass cells in [pos, M)) is pure arithmetic in
    (pos, M) and is added on the XLA side, so the kernel never needs it.
    Counting here reads the tile from registers; the XLA-side count
    pass it replaces re-reads the whole [R, rows, 128] words array from
    HBM and measured ~1.9 ms at K=10k (tools/exp_chain_cost.py W1)."""

    def kernel(meta_ref, *refs):
        if counted:
            unit, M_true = counted
            thr_ref, lm_ref, out_ref, cnt_ref = refs
        else:
            lm_ref, out_ref = refs
        rows = lm_ref.shape[1]
        lanes = lm_ref.shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        if counted:
            bits = 32 // unit
            vmask = (1 << bits) - 1
            row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
            jbase = (row_i * lanes + col) * unit
        acc = jnp.zeros((rows, lanes), jnp.int32)
        for u in range(U):
            keep = meta_ref[0, 5, u, 0]
            vals = []
            for sl in range(S):
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
                nxt = [vals[v] + vals[v + 1]
                       for v in range(0, len(vals) - 1, 2)]
                if len(vals) % 2:
                    nxt.append(vals[-1])
                vals = nxt
            acc = acc * keep + vals[0]
            # COMPACT store: every sub-step writes the running tile to
            # its template's own output row (meta row 6); later
            # sub-steps of the same template overwrite earlier ones, so
            # the final value at that row is the finished tile. Output
            # is [u_out = max templates/program] rows, not [U] sub-step
            # rows — ~2x less output DMA + extraction scan on dense
            # 2-sub-step banks.
            loc = meta_ref[0, 6, u, 0]
            out_ref[0, loc] = acc
            if counted:
                # a sub-step is its template's last iff the next
                # sub-step stores to a different row (emit rows are
                # strictly increasing; trailing no-ops re-store the last
                # row, so only the final one triggers at u == U-1)
                def _epilogue(acc=acc, loc=loc):
                    pos = thr_ref[0, loc, 0]
                    rmin = thr_ref[0, loc, 1]
                    c = jnp.zeros((rows, lanes), jnp.int32)
                    for s in range(unit):
                        v = (acc >> (bits * s)) & vmask
                        c += ((jbase < pos - s)
                              & (v >= rmin)).astype(jnp.int32)
                    # sublane-only reduce + vector store: a full scalar
                    # reduce + SMEM scalar store here measured ~200 ns
                    # PER TEMPLATE (~2 ms at K=10k — it cancelled the
                    # whole XLA count-pass saving); the lane sum of the
                    # [128] partials is a tiny XLA pass instead
                    cnt_ref[0, loc] = jnp.sum(c, axis=0)

                if u == U - 1:
                    _epilogue()
                else:
                    pl.when(meta_ref[0, 6, u + 1, 0] != loc)(_epilogue)

    return kernel


def coarse_words_pallas(lm: jnp.ndarray, bank: LevelBank, T: int,
                        size_wh, interpret: bool | None = None):
    """Packed coarse scores as NATIVE i32 word tiles.

    Returns (words [K, rows_w, 128] i32, positions, unit) where unit is
    cells per word (4 = u8 cells, 2 = u16) — the exact kernel output
    extract_candidates_words consumes without any layout-crossing
    bitcast/reshape. Returns None when the bank doesn't take a packed
    kernel (too many features, or the preshifted copies bust VMEM);
    callers fall back to the cells route."""
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    n_ori = int(lm.shape[0])
    C = n_ori * T * T
    N_slots = int(bank.fx.shape[1])
    max_resp = 4
    M_pad = -(-(M + max(W, 1)) // 4096) * 4096
    fits = 4 * (C + 1) * M_pad <= 36 * 2**20
    if N_slots * max_resp <= 255 and fits:
        unit = 4
    elif N_slots * max_resp <= 65535 and fits:
        unit = 2
    else:
        return None
    words, positions = _coarse_words_pallas(lm, bank, T, size_wh, unit,
                                            _resolve_interpret(interpret))
    return words, positions, unit


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "unit",
                                             "interpret"))
def _coarse_words_pallas(lm, bank: LevelBank, T: int, size_wh, unit: int,
                         interpret: bool):
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    n_ori = int(lm.shape[0])
    C = n_ori * T * T
    M_pad = -(-(M + max(W, 1)) // 4096) * 4096
    rows_w = M_pad // (128 * unit)
    flat = _extend_lm_planes(lm, M, M_pad, C)
    lmp = _pack_copies(flat, C, unit, rows_w)

    inb = (bank.valid
           & (bank.fx >= 0) & (bank.fx < w_img)
           & (bank.fy >= 0) & (bank.fy < h_img))
    plane = bank.label * (T * T) + (bank.fy % T) * T + (bank.fx % T)
    plane = jnp.where(inb, plane, C)
    shift = jnp.where(inb, (bank.fy // T) * W + bank.fx // T, 0)
    nf = jnp.where(bank.valid.any(axis=1), bank.nfeat, 0).astype(jnp.int32)
    unroll = _unroll_for(rows_w)
    meta = _build_meta(plane, shift, nf, unit=unit, copies=unit, C=C,
                       rows=rows_w, unroll=unroll)
    Sp = _run_rotate_kernel(meta, lmp, rows_w, (unroll,), interpret)
    return Sp, _positions(bank, T, W, H)


def coarse_words_pallas_counted(lm: jnp.ndarray, bank: LevelBank, T: int,
                                size_wh, rmin: jnp.ndarray,
                                interpret: bool | None = None):
    """coarse_words_pallas + the in-kernel threshold-count epilogue.

    Returns (words [K, rows_w, 128] i32, kcnt [K] i32 live-pass counts,
    positions, unit) or None when the bank doesn't take a packed
    kernel. Feed to ops.similarity.extract_candidates_chain_counted
    with emit=arange(K) — the full-words XLA compare pass disappears
    (same mechanics as the chain route's counted extraction)."""
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    n_ori = int(lm.shape[0])
    C = n_ori * T * T
    N_slots = int(bank.fx.shape[1])
    max_resp = 4
    M_pad = -(-(M + max(W, 1)) // 4096) * 4096
    fits = 4 * (C + 1) * M_pad <= 36 * 2**20
    if N_slots * max_resp <= 255 and fits:
        unit = 4
    elif N_slots * max_resp <= 65535 and fits:
        unit = 2
    else:
        return None
    words, kcnt, positions = _coarse_words_pallas_counted(
        lm, bank, T, size_wh, unit, rmin, _resolve_interpret(interpret))
    return words, kcnt, positions, unit


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "unit",
                                             "interpret"))
def _coarse_words_pallas_counted(lm, bank: LevelBank, T: int, size_wh,
                                 unit: int, rmin, interpret: bool):
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    n_ori = int(lm.shape[0])
    C = n_ori * T * T
    M_pad = -(-(M + max(W, 1)) // 4096) * 4096
    rows_w = M_pad // (128 * unit)
    flat = _extend_lm_planes(lm, M, M_pad, C)
    lmp = _pack_copies(flat, C, unit, rows_w)

    inb = (bank.valid
           & (bank.fx >= 0) & (bank.fx < w_img)
           & (bank.fy >= 0) & (bank.fy < h_img))
    plane = bank.label * (T * T) + (bank.fy % T) * T + (bank.fx % T)
    plane = jnp.where(inb, plane, C)
    shift = jnp.where(inb, (bank.fy // T) * W + bank.fx // T, 0)
    nf = jnp.where(bank.valid.any(axis=1), bank.nfeat, 0).astype(jnp.int32)
    unroll = _unroll_for(rows_w)
    meta = _build_meta(plane, shift, nf, unit=unit, copies=unit, C=C,
                       rows=rows_w, unroll=unroll)
    positions = _positions(bank, T, W, H)
    thr = jnp.stack([positions.astype(jnp.int32),
                     rmin.astype(jnp.int32)], axis=1)
    Sp, cnt = _run_rotate_kernel(meta, lmp, rows_w, (unroll,), interpret,
                                 thr=thr, counted=(unit, M))
    kcnt = jnp.sum(cnt, axis=1, dtype=jnp.int32)
    return Sp, kcnt, positions


def coarse_words_pallas_wide_counted(lm: jnp.ndarray, bank: LevelBank,
                                     T: int, size_wh, rmin: jnp.ndarray,
                                     interpret: bool | None = None):
    """Wide-feature (u16-range) coarse scores via the packed4-phase
    kernel (_make_wide_kernel) + in-kernel threshold counts.

    Engages for banks the packed2 route would take (64 <= N_slots <=
    16383 features) when the preshifted packed4 copies fit VMEM; per
    feature it does HALF the packed2 kernel's work. Returns
    (words [K, 2, rows_w, 128] i32 in the wide even/odd layout,
    kcnt [K] i32 live-pass counts, positions) or None when the config
    doesn't qualify. Feed to extract_candidates_wide_counted."""
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    n_ori = int(lm.shape[0])
    C = n_ori * T * T
    if os.environ.get("SBM_NO_WIDE", "") == "1":  # escape hatch
        return None
    N_slots = int(bank.fx.shape[1])
    max_resp = 4
    M_pad = -(-(M + max(W, 1)) // 4096) * 4096
    fits = 4 * (C + 1) * M_pad <= 36 * 2**20
    if not (255 < N_slots * max_resp <= 65535 and fits):
        return None
    words, kcnt, positions = _coarse_words_wide_counted(
        lm, bank, T, size_wh, rmin, _resolve_interpret(interpret))
    return words, kcnt, positions


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "interpret"))
def _coarse_words_wide_counted(lm, bank: LevelBank, T: int, size_wh,
                               rmin, interpret: bool):
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    n_ori = int(lm.shape[0])
    C = n_ori * T * T
    M_pad = -(-(M + max(W, 1)) // 4096) * 4096
    rows_w = M_pad // 512
    flat = _extend_lm_planes(lm, M, M_pad, C)
    lmp = _pack_copies(flat, C, 4, rows_w)

    inb = (bank.valid
           & (bank.fx >= 0) & (bank.fx < w_img)
           & (bank.fy >= 0) & (bank.fy < h_img))
    plane = bank.label * (T * T) + (bank.fy % T) * T + (bank.fx % T)
    plane = jnp.where(inb, plane, C)
    shift = jnp.where(inb, (bank.fy // T) * W + bank.fx // T, 0)
    nf = jnp.where(bank.valid.any(axis=1), bank.nfeat, 0).astype(jnp.int32)
    unroll = _unroll_for(rows_w)
    PB = 63 // unroll
    meta = _build_meta(plane, shift, nf, unit=4, copies=4, C=C,
                       rows=rows_w, unroll=unroll)
    positions = _positions(bank, T, W, H)
    thr = jnp.stack([positions.astype(jnp.int32),
                     rmin.astype(jnp.int32)], axis=1)

    K = meta.shape[0]
    G = min(_COARSE_GROUP, K)
    Kp = -(-K // G) * G
    meta = jnp.pad(meta, ((0, Kp - K), (0, 0), (0, 0)))
    thr = jnp.concatenate(
        [thr, jnp.tile(jnp.asarray([[0, 1 << 30]], jnp.int32),
                       (Kp - K, 1))]) if Kp != K else thr
    R, N1 = meta.shape[1], meta.shape[2]
    words, cnt = pl.pallas_call(
        _make_wide_kernel(unroll, PB, group=G, counted=(M,)),
        grid=(Kp // G,),
        in_specs=[
            pl.BlockSpec((G, R, N1), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, 2), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(lmp.shape, lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, 2, rows_w, 128), lambda k: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 128), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Kp, 2, rows_w, 128), jnp.int32),
            jax.ShapeDtypeStruct((Kp // G, G, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(meta, thr.reshape(Kp // G, G, 2), lmp)
    kcnt = jnp.sum(cnt.reshape(Kp, 128)[:K], axis=1, dtype=jnp.int32)
    return words[:K], kcnt, positions


def chain_coarse_word_rows(lm: jnp.ndarray, bank: LevelBank, plan, desc,
                           T: int, size_wh,
                           interpret: bool | None = None):
    """Chain kernel's RAW word tiles [P*u_out, rows, 128] i32 — one
    COMPACT row per template slot (plus per-program padding), no emit
    gather, no bitcast. Feed to extract_candidates_chain_words."""
    return _chain_word_rows(lm, bank, plan.meta, T, size_wh, desc,
                            _resolve_interpret(interpret))


def chain_coarse_word_rows_counted(lm: jnp.ndarray, bank: LevelBank,
                                   plan, desc, T: int, size_wh,
                                   rmin: jnp.ndarray,
                                   interpret: bool | None = None):
    """Chain kernel + in-kernel threshold-count epilogue.

    Returns (words [P*u_out, rows, 128] i32, cnt [P*u_out] i32,
    positions). cnt[emit[k]] is the EXACT number of template k's cells
    with `j < positions[k] AND cell >= rmin[k]` (the live-pass count;
    the negative-threshold quirk term is pure arithmetic the caller
    adds); rows never stored by any sub-step hold garbage counts —
    callers mask by emit. Feed to
    ops.similarity.extract_candidates_chain_counted, which skips the
    full-words compare pass entirely (~1.9 ms at K=10k on v5e)."""
    return _chain_word_rows_counted(lm, bank, plan.meta, plan.emit, T,
                                    size_wh, desc, rmin,
                                    _resolve_interpret(interpret))


def chain_coarse_cells(lm: jnp.ndarray, bank: LevelBank, plan, desc,
                       T: int, size_wh, interpret: bool | None = None):
    """Chain-scored raw cells (the coarse_cells_dispatch fast path for
    dense banks): returns (cells [K, m_pad] u8/u16 native dtype,
    positions) — bit-identical to coarse_similarity_pallas(...,
    raw_cells=True) for the same bank."""
    return _chain_coarse_cells(lm, bank, plan, T, size_wh, desc,
                               _resolve_interpret(interpret))


def chain_coarse_rows(lm: jnp.ndarray, bank: LevelBank, plan, desc,
                      T: int, size_wh, interpret: bool | None = None):
    """Chain-scored RAW sub-step rows — no emit gather.

    Returns (rows_cells [P*U, m_pad] u8/u16 native dtype, positions).
    Row plan.emit[k] holds template k's cells, bit-identical to
    chain_coarse_cells; other rows are chain intermediates / padding.
    Feed to ops.similarity.extract_candidates_chain, which consumes the
    rows directly with a row->template inverse of emit — at K=10k the
    emit gather materializes ~2x the cell bytes and measured +2.6 ms
    on v5e (tools/exp_chain_cost.py), all of it skippable."""
    return _chain_coarse_rows(lm, bank, plan.meta, T, size_wh, desc,
                              _resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "desc",
                                             "interpret"))
def _chain_word_rows(lm, bank, plan_meta, T: int, size_wh, desc,
                     interpret: bool):
    from .chain_plan import CHAIN_S, CHAIN_U

    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    C = desc.n_ori * T * T
    flat = _extend_lm_planes(lm, M, desc.m_pad, C)
    lmp = _pack_copies(flat, C, desc.unit, desc.rows)
    P = desc.n_programs
    out = pl.pallas_call(
        _make_chain_kernel(CHAIN_U, CHAIN_S),
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, 7, CHAIN_U, CHAIN_S),
                         lambda k: (k, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(lmp.shape, lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, desc.u_out, desc.rows, 128),
                               lambda k: (k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, desc.u_out, desc.rows, 128),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(plan_meta, lmp)
    return (out.reshape(P * desc.u_out, desc.rows, 128),
            _positions(bank, T, W, H))


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "desc",
                                             "interpret"))
def _chain_word_rows_counted(lm, bank, plan_meta, emit, T: int, size_wh,
                             desc, rmin, interpret: bool):
    from .chain_plan import CHAIN_S, CHAIN_U

    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    C = desc.n_ori * T * T
    flat = _extend_lm_planes(lm, M, desc.m_pad, C)
    lmp = _pack_copies(flat, C, desc.unit, desc.rows)
    P = desc.n_programs
    positions = _positions(bank, T, W, H)
    # SMEM thr rows: (pos, rmin) at each template's output row; rows no
    # template stores to get zeros (their counts are garbage anyway —
    # callers mask by emit). Gather via the emit inverse, scatter-free
    # (see similarity._invert_emit).
    from ..similarity import _invert_emit

    K = positions.shape[0]
    row_tmpl, ref = _invert_emit(emit, P * desc.u_out, K)
    rt_safe = jnp.minimum(row_tmpl, K - 1)
    rows_pr = jnp.stack([positions.astype(jnp.int32),
                         rmin.astype(jnp.int32)], axis=1)[rt_safe]
    thr = jnp.where(ref[:, None], rows_pr, 0).reshape(P, desc.u_out, 2)
    words, cnt = pl.pallas_call(
        _make_chain_kernel(CHAIN_U, CHAIN_S, counted=(desc.unit, M)),
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, 7, CHAIN_U, CHAIN_S),
                         lambda k: (k, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, desc.u_out, 2), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(lmp.shape, lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, desc.u_out, desc.rows, 128),
                         lambda k: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # per-template [128] lane-partial counts (the kernel only
            # reduces sublanes; Mosaic: block last two dims (u_out, 128)
            # equal/divide the array's)
            pl.BlockSpec((1, desc.u_out, 128), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, desc.u_out, desc.rows, 128),
                                 jnp.int32),
            jax.ShapeDtypeStruct((P, desc.u_out, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(plan_meta, thr, lmp)
    kcnt = jnp.sum(cnt.reshape(P * desc.u_out, 128), axis=1,
                   dtype=jnp.int32)
    return (words.reshape(P * desc.u_out, desc.rows, 128), kcnt,
            positions)


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "desc",
                                             "interpret"))
def _chain_coarse_rows(lm, bank, plan_meta, T: int, size_wh, desc,
                       interpret: bool):
    out, positions = _chain_word_rows(lm, bank, plan_meta, T, size_wh,
                                      desc, interpret)
    cell_dtype = jnp.uint8 if desc.unit == 4 else jnp.uint16
    rows_cells = jax.lax.bitcast_convert_type(out, cell_dtype).reshape(
        out.shape[0], desc.m_pad)
    return rows_cells, positions


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "desc",
                                             "interpret"))
def _chain_coarse_cells(lm, bank, plan, T: int, size_wh, desc,
                        interpret: bool):
    rows_cells, positions = _chain_coarse_rows(lm, bank, plan.meta, T,
                                               size_wh, desc, interpret)
    return rows_cells[plan.emit], positions
