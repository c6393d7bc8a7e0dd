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


def _coarse_kernel(meta_ref, lm_ref, out_ref):
    """meta_ref: SMEM [1, 2, N+1] (plane, flat shift s; plane==C if
    invalid). Slot [0, 0, N] carries the template's LIVE feature count —
    the loop runs only that far, so padded bank slots (count 0, e.g.
    gather_bank fill rows in capped distinct-template refinement) cost no
    rotates at all. lm_ref: VMEM [C+1, M/128, 128] u8 (planes in row-major
    flat layout, last plane zeros); out_ref: VMEM [1, M/128, 128] i32.

    A feature contributes plane<<s (flat left-shift by s): rotate rows up by
    s//128 (s//128+1 for the carry part), lanes left by s%128, and select on
    a lane iota. Lane dim is exactly 128 so dynamic rotates are legal.
    """
    n_feats = meta_ref[0, 0, meta_ref.shape[2] - 1]
    rows = lm_ref.shape[1]
    lanes = lm_ref.shape[2]

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)

    def one(n):
        plane = meta_ref[0, 0, n]
        s = meta_ref[0, 1, n]
        q = s // lanes
        r = s % lanes
        # dynamic rotate requires 32-bit lanes; widen the u8 plane first
        p = lm_ref[plane].astype(jnp.int32)  # leading dim is untiled
        a = pltpu.roll(p, jax.lax.rem(rows - q, rows), axis=0)
        l = pltpu.roll(a, jax.lax.rem(lanes - r, lanes), axis=1)
        # row and lane rotates commute: the carry image (rows shifted up by
        # one more) is a STATIC roll of l — 2 dynamic + 1 static rotate
        # instead of 4 dynamic.
        l1 = pltpu.roll(l, rows - 1, axis=0)
        return jnp.where(col < lanes - r, l, l1)

    # Unroll the feature loop: the per-feature dynamic rotates are
    # latency-bound, and independent features overlap (K=1000 coarse:
    # 4.6 ms rolled, 3.3 ms at x2, best at x8).
    UNROLL = 8
    def body(i, acc):
        base = i * UNROLL
        for u in range(UNROLL):
            acc = acc + one(base + u)
        return acc

    acc = jax.lax.fori_loop(
        0, n_feats // UNROLL, body, jnp.zeros((rows, lanes), jnp.int32))

    def tail(n, acc):
        return acc + one(n)

    acc = jax.lax.fori_loop((n_feats // UNROLL) * UNROLL, n_feats, tail, acc)
    out_ref[0] = acc


def _coarse_kernel_packed(meta_ref, lm_ref, out_ref):
    """Byte-packed variant: 4 consecutive LM cells per i32 lane.

    lm_ref: VMEM [C+1, rows_w, 128] i32, word at (r, c) = little-endian
    bytes 512r+4c .. +3 of the padded plane. A feature's flat byte shift s
    decomposes into a word shift s//4 (the same rotate dance as the
    unpacked kernel, on 4x smaller tiles) plus a byte offset s%4 stitched
    from the word pair (W1, W2=W1 shifted one more word):

        value = (W1 >> 8r) | ((W2 << 8*(3-r)) << 8)      [r = s % 4]

    (the double left shift keeps both amounts < 32 so r == 0 degenerates
    to W1 | 0). Accumulation stays packed: responses are <= 4 and the
    feature count <= 63, so every byte sum <= 252 — no carry ever crosses
    a byte boundary. The caller gates on that bound and unpacks the final
    [K, rows_w, 128] i32 via a bitcast. All byte movement is identical to
    the unpacked kernel, so results match the XLA path bit-for-bit.
    """
    n_feats = meta_ref[0, 0, meta_ref.shape[2] - 1]
    rows = lm_ref.shape[1]
    lanes = lm_ref.shape[2]

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)

    def one(n):
        plane = meta_ref[0, 0, n]
        s = meta_ref[0, 1, n]
        sw = s // 4
        r = s % 4
        q = sw // lanes
        rem = sw % lanes
        p = lm_ref[plane]
        a = pltpu.roll(p, jax.lax.rem(rows - q, rows), axis=0)
        l = pltpu.roll(a, jax.lax.rem(lanes - rem, lanes), axis=1)
        l1 = pltpu.roll(l, rows - 1, axis=0)
        w1 = jnp.where(col < lanes - rem, l, l1)
        # W2 = flat roll of W1 by one more word: lanes left by 1, with the
        # wrapped last lane taking the next row's first word.
        y = pltpu.roll(w1, lanes - 1, axis=1)
        y1 = pltpu.roll(y, rows - 1, axis=0)
        w2 = jnp.where(col < lanes - 1, y, y1)
        return (w1 >> (8 * r)) | ((w2 << (8 * (3 - r))) << 8)

    UNROLL = 8
    def body(i, acc):
        base = i * UNROLL
        for u in range(UNROLL):
            acc = acc + one(base + u)
        return acc

    acc = jax.lax.fori_loop(
        0, n_feats // UNROLL, body, jnp.zeros((rows, lanes), jnp.int32))

    def tail(n, acc):
        return acc + one(n)

    acc = jax.lax.fori_loop((n_feats // UNROLL) * UNROLL, n_feats, tail, acc)
    out_ref[0] = acc


def _coarse_kernel_packed4(meta_ref, lm_ref, out_ref):
    """Byte-preshifted variant of _coarse_kernel_packed: lm_ref is VMEM
    [4, C+1, rows_w, 128] i32 where copy r's word (w) holds plane bytes
    4w+r .. 4w+r+3. A feature's byte shift s then reduces to picking copy
    s%4 and word-rolling by s//4 — the W2 stitch (one extra flat roll +
    two shifts + or, ~half the kernel's issue slots) disappears. Byte
    movement is otherwise identical, so results still match the XLA path
    bit-for-bit; the coarse kernel is VPU issue-bound, so fewer ops is
    directly fewer cycles (measured 1.59 -> ~0.9 ms, K=1000 @ L1)."""
    n_feats = meta_ref[0, 0, meta_ref.shape[2] - 1]
    rows = lm_ref.shape[2]
    lanes = lm_ref.shape[3]

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)

    def one(n):
        plane = meta_ref[0, 0, n]
        s = meta_ref[0, 1, n]
        sw = s // 4
        r = s % 4
        q = sw // lanes
        rem = sw % lanes
        p = lm_ref[r, plane]
        a = pltpu.roll(p, jax.lax.rem(rows - q, rows), axis=0)
        l = pltpu.roll(a, jax.lax.rem(lanes - rem, lanes), axis=1)
        l1 = pltpu.roll(l, rows - 1, axis=0)
        return jnp.where(col < lanes - rem, l, l1)

    UNROLL = 8
    def body(i, acc):
        # pairwise tree keeps the add dependency chain at log2(UNROLL)
        # instead of UNROLL (integer adds: bit-exact either way)
        base = i * UNROLL
        vals = [one(base + u) for u in range(UNROLL)]
        while len(vals) > 1:
            vals = [vals[p] + vals[p + 1] for p in range(0, len(vals), 2)]
        return acc + vals[0]

    acc = jax.lax.fori_loop(
        0, n_feats // UNROLL, body, jnp.zeros((rows, lanes), jnp.int32))

    def tail(n, acc):
        return acc + one(n)

    acc = jax.lax.fori_loop((n_feats // UNROLL) * UNROLL, n_feats, tail, acc)
    out_ref[0] = acc


def coarse_similarity_pallas(lm: jnp.ndarray, bank: LevelBank, T: int,
                             size_wh, interpret: bool | None = None,
                             mask_positions: bool = True):
    """Non-jitted shim: resolves `interpret` (None -> env flag) OUTSIDE
    jit so the flag is a true static argument, then delegates."""
    return _coarse_similarity_pallas(lm, bank, T, size_wh,
                                     _resolve_interpret(interpret),
                                     mask_positions)


def _coarse_kernel_packed2(meta_ref, lm_ref, out_ref):
    """u16-packed variant for 64..16383-response banks: 2 LM cells per
    i32 lane (one per u16 half), two cell-preshifted copies — the wide
    (>63-feature, line2Dup.cpp:811 u16-accumulator) analog of
    _coarse_kernel_packed4. Copy r's word w holds cells 2w+r (low half)
    and 2w+r+1 (high half); a feature picks copy s%2 and word-rolls by
    s//2. Half-sums stay < 65536 (caller gates on N*max_resp), so no
    carry crosses the halves and results match the XLA path exactly."""
    n_feats = meta_ref[0, 0, meta_ref.shape[2] - 1]
    rows = lm_ref.shape[2]
    lanes = lm_ref.shape[3]

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)

    def one(n):
        plane = meta_ref[0, 0, n]
        s = meta_ref[0, 1, n]
        sw = s // 2
        r = s % 2
        q = sw // lanes
        rem = sw % lanes
        p = lm_ref[r, plane]
        a = pltpu.roll(p, jax.lax.rem(rows - q, rows), axis=0)
        l = pltpu.roll(a, jax.lax.rem(lanes - rem, lanes), axis=1)
        l1 = pltpu.roll(l, rows - 1, axis=0)
        return jnp.where(col < lanes - rem, l, l1)

    UNROLL = 8
    def body(i, acc):
        base = i * UNROLL
        for u in range(UNROLL):
            acc = acc + one(base + u)
        return acc

    acc = jax.lax.fori_loop(
        0, n_feats // UNROLL, body, jnp.zeros((rows, lanes), jnp.int32))

    def tail(n, acc):
        return acc + one(n)

    acc = jax.lax.fori_loop((n_feats // UNROLL) * UNROLL, n_feats, tail, acc)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "interpret",
                                             "mask_positions"))
def _coarse_similarity_pallas(lm: jnp.ndarray, bank: LevelBank, T: int,
                              size_wh, interpret: bool,
                              mask_positions: bool = True):
    """Drop-in replacement for ops.similarity.coarse_similarity.

    `lm` is the [8, T*T, M] linear-memory stack from
    ops.response.build_linear_memories (NOT the flat+padded form the XLA
    path takes).
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
    # Packed mode: 4 LM bytes per i32 lane (see _coarse_kernel_packed).
    # Exact iff no byte sum can overflow: max_response * slot_count <= 255
    # (N bounds nfeat, so the gate is static). Padding granularity rises to
    # 4096 so the packed word grid keeps 8-aligned sublanes (Mosaic's
    # dynamic rotate requires it).
    N_slots = int(bank.fx.shape[1])
    max_resp = 4 if n_ori == 8 else 8
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
    # looping n < nfeat covers every live slot; appended as meta's last
    # column (TPU SMEM blocks want the trailing dims whole).
    nf = jnp.where(bank.valid.any(axis=1), bank.nfeat, 0).astype(jnp.int32)
    plane = jnp.concatenate([plane, nf[:, None]], axis=1)
    shift = jnp.concatenate([shift, jnp.zeros_like(nf)[:, None]], axis=1)
    meta = jnp.stack([plane, shift], axis=1).astype(jnp.int32)  # [K,2,N+1]

    K, _, N = meta.shape
    if packed:
        rows_w = M_pad // 512
        # byte-preshifted copies whenever they fit VMEM (with headroom for
        # vmap double-buffering): copy r's words hold bytes 4w+r..4w+r+3,
        # halving the issue-bound kernel's per-feature op count
        use4 = 4 * (C + 1) * M_pad <= 36 * 2**20
        if use4:
            flatp = lm3.reshape(C + 1, M_pad)
            flatp = jnp.concatenate(
                [flatp, jnp.zeros((C + 1, 4), jnp.uint8)], axis=1)
            copies = jnp.stack([flatp[:, r:r + M_pad] for r in range(4)])
            lm4 = jax.lax.bitcast_convert_type(
                copies.reshape(4, C + 1, rows_w * 128, 4), jnp.int32
            ).reshape(4, C + 1, rows_w, 128)
            Sp = pl.pallas_call(
                _coarse_kernel_packed4,
                grid=(K,),
                in_specs=[
                    pl.BlockSpec((1, 2, N), lambda k: (k, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((4, C + 1, rows_w, 128),
                                 lambda k: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, rows_w, 128),
                                       lambda k: (k, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((K, rows_w, 128), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 2**20),
                interpret=interpret,
            )(meta, lm4)
        else:
            lm3p = jax.lax.bitcast_convert_type(
                lm3.reshape(C + 1, rows_w * 128, 4), jnp.int32
            ).reshape(C + 1, rows_w, 128)
            Sp = pl.pallas_call(
                _coarse_kernel_packed,
                grid=(K,),
                in_specs=[
                    pl.BlockSpec((1, 2, N), lambda k: (k, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((C + 1, rows_w, 128), lambda k: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, rows_w, 128),
                                       lambda k: (k, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((K, rows_w, 128), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 2**20),
                interpret=interpret,
            )(meta, lm3p)
        # unpack bytes -> cells; widen once so downstream integer
        # arithmetic (score * 100) cannot overflow a u8.
        S = jax.lax.bitcast_convert_type(Sp, jnp.uint8).reshape(
            K, M_pad)[:, :M].astype(jnp.int32)
    elif packed2 and 4 * (C + 1) * M_pad <= 36 * 2**20:
        rows_w2 = M_pad // 256
        flatp = lm3.reshape(C + 1, M_pad)
        flatp = jnp.concatenate(
            [flatp, jnp.zeros((C + 1, 2), jnp.uint8)], axis=1)
        copies = jnp.stack(
            [flatp[:, r:r + M_pad] for r in range(2)]).astype(jnp.int32)
        lmw = (copies[..., 0::2] | (copies[..., 1::2] << 16)).reshape(
            2, C + 1, rows_w2, 128)
        Sp = pl.pallas_call(
            _coarse_kernel_packed2,
            grid=(K,),
            in_specs=[
                pl.BlockSpec((1, 2, N), lambda k: (k, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((2, C + 1, rows_w2, 128),
                             lambda k: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows_w2, 128),
                                   lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, rows_w2, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(meta, lmw)
        lo = Sp & 0xFFFF
        hi = (Sp >> 16) & 0xFFFF
        S = jnp.stack([lo, hi], axis=-1).reshape(K, M_pad)[:, :M]
    else:
        S = pl.pallas_call(
            _coarse_kernel,
            grid=(K,),
            in_specs=[
                pl.BlockSpec((1, 2, N), lambda k: (k, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((C + 1, rows, 128), lambda k: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, 128), lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, rows, 128), jnp.int32),
            # Under vmap (frame-batched match) the LM block index varies
            # with the prepended batch grid dim, so Pallas double-buffers
            # the LM block; at T=4 that is 2 x 8.6 MB and busts the
            # default 16 MB scoped-vmem limit. v5e/v6 have 128 MB VMEM.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
            interpret=interpret,
        )(meta, lm3)
        S = S.reshape(K, M_pad)[:, :M]
    wf = (bank.width - 1) // T + 1
    hf = (bank.height - 1) // T + 1
    positions = (H - hf) * W + (W - wf) + 1
    if mask_positions:
        j = jnp.arange(M, dtype=jnp.int32)[None, :]
        S = jnp.where(j < positions[:, None], S, 0)
    return S, positions
