"""Pallas TPU kernel: windowed candidate refinement (local similarity).

The reference refines each coarse candidate with a 16x16 local similarity
around the doubled position (line2Dup.cpp:1221-1293: border clamp, 16x16
similarity_local at line2Dup.cpp:860-922, strict-> argmax, threshold). The
repo's XLA fast path materializes FULL fine-level score maps for the
distinct candidate templates (coarse kernel over [D, M]) and then gathers
the windows — for a 1024^2 frame that scores 65536 positions per template
to read 256 of them, and the [C,16,16] gather itself lowers to slow
scalar loads on TPU. Measured (B=8, 360 templates): 8.2 ms map scoring +
9.5 ms window gather ~= 80% of the whole match step.

TPU-native formulation: compute ONLY the windows, straight from the
linear memories. A feature's contribution to window cell (rr, cc) is one
byte of the flat LM buffer:

    patch[rr, cc] = sum_n  LMflat[plane_n*M + (wy+dy_n+rr)*W + wx+dx_n+cc]

i.e. per feature a 16x16 block of the [C*H, W] byte image at row
plane_n*H + wy + dy_n, col wx + dx_n — ONE dynamic 2D slice from a
VMEM-resident buffer (~9 MB at T=4, 1024^2). Work is O(candidates) not
O(templates x M): ~16k slice+adds per frame vs ~260 MB of full-map
rotates.

Flat-layout parity (the coarse kernel's module docstring has the full
story): column overflow wx+dx+cc >= W must read the NEXT row's head —
the buffer carries 16 continuation columns (the row below, shifted up
one) so every such read sees the exact flat byte. Features can also read
up to W past the last plane (fx == width when T | width); 16 appended
zero rows reproduce the flat buffer's M-byte zero pad. Invalid / rotated
off-image features are routed to those zero rows (refine_candidates
semantics, which the C++'s in-image features never trigger).

Grid is (Ccand / 8,) — 8 candidates per program (a 1-candidate grid is
per-program-DMA-bound); each program accumulates its candidates' [16, 16]
i32 patches over their live features (SMEM meta carries per-feature
row/col and the live count — padded candidate slots cost nothing, and
skip_invalid=True zeroes the count for valid=False slots). The argmax /
score epilogue runs in XLA on the [Ccand, 256] result.
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


_WINDOW_GROUP = 8  # candidates per grid program (amortizes per-program
                   # SMEM/output DMAs — a 1-candidate grid is DMA-bound)


def _window_kernel(meta_ref, ext_ref, out_ref):
    """meta_ref: SMEM [1, G, 2, N+1] (rows, cols; slot [., ., 0, N] = live
    feature count). ext_ref: VMEM [R, Wext] u8 flat-layout byte image with
    continuation columns + zero rows. out_ref: VMEM [1, G, 16, 16] i32.

    Mosaic only allows (8, 128)-aligned dynamic VMEM slices, so each
    feature loads an aligned (24, 256) slab covering its window
    (row phase dr <= 7 -> rows dr..dr+15 <= 22; lane phase dc <= 127 ->
    cols dc..dc+15 <= 142) and extracts the (16, 16) with one dynamic
    sublane roll plus the lane-rotate/carry-select dance of the coarse
    kernel (dynamic lane rotates are legal on exactly-128 lanes)."""
    G = meta_ref.shape[1]
    col16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)

    def one(g, n):
        r0 = meta_ref[0, g, 0, n]
        c0 = meta_ref[0, g, 1, n]
        dr = r0 % 8
        dc = c0 % 128
        # written as (x // k) * k so Mosaic can prove alignment
        slab = ext_ref[pl.ds((r0 // 8) * 8, 24),
                       pl.ds((c0 // 128) * 128, 256)].astype(jnp.int32)
        a = pltpu.roll(slab[:, :128], jax.lax.rem(24 - dr, 24), axis=0)
        b = pltpu.roll(slab[:, 128:], jax.lax.rem(24 - dr, 24), axis=0)
        ar = pltpu.roll(a, jax.lax.rem(128 - dc, 128), axis=1)
        br = pltpu.roll(b, jax.lax.rem(128 - dc, 128), axis=1)
        return jnp.where(col16 < 128 - dc, ar[:16, :16], br[:16, :16])

    # Feature slices are latency-bound; unrolling overlaps them.
    UNROLL = 8

    for g in range(G):
        n_feats = meta_ref[0, g, 0, meta_ref.shape[3] - 1]

        def body(i, acc, g=g):
            # pairwise tree: add chain log2(UNROLL) deep (bit-exact)
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


def _map_window_kernel(meta_ref, ext_ref, out_ref):
    """Extract one 16x16 window per candidate from fine score maps.

    meta_ref: SMEM [1, 1, 2] (row, col of the window origin in the
    extended map image). ext_ref: VMEM [R, Wext] i32 — the [D, M] score maps as a
    [D*H, W] image with 16 continuation columns (flat row wrap) and 16
    zero rows. out_ref: VMEM [1, 16, 16] i32. Same aligned-slab dance as
    _window_kernel, one slab per candidate."""
    r0 = meta_ref[0, 0, 0]
    c0 = meta_ref[0, 0, 1]
    dr = r0 % 8
    dc = c0 % 128
    slab = ext_ref[pl.ds((r0 // 8) * 8, 24), pl.ds((c0 // 128) * 128, 256)]
    a = pltpu.roll(slab[:, :128], jax.lax.rem(24 - dr, 24), axis=0)
    b = pltpu.roll(slab[:, 128:], jax.lax.rem(24 - dr, 24), axis=0)
    ar = pltpu.roll(a, jax.lax.rem(128 - dc, 128), axis=1)
    br = pltpu.roll(b, jax.lax.rem(128 - dc, 128), axis=1)
    col16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
    out_ref[0] = jnp.where(col16 < 128 - dc, ar[:16, :16], br[:16, :16])


def refine_from_maps_pallas(Sfull: jnp.ndarray, slot_of_k: jnp.ndarray,
                            bank: LevelBank, T: int, size_wh,
                            k: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                            valid: jnp.ndarray, threshold,
                            interpret: bool | None = None):
    """Non-jitted shim: resolves `interpret` OUTSIDE jit, then delegates."""
    return _refine_from_maps_pallas(Sfull, slot_of_k, bank, T, size_wh,
                                    k, x, y, valid, threshold,
                                    _resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "interpret"))
def _refine_from_maps_pallas(Sfull: jnp.ndarray, slot_of_k: jnp.ndarray,
                             bank: LevelBank, T: int, size_wh,
                             k: jnp.ndarray, x: jnp.ndarray,
                             y: jnp.ndarray, valid: jnp.ndarray, threshold,
                             interpret: bool = False):
    """Drop-in for ops.similarity.refine_from_maps — bit-identical — with
    the [C,16,16] window gather done by _map_window_kernel instead of an
    XLA flat gather (which lowers to ~65k serial scalar loads per frame,
    measured 1.2 ms vs ~0.01 ms here).

    Composed with the nfeat-aware packed coarse kernel over the distinct
    candidate templates this is the fast refinement path: full-map cost
    scales with the ACTUAL distinct-template count (~tens), and the
    extract is one slab per candidate.
    """
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    D = Sfull.shape[0]
    border = 8 * T
    offset = T // 2 + (T % 2 - 1)

    width_k = bank.width[k]
    height_k = bank.height[k]
    nfeat_k = bank.nfeat[k].astype(jnp.float32)
    max_x = w_img - width_k - border
    max_y = h_img - height_k - border
    cx = jnp.minimum(jnp.maximum(x * 2 + 1, border), max_x)
    cy = jnp.minimum(jnp.maximum(y * 2 + 1, border), max_y)

    wx = cx // T - 8
    wy = cy // T - 8
    slot = slot_of_k[k]
    valid = valid & (slot >= 0)
    r = jnp.maximum(slot, 0) * H + wy
    meta = jnp.stack([r, wx], axis=1).astype(jnp.int32)[:, None, :]  # [C,1,2]

    flat2d = Sfull.reshape(D * H, W)
    below = jnp.concatenate(
        [flat2d[1:], jnp.zeros((1, W), jnp.int32)], axis=0)
    ext = jnp.concatenate([flat2d, below[:, :16]], axis=1)
    w_pad = (((W + 14) // 128) + 2) * 128 - (W + 16)
    ext = jnp.pad(ext, ((0, 32), (0, w_pad)))

    Ccand = meta.shape[0]
    R, Wext = ext.shape
    patches = pl.pallas_call(
        _map_window_kernel,
        grid=(Ccand,),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R, Wext), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ccand, 16, 16), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(meta, ext)

    pf = patches.reshape(Ccand, 256)
    best = jnp.argmax(pf, axis=1).astype(jnp.int32)
    raw = jnp.take_along_axis(pf, best[:, None], axis=1)[:, 0]
    sim = raw.astype(jnp.float32) * 100.0 / (4.0 * nfeat_k)
    nx = (wx + best % 16) * T + offset
    ny = (wy + best // 16) * T + offset
    nvalid = valid & (sim >= threshold)
    return k, nx, ny, sim, nvalid


def map_refine_supported(size_wh, T: int, D: int,
                         budget_bytes: int = 40 * 2**20) -> bool:
    """ext (i32) must fit VMEM with vmap double-buffer headroom. Uses the
    kernel's ACTUAL padded footprint (lanes round up to the 128-aligned
    slab reach), not the logical W+16."""
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    w_ext = (((W + 14) // 128) + 2) * 128
    return 4 * (D * H + 32) * w_ext <= budget_bytes


# SMEM is ~1 MB/core and the window kernel's per-program meta block
# ([1, G, 2, n+1] i32) is double-buffered by Mosaic, so BOTH copies
# must fit (960 KB budget leaves margin for scalar spill): one call
# carries at most _WINDOW_MAX_SLOTS feature slots. Wider banks (the
# 8191-feature mode — which tripped Mosaic's smem allocator for four
# rounds) are feature-chunked across calls inside
# _refine_windows_pallas, so callers never need to gate on slot count.
_WINDOW_SMEM_BUDGET = 960 * 1024
_WINDOW_MAX_SLOTS = _WINDOW_SMEM_BUDGET // (2 * _WINDOW_GROUP * 2 * 4) - 1


def window_refine_supported(size_wh, T: int, n_ori: int = 8,
                            budget_bytes: int = 40 * 2**20) -> bool:
    """ext buffer must fit VMEM (with headroom for vmap double-buffering).
    Uses the kernel's ACTUAL padded footprint (32 appended rows, lanes
    rounded up to the 128-aligned slab reach). Feature-slot count never
    disqualifies: wide banks run feature-chunked (_WINDOW_MAX_SLOTS)."""
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    C = n_ori * T * T
    w_ext = (((W + 14) // 128) + 2) * 128
    return (C * H + 32) * w_ext <= budget_bytes


def refine_windows_pallas(lm: jnp.ndarray, bank: LevelBank, T: int, size_wh,
                          k: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                          valid: jnp.ndarray, threshold,
                          interpret: bool | None = None,
                          skip_invalid: bool = False):
    """Non-jitted shim: resolves `interpret` (None -> env flag) OUTSIDE
    jit, then delegates to the jitted implementation."""
    return _refine_windows_pallas(lm, bank, T, size_wh, k, x, y, valid,
                                  threshold, _resolve_interpret(interpret),
                                  skip_invalid)


@functools.partial(jax.jit,
                   static_argnames=("T", "size_wh", "interpret",
                                    "skip_invalid"))
def _refine_windows_pallas(lm: jnp.ndarray, bank: LevelBank, T: int,
                           size_wh, k: jnp.ndarray, x: jnp.ndarray,
                           y: jnp.ndarray, valid: jnp.ndarray, threshold,
                           interpret: bool = False,
                           skip_invalid: bool = False):
    """Drop-in replacement for one pyramid refinement level — exact
    (bit-identical) vs ops.similarity.refine_candidates for ALL banks,
    including pathological ones (templates wider than image - 16T).

    `lm` is the fine level's [n_ori, T*T, M] linear-memory stack; `k, x,
    y, valid` the candidate arrays in the coarser level's coordinates.
    Returns (k, nx, ny, sim, nvalid).

    `skip_invalid=True` spends no kernel work on valid=False candidate
    slots (their k/x/y/sim outputs become don't-care values, nvalid stays
    False) — candidate arrays are typically half padding, so the match
    paths use this; parity tests compare the exact default.
    """
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
    fx = bank.fx[k] + off_x[:, None]  # [Ccand, N] absolute pixels
    fy = bank.fy[k] + off_y[:, None]
    inb = (
        bank.valid[k]
        & (fx >= 0) & (fx < w_img) & (fy >= 0) & (fy < h_img)
    )
    plane = bank.label[k] * (T * T) + (fy % T) * T + (fx % T)
    r = jnp.where(inb, plane * H + fy // T, C * H)
    c = jnp.where(inb, fx // T, 0)
    if skip_invalid:
        nf = jnp.where(valid, bank.nfeat[k], 0).astype(jnp.int32)
    else:
        # invalid candidates are computed too so every output slot is
        # bit-identical to refine_candidates, not just the valid ones
        nf = bank.nfeat[k].astype(jnp.int32)

    # flat-layout byte image + 16 continuation columns, padded for the
    # kernel's aligned slab loads: rows to r0_max + 24 (the 16-row flat
    # zero pad is part of this), lanes to a 128 multiple covering
    # c0_aligned + 256.
    flat2d = lm.reshape(C * H, W)
    below = jnp.concatenate(
        [flat2d[1:], jnp.zeros((1, W), jnp.uint8)], axis=0)
    ext = jnp.concatenate([flat2d, below[:, :16]], axis=1)
    w_pad = (((W + 14) // 128) + 2) * 128 - (W + 16)
    ext = jnp.pad(ext, ((0, 32), (0, w_pad)))
    R, Wext = ext.shape

    Cc = r.shape[0]
    G = _WINDOW_GROUP
    Cp = -(-Cc // G) * G
    N = r.shape[1]
    zero_col = jnp.zeros_like(nf)[:, None]

    # The SMEM meta block [1, G, 2, n+1] is double-buffered by Mosaic,
    # capping one call at _WINDOW_MAX_SLOTS feature slots (the bound the
    # 8191-feature mode tripped for four rounds: "Allocation would
    # exceed memory", space=smem). Wider banks split the FEATURE axis
    # across calls — a chunk sees nf_c = clip(nf - s0, 0, chunk) live
    # leading rows, and the i32 patches sum EXACTLY across chunks
    # (per-candidate feature sums are associative), so the fast kernel
    # carries the wide mode too instead of falling back to XLA gathers.
    patches = None
    for s0 in range(0, N, _WINDOW_MAX_SLOTS):
        s1 = min(N, s0 + _WINDOW_MAX_SLOTS)
        nf_c = jnp.clip(nf - s0, 0, s1 - s0)
        rows = jnp.concatenate([r[:, s0:s1], nf_c[:, None]], axis=1)
        cols = jnp.concatenate([c[:, s0:s1], zero_col], axis=1)
        meta = jnp.stack([rows, cols], axis=1).astype(jnp.int32)
        meta = jnp.pad(meta, ((0, Cp - Cc), (0, 0), (0, 0)))
        meta = meta.reshape(Cp // G, G, 2, meta.shape[2])
        N1 = meta.shape[3]
        p = pl.pallas_call(
            _window_kernel,
            grid=(Cp // G,),
            in_specs=[
                pl.BlockSpec((1, G, 2, N1), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((R, Wext), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, 16, 16), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Cp // G, G, 16, 16),
                                           jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(meta, ext)
        patches = p if patches is None else patches + p

    pf = patches.reshape(Cp, 256)[:Cc]
    best = jnp.argmax(pf, axis=1).astype(jnp.int32)  # first max (C++ >)
    raw = jnp.take_along_axis(pf, best[:, None], axis=1)[:, 0]
    sim = raw.astype(jnp.float32) * 100.0 / (4.0 * nfeat_k)
    nx = (cx // T - 8 + best % 16) * T + offset
    ny = (cy // T - 8 + best // 16) * T + offset
    nvalid = valid & (sim >= threshold)
    return k, nx, ny, sim, nvalid
