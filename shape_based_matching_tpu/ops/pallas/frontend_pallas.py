"""Pallas TPU kernel: fused LINE-2D frontend (blur -> sobel -> atan ->
vote-quantize -> spread) in one VMEM-resident program.

The XLA chain (ops/filters.py + ops/gradients.py + ops/response.spread)
costs ~1.5 ms per level at 1024² on a v5e — each stage is a separate
HBM-roundtrip pass over full-image f32/i32 buffers, ~50x the traffic bound
of the 1 MB uint8 image. Here the whole image lives in VMEM and every
stage is a register-to-register vector op; border handling (REPLICATE for
the filters, zero for the vote window) is done with static rolls + iota
selects instead of padding.

Semantics are bit-identical to the XLA path (same fixed-point blur
rounding, same fastAtan2 polynomial, same nibble-packed 3x3 vote, same
log-doubling spread — see ops/filters.py, ops/gradients.py:40-142,
ops/response.py:33-54 for the reference line2Dup.cpp anchors). The one
caveat shared with the XLA path: f32 divide rounding inside fastAtan2 may
differ by ulps between backends; a bucket flip needs the true angle within
~3e-5° of a 22.5° boundary (ops/fastmath.py docstring).

The downstream response/linearize stages commute (the response LUT is
pointwise, linearize is a permutation), so the full linear-memory build
becomes: this kernel -> linearize the ONE spread plane (MXU one-hot
matmul, 8x less shuffle traffic than linearizing 8 response planes) ->
pointwise response on the [T*T, M] rows (see
ops/response.build_linear_memories_fused).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fastmath import phase_deg


def _resolve_interpret(interpret):
    """None -> the SBM_PALLAS_INTERPRET env flag (lets CPU CI run the
    full TPU dispatch graph through the interpreter)."""
    if interpret is None:
        return os.environ.get("SBM_PALLAS_INTERPRET", "") == "1"
    return bool(interpret)

# OpenCV small-gaussian 7-tap kernel in Q8 (filters._GAUSS7_Q8).
_GAUSS7_Q8 = (8, 28, 56, 72, 56, 28, 8)


def _shift_replicate(x, d, axis):
    """x shifted so out[i] = x[i - d] (d may be negative), REPLICATE border.

    Whole-array static roll + iota select; clamped edge value comes from
    broadcasting the first/last row (or column).
    """
    if d == 0:
        return x
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    rolled = pltpu.roll(x, d % n, axis=axis)
    if d > 0:  # out[i < d] = x[0]
        edge = (x[0:1, :] if axis == 0 else x[:, 0:1])
        return jnp.where(idx >= d, rolled, edge)
    # d < 0: out[i >= n - |d|] = x[n - 1]
    edge = (x[n - 1:n, :] if axis == 0 else x[:, n - 1:n])
    return jnp.where(idx < n + d, rolled, edge)


def _shift_zero(x, d, axis):
    """x shifted so out[i] = x[i - d], zeros shifted in."""
    if d == 0:
        return x
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    rolled = pltpu.roll(x, d % n, axis=axis)
    zero = jnp.zeros((), x.dtype)
    if d > 0:
        return jnp.where(idx >= d, rolled, zero)
    return jnp.where(idx < n + d, rolled, zero)


def _sep_replicate(x, taps, axis):
    """Correlate with centered integer taps, REPLICATE border."""
    r = len(taps) // 2
    acc = None
    for i, t in enumerate(taps):
        if t == 0:
            continue
        s = _shift_replicate(x, r - i, axis)  # out[j] = x[j + (i - r)]
        term = s if t == 1 else s * t
        acc = term if acc is None else acc + term
    return acc


def _spread_or(sp, T, axis):
    """OR over the T-window up-left along `axis` via log-doubling
    (response._shift_or_axis semantics: out[i] = OR_{0<=d<T} x[i+d])."""
    covered = 1
    while covered < T:
        d = min(covered, T - covered)
        sp = sp | _shift_zero(sp, -d, axis)
        covered += d
    return sp


def _quant_spread_kernel(img_ref, thr_ref, dims_ref, out_ref, *, T,
                         with_quant, quant_ref=None, batched: bool = False,
                         color: bool = False, n_ori: int = 8,
                         mask_ref=None):
    """Shapes may be PADDED to (8, 128) tile multiples; dims_ref (SMEM
    [2]) carries the real (h, w). The host pads with edge replication, so
    blur/sobel values consumed by real in-border pixels equal full-frame
    BORDER_REPLICATE; the quantization border mask and the vote
    in-image mask use the real dims (pad pixels cast NO vote — a bare
    q8=0 pad pixel would wrongly vote for bin 0).

    n_ori=16 votes into TWO nibble-packed u32 accumulators (bins 0-7 /
    8-15) and emits u16 single-bit orientations
    (line2Dup_16bit_ori.cpp:216-297 semantics). mask_ref (optional)
    zeroes quantized orientations where mask == 0 BEFORE the spread —
    the reference's quantize() masked copy (line2Dup.cpp:446-450)."""
    if batched:  # refs carry a leading size-1 batch block
        base = img_ref[0]
    else:
        base = img_ref[...]

    def frontend(chan):
        # GaussianBlur 7x7 sigma=0, REPLICATE, Q8 fixed point; then
        # Sobel 3x3 (smooth [1,2,1] x diff [-1,0,1]), REPLICATE
        acc = _sep_replicate(chan, _GAUSS7_Q8, 1)
        acc = _sep_replicate(acc, _GAUSS7_Q8, 0)
        blurred = (acc + (1 << 15)) >> 16
        sv = _sep_replicate(blurred, (1, 2, 1), 0)
        dx = _sep_replicate(sv, (-1, 0, 1), 1)
        sh = _sep_replicate(blurred, (1, 2, 1), 1)
        dy = _sep_replicate(sh, (-1, 0, 1), 0)
        return dx, dy

    if color:
        h, w = base.shape[1:]
        dx0, dy0 = frontend(base[0].astype(jnp.int32))
        dx1, dy1 = frontend(base[1].astype(jnp.int32))
        dx2, dy2 = frontend(base[2].astype(jnp.int32))
        m0 = dx0 * dx0 + dy0 * dy0
        m1 = dx1 * dx1 + dy1 * dy1
        m2 = dx2 * dx2 + dy2 * dy2
        # per-pixel max-|grad|^2 channel, reference tie rules
        # (line2Dup.cpp:331-401 / gradients.quantized_orientations_color)
        pick0 = (m0 >= m1) & (m0 >= m2)
        pick1 = (~pick0) & (m1 >= m0) & (m1 >= m2)
        dx = jnp.where(pick0, dx0, jnp.where(pick1, dx1, dx2))
        dy = jnp.where(pick0, dy0, jnp.where(pick1, dy1, dy2))
        magi = jnp.where(pick0, m0, jnp.where(pick1, m1, m2))
    else:
        h, w = base.shape
        dx, dy = frontend(base.astype(jnp.int32))
        magi = dx * dx + dy * dy

    mag = magi.astype(jnp.float32)
    ang = phase_deg(dx.astype(jnp.float32), dy.astype(jnp.float32))

    # --- quantize to 2*n_ori then fold to n_ori bins, zero the border ----
    q16 = jax.lax.round(ang * jnp.float32(2.0 * n_ori / 360.0),
                        jax.lax.RoundingMethod.TO_NEAREST_EVEN
                        ).astype(jnp.int32)
    hr = dims_ref[0]
    wr = dims_ref[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (row > 0) & (row < hr - 1) & (col > 0) & (col < wr - 1)
    in_image = (row < hr) & (col < wr)
    q8 = jnp.where(border, q16 & (n_ori - 1), 0)

    # --- 3x3 nibble-packed majority vote (gradients.hysteresis_quantize):
    # counts <= 9 < 16 fit a nibble; 8 bins per u32 word (16-ori: a pixel
    # votes in exactly one of the lo/hi words).
    def vote_word(packed):
        votes = jnp.zeros((h, w), jnp.uint32)
        for di in (-1, 0, 1):
            rowshift = packed if di == 0 else _shift_zero(packed, di, 0)
            for dj in (-1, 0, 1):
                votes = votes + (rowshift if dj == 0
                                 else _shift_zero(rowshift, dj, 1))
        return votes

    one_hot = (jnp.uint32(1)
               << (jnp.uint32(4) * (q8 % 8).astype(jnp.uint32)))
    if n_ori == 8:
        packed = jnp.where(in_image, one_hot, jnp.uint32(0))
        words = (vote_word(packed),)
    else:
        lo = jnp.where(in_image & (q8 < 8), one_hot, jnp.uint32(0))
        hi = jnp.where(in_image & (q8 >= 8), one_hot, jnp.uint32(0))
        words = (vote_word(lo), vote_word(hi))

    max_votes = jnp.zeros((h, w), jnp.uint32)
    best_bin = jnp.zeros((h, w), jnp.uint32)
    for b in range(n_ori):
        cnt = (words[b // 8] >> jnp.uint32(4 * (b % 8))) & jnp.uint32(15)
        better = cnt > max_votes
        max_votes = jnp.where(better, cnt, max_votes)
        best_bin = jnp.where(better, jnp.uint32(b), best_bin)

    thr = thr_ref[0]
    ok = border & (mag > thr) & (max_votes >= 5)
    quant = jnp.where(ok, jnp.uint32(1) << best_bin, jnp.uint32(0))
    if mask_ref is not None:
        msk = mask_ref[0] if batched else mask_ref[...]
        # widen u8 -> i32 before the compare: Mosaic lowers a u8 vector
        # compare feeding a 32-bit select poorly (packed-i8 layout clash)
        quant = jnp.where(msk.astype(jnp.int32) > 0, quant, jnp.uint32(0))

    out_dtype = jnp.uint8 if n_ori == 8 else jnp.uint16

    def write(ref, val):
        if batched:
            ref[0] = val
        else:
            ref[...] = val

    if with_quant:
        write(quant_ref, quant.astype(out_dtype))

    # --- spread: OR over the T x T window up-left (response.spread) ------
    write(out_ref, _spread_or(_spread_or(quant, T, 0), T, 1)
          .astype(out_dtype))


def frontend_supported(shape, gray: bool, n_ori: int,
                       patch_2843: bool, has_mask: bool) -> bool:
    """Whether the fused kernel covers this configuration (the hot match
    path): gray AND color, masked, 8- and 16-orientation, any size
    (inputs pad to tile multiples with exact border semantics); only the
    PATCH_2843 variant (compile-time-disabled upstream) takes the XLA
    chain."""
    h, w = shape[:2]
    return n_ori in (8, 16) and not patch_2843 and h >= 8 and w >= 8


def quant_spread_pallas(img: jnp.ndarray, threshold_sq, T: int,
                        with_quant: bool = False,
                        interpret: bool | None = None,
                        n_ori: int = 8, mask=None):
    """Non-jitted shim: resolves `interpret` (None -> env flag) OUTSIDE
    jit, then delegates (separate jit entry points for the masked and
    unmasked signatures)."""
    if mask is None:
        return _quant_spread_pallas(img, threshold_sq, T, with_quant,
                                    _resolve_interpret(interpret), n_ori)
    return _quant_spread_pallas_masked(img, mask, threshold_sq, T,
                                       with_quant,
                                       _resolve_interpret(interpret),
                                       n_ori)


@functools.partial(jax.jit,
                   static_argnames=("T", "with_quant", "interpret",
                                    "n_ori"))
def _quant_spread_pallas(img: jnp.ndarray, threshold_sq, T: int,
                         with_quant: bool = False,
                         interpret: bool = False, n_ori: int = 8):
    return _quant_spread_impl(img, None, threshold_sq, T, with_quant,
                              interpret, n_ori)


@functools.partial(jax.jit,
                   static_argnames=("T", "with_quant", "interpret",
                                    "n_ori"))
def _quant_spread_pallas_masked(img: jnp.ndarray, mask: jnp.ndarray,
                                threshold_sq, T: int,
                                with_quant: bool = False,
                                interpret: bool = False, n_ori: int = 8):
    return _quant_spread_impl(img, mask, threshold_sq, T, with_quant,
                              interpret, n_ori)


def _quant_spread_impl(img, mask, threshold_sq, T: int, with_quant: bool,
                       interpret: bool, n_ori: int):
    """spread(hysteresis_quantize(...), T) fused in one kernel.

    img: [H, W] uint8 gray or [H, W, 3] color (quantizedOrientations,
    line2Dup.cpp:313-404; PATCH_2843 uses the XLA path). `mask` (optional
    [H, W] u8) zeroes quantized orientations pre-spread — the
    reference's masked quantize() copy (line2Dup.cpp:446-450). Any size:
    inputs pad to tile multiples with edge replication (exact
    BORDER_REPLICATE semantics) and the kernel masks with the real dims.
    Returns the [H, W] spread image (uint8 for 8 bins, uint16 for 16 per
    line2Dup_16bit_ori.cpp); `with_quant` adds the pre-spread quantized
    image as a second output.
    """
    color = img.ndim == 3
    h, w = img.shape[:2]
    # u16 outputs tile as (16, 128): pad rows to the wider tile
    row_tile = 8 if n_ori == 8 else 16
    hp = -(-h // row_tile) * row_tile
    wp = -(-w // 128) * 128
    pad = ((0, hp - h), (0, wp - w)) + (((0, 0),) if color else ())
    padded = jnp.pad(img, pad, mode="edge")
    if color:
        padded = jnp.transpose(padded, (2, 0, 1))  # [3, Hp, Wp]
    thr = jnp.asarray(threshold_sq, jnp.float32).reshape(1)
    dims = jnp.array([h, w], jnp.int32)
    out_dtype = jnp.uint8 if n_ori == 8 else jnp.uint16
    out_shape = [jax.ShapeDtypeStruct((hp, wp), out_dtype)]
    if with_quant:
        out_shape.append(jax.ShapeDtypeStruct((hp, wp), out_dtype))
    inputs = [padded, thr, dims]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    masked = mask is not None
    if masked:
        # zero-pad: pad pixels are already masked out by the in-image
        # logic, and where(mask > 0, ..) keeps zeros zero
        inputs.append(jnp.pad(mask, ((0, hp - h), (0, wp - w))))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    def body(img_ref, thr_ref, dims_ref, *rest):
        rest = list(rest)
        mask_ref = rest.pop(0) if masked else None
        out_ref = rest.pop(0)
        _quant_spread_kernel(
            img_ref, thr_ref, dims_ref, out_ref, T=T,
            with_quant=with_quant, color=color, n_ori=n_ori,
            mask_ref=mask_ref,
            quant_ref=rest.pop(0) if with_quant else None)

    outs = pl.pallas_call(
        body,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*inputs)
    outs = [o[:h, :w] for o in (outs if isinstance(outs, (list, tuple))
                                else [outs])]
    return tuple(outs) if len(outs) > 1 else outs[0]



def quant_spread_pallas_batched(imgs: jnp.ndarray, threshold_sq, T: int,
                                interpret: bool | None = None,
                                n_ori: int = 8, masks=None) -> jnp.ndarray:
    """Non-jitted shim: resolves `interpret` OUTSIDE jit, then delegates."""
    if masks is None:
        return _quant_spread_pallas_batched(imgs, threshold_sq, T,
                                            _resolve_interpret(interpret),
                                            n_ori)
    return _quant_spread_pallas_batched_masked(
        imgs, masks, threshold_sq, T, _resolve_interpret(interpret), n_ori)


@functools.partial(jax.jit, static_argnames=("T", "interpret", "n_ori"))
def _quant_spread_pallas_batched(imgs: jnp.ndarray, threshold_sq, T: int,
                                 interpret: bool = False,
                                 n_ori: int = 8) -> jnp.ndarray:
    return _quant_spread_batched_impl(imgs, None, threshold_sq, T,
                                      interpret, n_ori)


@functools.partial(jax.jit, static_argnames=("T", "interpret", "n_ori"))
def _quant_spread_pallas_batched_masked(imgs: jnp.ndarray,
                                        masks: jnp.ndarray, threshold_sq,
                                        T: int, interpret: bool = False,
                                        n_ori: int = 8) -> jnp.ndarray:
    return _quant_spread_batched_impl(imgs, masks, threshold_sq, T,
                                      interpret, n_ori)


def _quant_spread_batched_impl(imgs, masks, threshold_sq, T: int,
                               interpret: bool, n_ori: int) -> jnp.ndarray:
    """Frame-batched quant_spread_pallas: [B, H, W{,3}] -> [B, H, W].

    Grid over the batch dim (one frontend program per frame) — a single
    pallas_call for the whole batch instead of vmapping the single-frame
    kernel (one program, explicit per-frame blocks). Sizes pad like the
    single-frame wrapper; `masks` [B, H, W] is per-frame."""
    color = imgs.ndim == 4
    b, h, w = imgs.shape[:3]
    row_tile = 8 if n_ori == 8 else 16
    hp = -(-h // row_tile) * row_tile
    wp = -(-w // 128) * 128
    pad = ((0, 0), (0, hp - h), (0, wp - w)) + (((0, 0),) if color else ())
    padded = jnp.pad(imgs, pad, mode="edge")
    if color:
        padded = jnp.transpose(padded, (0, 3, 1, 2))  # [B, 3, Hp, Wp]
    thr = jnp.asarray(threshold_sq, jnp.float32).reshape(1)
    dims = jnp.array([h, w], jnp.int32)
    masked = masks is not None

    def body(img_ref, thr_ref, dims_ref, *rest):
        rest = list(rest)
        mask_ref = rest.pop(0) if masked else None
        out_ref = rest.pop(0)
        _quant_spread_kernel(img_ref, thr_ref, dims_ref, out_ref, T=T,
                             with_quant=False, batched=True, color=color,
                             n_ori=n_ori, mask_ref=mask_ref)

    img_block = ((1, 3, hp, wp) if color else (1, hp, wp))
    img_index = ((lambda i: (i, 0, 0, 0)) if color
                 else (lambda i: (i, 0, 0)))
    inputs = [padded, thr, dims]
    in_specs = [
        pl.BlockSpec(img_block, img_index, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    if masked:
        inputs.append(jnp.pad(masks, ((0, 0), (0, hp - h), (0, wp - w))))
        in_specs.append(pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    out_dtype = jnp.uint8 if n_ori == 8 else jnp.uint16
    out = pl.pallas_call(
        body,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*inputs)
    return out[:, :h, :w]
