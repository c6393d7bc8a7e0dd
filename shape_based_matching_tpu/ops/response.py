"""Orientation spreading, cosine-response maps, and the TPU linear layout.

Reference semantics (line2Dup.cpp:583-777):

* ``spread``: OR each pixel's orientation bitmask into every position of the
  T×T window *up-left* of it — i.e. dst[r,c] = OR_{0<=dr,dc<T} src[r+dr,c+dc]
  with zeros beyond the image. The reference runs T² full-image SIMD OR
  passes; OR is separable, so we do T row-shift ORs then T column-shift ORs
  (2T passes, fused by XLA).

* ``response_maps``: for orientation ``ori``, the 256-entry SIMILARITY_LUT
  (line2Dup.cpp:632-635) evaluates max over set bits b of w(dist(b, ori)) with
  w(0)=4, w(1)=3, else 0 (responses in {0,3,4}). Instead of a byte LUT +
  shuffle we compute it directly from three bit tests — pure uint8 VPU ops.

* ``linearize``: the reference reorders each response map into T² rows of the
  T-decimated image so a template shift is a contiguous row read
  (line2Dup.cpp:749-777). On TPU this is just a reshape/transpose to
  ``[8, T*T, H/T * W/T]``; the similarity kernel consumes the flattened
  ``[8*T*T*M]`` view so the reference's flat-offset (row-wrapping) semantics
  are preserved exactly (line2Dup.cpp:825,949 keep wrapped positions).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _shift_or_axis(x: jnp.ndarray, T: int, axis: int) -> jnp.ndarray:
    """acc[i] = OR_{0<=d<T} x[i+d] (zeros beyond) via log-doubling:
    ceil(log2 T) shifted ORs instead of T-1. The .at[].set shift form maps
    to cheap in-place masked copies on TPU (measured ~50x faster than the
    concatenate form)."""
    acc = x
    covered = 1
    while covered < T:
        d = min(covered, T - covered)
        if axis == 0:
            shifted = jnp.zeros_like(acc).at[: -d, :].set(acc[d:, :])
        else:
            shifted = jnp.zeros_like(acc).at[:, : -d].set(acc[:, d:])
        acc = acc | shifted
        covered += d
    return acc


@partial(jax.jit, static_argnames=("T",))
def spread(quantized: jnp.ndarray, T: int) -> jnp.ndarray:
    """OR orientations over the T×T window (line2Dup.cpp:616-630)."""
    return _shift_or_axis(_shift_or_axis(quantized, T, 0), T, 1)


@partial(jax.jit, static_argnames=("n_ori",))
def response_maps(spread_img: jnp.ndarray, n_ori: int = 8) -> jnp.ndarray:
    """[n_ori, H, W] uint8 cosine responses.

    n_ori=8 (line2Dup.cpp:637-747): response[ori] = 4 if bit ori set, else 3
    if an adjacent bit (ori±1 mod 8) is set, else 0 — exactly the
    SIMILARITY_LUT table semantics.

    n_ori=16: matches the COMPILED experiment exactly
    (tests/test_golden_16ori.py), including two facts discovered by
    compiling it:
    * the SIMILARITY_LUT it vendors (line2Dup_16bit_ori.cpp:575-608) maps
      circular bin distance d to 4 (d <= 2), 1 (d in {3, 4}), 0 (d >= 5)
      — NOT the graded 8..0 table LUT_gen.cpp emits (committed as
      LUT16.txt but never wired in);
    * its nibble split extracts the top segment with
      ``(src & (15 << 16)) >> 16`` (line2Dup_16bit_ori.cpp:639) — always
      zero for a ushort — so spread bits 12..15 NEVER contribute a
      response. Reproduced here by masking them out.
    """
    s = spread_img.astype(jnp.int32)  # [H, W]
    if n_ori == 8:
        oris = jnp.arange(8, dtype=jnp.int32)
        exact = (s[None] >> oris[:, None, None]) & 1
        left = (s[None] >> ((oris + 1) & 7)[:, None, None]) & 1
        right = (s[None] >> ((oris - 1) & 7)[:, None, None]) & 1
        adj = left | right
        resp = jnp.where(exact == 1, 4, jnp.where(adj == 1, 3, 0))
        return resp.astype(jnp.uint8)

    live = 0xFFF  # bits 12..15 are dead (the reference's 15<<16 bug)
    planes = []
    for ori in range(n_ori):
        near = 0  # live bits within distance 2 -> response 4
        for d in (-2, -1, 0, 1, 2):
            near |= 1 << ((ori + d) % n_ori)
        mid = 0  # live bits at distance 3..4 -> response 1
        for d in (-4, -3, 3, 4):
            mid |= 1 << ((ori + d) % n_ori)
        resp = jnp.where((s & (near & live)) > 0, 4,
                         jnp.where((s & (mid & live)) > 0, 1, 0))
        planes.append(resp)
    return jnp.stack(planes).astype(jnp.uint8)


def _col_select_matrix(w: int, T: int) -> np.ndarray:
    """[W, W] one-hot: column x -> output column (x%T)*Wd + x//T."""
    sel = np.zeros((w, w), np.float32)
    wd = w // T
    x = np.arange(w)
    sel[x, (x % T) * wd + x // T] = 1.0
    return sel


@partial(jax.jit, static_argnames=("T",))
def linearize(resp: jnp.ndarray, T: int) -> jnp.ndarray:
    """[n_ori, H, W] responses -> [n_ori, T*T, M] linear memories,
    M = (H/T)*(W/T).

    Row (ty*T + tx) of plane `ori` holds resp[ori, ty::T, tx::T] flattened
    row-major — identical layout to the reference's linear memories so flat
    offsets agree byte-for-byte.

    TPU formulation: the column decimation (a stride-T *lane* gather, which
    the VPU does at shuffle speed — measured 1.6 ms at 1024²) rides the MXU
    instead: resp @ SEL with a one-hot [W, W] selector permuting columns to
    (x%T, x//T) order. Responses <= 8 are exact in bf16 and the f32
    accumulation of one-hot products is exact, so results are bit-identical.
    The remaining row decimation moves whole lane-rows (cheap transpose).
    """
    n_ori, h, w = resp.shape
    assert h % T == 0 and w % T == 0, (h, w, T)
    hd, wd = h // T, w // T
    sel = jnp.asarray(_col_select_matrix(w, T), jnp.bfloat16)
    x = jnp.matmul(resp.astype(jnp.bfloat16), sel,
                   preferred_element_type=jnp.float32)
    x = x.astype(jnp.uint8)                      # [n_ori, H, (tx, xd)]
    x = x.reshape(n_ori, hd, T, T, wd)           # rows (yd, ty), cols (tx, xd)
    x = x.transpose(0, 2, 3, 1, 4)               # [n_ori, ty, tx, yd, xd]
    return x.reshape(n_ori, T * T, hd * wd)


@partial(jax.jit, static_argnames=("T", "n_ori"))
def build_linear_memories(quantized: jnp.ndarray, T: int,
                          n_ori: int = 8) -> jnp.ndarray:
    """Fused quantized -> spread -> responses -> linear memories."""
    return linearize(response_maps(spread(quantized, T), n_ori), T)


@partial(jax.jit, static_argnames=("T", "n_ori"))
def build_lm_from_spread(sp: jnp.ndarray, T: int,
                         n_ori: int = 8) -> jnp.ndarray:
    """[H, W] spread plane -> [n_ori, T*T, M] linear memories.

    Exploits response∘linearize commutativity: linearize permutes pixels
    and the response LUT is pointwise, so decimating the ONE spread plane
    first (MXU one-hot matmul) and applying the bit-test response to its
    [T*T, M] rows yields bytes identical to
    ``linearize(response_maps(sp), T)`` while moving n_ori× less data
    through the shuffle.

    16-ori spread planes are uint16 — past bf16's exact-integer range —
    so the permutation rides the MXU as two exact u8 byte planes."""
    if sp.dtype == jnp.uint16:
        lo = linearize((sp & 0xFF).astype(jnp.uint8)[None], T)[0]
        hi = linearize((sp >> 8).astype(jnp.uint8)[None], T)[0]
        perm = lo.astype(jnp.uint16) | (hi.astype(jnp.uint16) << 8)
        return response_maps(perm, n_ori)
    return response_maps(linearize(sp[None], T)[0], n_ori)


@partial(jax.jit, static_argnames=("T", "n_ori", "interpret"))
def build_linear_memories_fused(src: jnp.ndarray, weak_threshold, T: int,
                                n_ori: int = 8,
                                interpret: bool = False) -> jnp.ndarray:
    """Fused image -> linear memories: Pallas frontend kernel + reordered
    response/linearize.

    Bit-identical to ``build_linear_memories(quantized_orientations_gray(
    src, thr).angle, T)``: the Pallas kernel reproduces the quantize+spread
    chain exactly, and response_maps (pointwise) commutes with linearize
    (a permutation), so linearizing the ONE spread plane first and applying
    the bit-test response to its [T*T, M] rows gives the same bytes while
    moving 8x less data through the decimation shuffle.

    Gray/color, 8- and 16-orientation; PATCH_2843 callers use the
    unfused path.
    """
    from .pallas.frontend_pallas import quant_spread_pallas

    sp = quant_spread_pallas(src, jnp.float32(weak_threshold) ** 2, T,
                             interpret=interpret, n_ori=n_ori)
    return build_lm_from_spread(sp, T, n_ori)
