"""Pallas TPU kernel: batched coarse similarity.

The coarse score is S[k, j] = sum_n LMflat[off[k, n] + j] over all M
decimated positions — N contiguous M-byte rows summed per template. The XLA
fallback (ops/similarity.py) scans the feature axis with whole-array
gathers, paying an HBM round-trip of the int32 accumulator per step. This
kernel keeps the accumulator in VMEM and double-buffers the row DMAs from
HBM, so HBM traffic drops to the N row reads + one accumulator write:

    per template: N x M bytes in, M x 2 bytes out  (vs XLA's ~N x M x 8)

Grid is (K,); each program accumulates one template's score row. Feature
offsets arrive per-program in SMEM; the linear memories stay in HBM/ANY and
are sliced with dynamic starts (the zero-pad region at offset L serves
invalid features, preserving the fallback's exact semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..similarity import LevelBank, _flat_offsets


def _coarse_kernel(off_ref, lm_ref, out_ref, buf, sem):
    """off_ref: SMEM [1, 1, N]; lm_ref: ANY [L+M]; out_ref: VMEM [1, M] i32;
    buf: VMEM [2, M] u8; sem: DMA sems [2]."""
    n_feats = off_ref.shape[2]
    m = out_ref.shape[1]

    def get_dma(slot, n):
        return pltpu.make_async_copy(
            lm_ref.at[pl.ds(off_ref[0, 0, n], m)],
            buf.at[slot],
            sem.at[slot],
        )

    get_dma(0, 0).start()

    def body(n, acc):
        cur = jax.lax.rem(n, 2)

        @pl.when(n + 1 < n_feats)
        def _():
            get_dma(jax.lax.rem(n + 1, 2), n + 1).start()

        pltpu.make_async_copy(
            lm_ref.at[pl.ds(off_ref[0, 0, n], m)], buf.at[cur], sem.at[cur]
        ).wait()
        return acc + buf[cur].astype(jnp.int32)

    acc = jax.lax.fori_loop(0, n_feats, body,
                            jnp.zeros((m,), jnp.int32))
    out_ref[0, :] = acc


@functools.partial(jax.jit, static_argnames=("T", "size_wh", "interpret"))
def coarse_similarity_pallas(lmflat: jnp.ndarray, bank: LevelBank, T: int,
                             size_wh, interpret: bool = False):
    """Drop-in replacement for ops.similarity.coarse_similarity."""
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    off = _flat_offsets(bank, T, W, M, size_wh)  # [K, N]
    K, N = off.shape
    off3 = off.reshape(K, 1, N)  # SMEM blocks need last-two-dims == array dims

    S = pl.pallas_call(
        _coarse_kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 1, N), lambda k: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, M), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, M), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, M), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(off3, lmflat)

    wf = (bank.width - 1) // T + 1
    hf = (bank.height - 1) // T + 1
    positions = (H - hf) * W + (W - wf) + 1
    j = jnp.arange(M, dtype=jnp.int32)[None, :]
    S = jnp.where(j < positions[:, None], S, 0)
    return S, positions
