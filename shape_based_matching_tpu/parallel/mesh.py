"""Multi-chip scale-out: data-parallel frames × template-parallel bank.

The reference's only parallelism is an OpenMP loop over templates on one CPU
(line2Dup.cpp:1166-1169). The TPU-native scale-out shards two axes over a
`jax.sharding.Mesh`:

* ``data``  — a batch of frames (each chip builds the response pyramid for
  its own frames; zero communication),
* ``templ`` — the packed template bank (each chip scores its slice of the
  bank against every local frame; candidate results ride ICI via
  ``all_gather`` so every data shard ends with the full candidate set).

Everything runs under one ``jit`` over the mesh via ``shard_map`` — XLA
inserts the collectives; no NCCL/MPI analog exists or is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.gradients import quantized_orientations_gray
from ..ops.response import build_linear_memories
from ..ops.similarity import (LevelBank, coarse_similarity_dispatch,
                              extract_candidates)
from ..ops.filters import pyr_down_u8


def make_mesh(n_devices: int | None = None, data: int | None = None):
    """Build a (data, templ) mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if data is None:
        # favor template parallelism (the bank is usually the big axis)
        data = 2 if n % 2 == 0 and n > 1 else 1
    assert n % data == 0
    arr = np.array(devs[:n]).reshape(data, n // data)
    return Mesh(arr, ("data", "templ"))


def multichip_match_step(mesh: Mesh, T_levels: tuple, size_hw: tuple,
                         cand_cap: int = 64):
    """Return a jitted step: (images [B,H,W] u8, bank per coarsest level)
    -> (scores [B, K_total, cand_cap], counts [B]) with the template axis
    sharded over 'templ' and the batch over 'data'.

    The coarse level runs fully sharded; candidate extraction happens
    per-shard and results are all-gathered over 'templ'.
    """
    h, w = size_hw
    t_last = T_levels[-1]
    levels = len(T_levels)
    size_last = (w >> (levels - 1), h >> (levels - 1))
    w_last = size_last[0] // t_last

    def per_shard(images, fx, fy, label, valid, nfeat, width, height):
        bank = LevelBank(fx, fy, label, valid, nfeat, width, height)

        def one_image(img):
            src = img
            for _ in range(levels - 1):
                src = pyr_down_u8(src)
            grads = quantized_orientations_gray(src, jnp.float32(30.0))
            lm = build_linear_memories(grads.angle, t_last)
            m = lm.shape[-1]
            lmflat = jnp.concatenate(
                [lm.reshape(-1), jnp.zeros((m,), jnp.uint8)])
            S, _ = coarse_similarity_dispatch(lm, lmflat, bank, t_last,
                                              size_last)
            k, x, y, sc, vald, n_above = extract_candidates(
                S, bank.nfeat, jnp.float32(80.0), t_last, w_last, cand_cap)
            return sc, n_above

        scores, counts = jax.vmap(one_image)(images)
        # Collectives over ICI: every data shard sees all template shards.
        scores = jax.lax.all_gather(scores, "templ", axis=1, tiled=True)
        counts = jax.lax.psum(counts, "templ")
        return scores, counts

    shard = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("data"), P("templ"), P("templ"), P("templ"), P("templ"),
                  P("templ"), P("templ"), P("templ")),
        out_specs=(P("data", None), P("data")),
        check_vma=False,
    )
    return jax.jit(shard)


def multichip_train_step(mesh: Mesh, size_hw: tuple):
    """Data-parallel training-side device work: gradient pyramids +
    quantization + local-max maps for a batch of template images, with a
    psum'd feature-count statistic (the device half of addTemplate;
    the greedy selection stays on host by design)."""
    from ..models.training import local_max_map

    def per_shard(images):
        def one(img):
            grads = quantized_orientations_gray(img, jnp.float32(30.0))
            lmax = local_max_map(grads.magnitude)
            strong = grads.magnitude > jnp.float32(60.0) ** 2
            cand = lmax & strong & (grads.angle > 0)
            return grads.angle, jnp.sum(cand, dtype=jnp.int32)

        quant, counts = jax.vmap(one)(images)
        total = jax.lax.psum(jnp.sum(counts), ("data", "templ"))
        return quant, counts, total

    shard = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(("data", "templ")),),
        out_specs=(P(("data", "templ")), P(("data", "templ")), P()),
        check_vma=False,
    )
    return jax.jit(shard)
