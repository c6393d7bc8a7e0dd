"""Attribute the 10k-template e2e cost AFTER the delta-chain landed.

Times nested WHOLE programs (per CLAUDE.md, separately-jitted stage
timings are artifacts; deltas between nested whole programs bound each
suffix stage):

  Q1: frontend + chain kernel, block on the RAW [P, U, rows, 128] out
      (before the emit gather)
  Q2: Q1 + emit gather + bitcast -> cells [K, m_pad]
  Q3: Q2 + extract_candidates_cells
  Q3n: Q1 + extract_candidates_chain on the RAW rows (cell view; the
       bitcast view's compare pass relayouts — kept as the measured
       rejection)
  Q3w: Q1 + extract_candidates_chain_words on the RAW i32 word tiles
       (no emit gather, no relayout — the production fast path)
  Q4: full match step (__graft_entry__.entry) == bench e2e

Run (chip must be otherwise idle):
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_chain_cost.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from shape_based_matching_tpu.ops.filters import pyr_down_u8
from shape_based_matching_tpu.ops.pallas.chain_plan import (CHAIN_S,
                                                            CHAIN_U)
from shape_based_matching_tpu.ops.pallas.similarity_pallas import (
    _extend_lm_planes, _make_chain_kernel, _pack_copies, _positions)
from shape_based_matching_tpu.ops.response import \
    build_linear_memories_fused
from shape_based_matching_tpu.ops.similarity import (
    extract_candidates_cells, extract_candidates_chain,
    extract_candidates_chain_words)
from shape_based_matching_tpu.utils.synthetic import (
    build_rotated_detector, synthetic_scene)


def main(num_templates=10000, cap=256):
    H = W = 1024
    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=63)
    banks = det._get_banks("bench")
    scene = jnp.asarray(synthetic_scene(H, W, templ_img, n_instances=4))
    bank = banks[1]
    T = 8
    size_wh = (W // 2, H // 2)
    w1, h1 = size_wh
    Wd = w1 // T
    M = Wd * (h1 // T)

    chain = det._get_chain(bank, size_wh)
    assert chain is not None, "planner declined — nothing to attribute"
    plan, desc = chain
    print(f"chain: unit={desc.unit} rows={desc.rows} m_pad={desc.m_pad} "
          f"P={desc.n_programs} (K={num_templates})", flush=True)
    C = desc.n_ori * T * T

    def chain_raw(image):
        src1 = pyr_down_u8(image)
        lm1 = build_linear_memories_fused(src1, 30.0, T)
        flat = _extend_lm_planes(lm1, M, desc.m_pad, C)
        lmp = _pack_copies(flat, C, desc.unit, desc.rows)
        P = desc.n_programs
        return pl.pallas_call(
            _make_chain_kernel(CHAIN_U, CHAIN_S),
            grid=(P,),
            in_specs=[
                pl.BlockSpec((1, 6, CHAIN_U, CHAIN_S),
                             lambda k: (k, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(lmp.shape, lambda k: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CHAIN_U, desc.rows, 128),
                                   lambda k: (k, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, CHAIN_U, desc.rows, 128),
                                           jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(plan.meta, lmp)

    K = int(plan.emit.shape[0])
    cell_dtype = jnp.uint8 if desc.unit == 4 else jnp.uint16

    def cells_of(out):
        rows_k = out.reshape(-1, desc.rows, 128)[plan.emit]
        return jax.lax.bitcast_convert_type(rows_k, cell_dtype).reshape(
            K, desc.m_pad)

    q1 = jax.jit(chain_raw)

    @jax.jit
    def q2(image):
        return cells_of(chain_raw(image))

    @jax.jit
    def q3(image):
        cells = cells_of(chain_raw(image))
        positions = _positions(bank, T, Wd, h1 // T)
        return extract_candidates_cells(cells, positions, bank.nfeat,
                                        jnp.float32(85.0), T, Wd, cap, M)

    @jax.jit
    def q3n(image):
        rows_cells = jax.lax.bitcast_convert_type(
            chain_raw(image), cell_dtype).reshape(-1, desc.m_pad)
        positions = _positions(bank, T, Wd, h1 // T)
        return extract_candidates_chain(rows_cells, plan.emit, positions,
                                        bank.nfeat, jnp.float32(85.0),
                                        T, Wd, cap, M)

    @jax.jit
    def q3w(image):
        words = chain_raw(image).reshape(-1, desc.rows, 128)
        positions = _positions(bank, T, Wd, h1 // T)
        return extract_candidates_chain_words(
            words, plan.emit, positions, bank.nfeat, jnp.float32(85.0),
            desc.unit, T, Wd, cap, M)

    from __graft_entry__ import entry
    fn4, args4 = entry(num_templates=num_templates)
    q4 = jax.jit(fn4)

    progs = [("Q1 chain-raw", lambda: q1(scene)),
             ("Q2 +emit/cells", lambda: q2(scene)),
             ("Q3 +extract", lambda: q3(scene)),
             ("Q3n rows-direct", lambda: q3n(scene)),
             ("Q3w words-direct", lambda: q3w(scene)),
             ("Q4 full e2e", lambda: q4(*args4))]
    for name, f in progs:
        t0 = time.time()
        jax.block_until_ready(f())
        print(f"compiled {name}: {time.time()-t0:.0f} s", flush=True)

    iters = 20
    for rep in range(3):
        line = []
        for name, f in progs:
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = f()
            jax.block_until_ready(out)
            line.append(f"{name}: {(time.perf_counter()-t0)/iters*1e3:7.3f} ms")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10000)
