"""Delta-encoded ("chain") coarse scoring for dense template banks.

Dense rotation/scale sweeps — the banks the reference's own
addTemplate_rotate enumeration produces (line2Dup.cpp:1409-1451) — make
ADJACENT templates share most of their coarse-level (plane, shift)
feature slots: measured on a 63-feature rotation bank at the coarse
level (T=8), the adds+subs delta between neighbors is ~10% of a full
template at 0.036 deg steps (K=10000) and ~80% at 0.36 deg (K=1000).

Every feature's score contribution is a pure tile function of its slot
quadruple (idx, b, a, m), and packed-lane integer sums are exact and
order-independent (the final per-byte/per-u16 values are bounded by
max_response * nfeat; intermediate word carries/borrows cancel exactly
under two's-complement arithmetic). So template k's score tile can be
computed from template k-1's as

    tile_k = tile_{k-1} + sum(added slots) - sum(removed slots)

BIT-EXACTLY equal to scoring k from scratch. The planner below packs
templates into grid programs as chains of fixed-size sub-steps (S slots
each): the first template of a chain is a base (accumulator reset + all
its features, sign +1), subsequent templates are deltas; a delta
costing >= nfeat breaks the chain (rebase). Planning is host-side numpy
on concrete bank arrays, cached per (bank, frame size) by the Detector.

This has no reference counterpart (line2Dup.cpp:1166-1196 scores every
template independently under OpenMP) — it is TPU-first exploitation of
the enumerated-template structure: the serial chain lives INSIDE one
grid program where it costs nothing, and the planner keeps the win
data-driven (dense banks engage, sparse banks keep the plain kernel).
"""

from __future__ import annotations

import os
from collections import Counter
from typing import NamedTuple

import numpy as np

CHAIN_S = 4        # feature slots per sub-step
CHAIN_U = 64       # sub-steps per grid program
# engage only when chain slot-cost (incl. padding) is below this
# fraction of the plain kernel's per-feature cost
CHAIN_MAX_RATIO = 0.6
_MIN_K = 256       # don't bother planning tiny banks


class ChainDesc(NamedTuple):
    """Static (hashable) half of a chain plan."""
    unit: int       # LM cells per i32 lane (4 = u8 cells, 2 = u16)
    rows: int       # word rows of a packed plane tile
    m_pad: int      # padded cell count per plane
    n_programs: int
    n_ori: int
    u_out: int      # output tile rows per program (max templates/program)


class ChainPlan(NamedTuple):
    """Device half (a jit-traceable pytree)."""
    meta: object    # i32 [P, 7, CHAIN_U, CHAIN_S]
    emit: object    # i32 [K] row index into the flattened [P*u_out] outputs


def chain_enabled() -> bool:
    return os.environ.get("SBM_NO_CHAIN", "") != "1"


def plan_chain(bank, T: int, size_wh, n_ori: int,
               max_ratio: float = CHAIN_MAX_RATIO):
    """Try to build a chain plan for `bank` at the coarse level.

    Returns (ChainPlan of numpy arrays, ChainDesc) or None when the
    bank/config doesn't profit (sparse bank, unsupported packing, VMEM).
    The caller converts plan arrays to device arrays and caches.
    """
    if not chain_enabled():
        return None
    w_img, h_img = int(size_wh[0]), int(size_wh[1])
    W, H = w_img // T, h_img // T
    M = W * H
    C = n_ori * T * T

    fx = np.asarray(bank.fx)
    K, N_slots = fx.shape
    if K < _MIN_K:
        return None
    max_resp = 4
    if N_slots * max_resp <= 255:
        unit = 4
    elif N_slots * max_resp <= 65535:
        unit = 2
        # the wide packed4-phase kernel scores unit-2 banks at HALF the
        # packed2 per-feature cost (similarity_pallas._make_wide_kernel),
        # so a unit-2 chain (whose slots roll 2x the word rows) must
        # beat ~0.5x plain to be worth taking over the wide route
        max_ratio = min(max_ratio, 0.45)
    else:
        return None
    M_pad = -(-(M + max(W, 1)) // 4096) * 4096
    if 4 * (C + 1) * M_pad > 36 * 2**20:   # preshifted copies VMEM gate
        return None
    rows = M_pad // (128 * unit)

    fy = np.asarray(bank.fy)
    lab = np.asarray(bank.label)
    val = np.asarray(bank.valid)
    inb = val & (fx >= 0) & (fx < w_img) & (fy >= 0) & (fy < h_img)
    plane = np.where(inb, lab * (T * T) + (fy % T) * T + (fx % T), C)
    s = np.where(inb, (fy // T) * W + fx // T, 0)
    nf = np.where(val.any(axis=1), np.asarray(bank.nfeat), 0).astype(int)

    zp = (unit - 1) * (C + 1) + C
    PAD = (zp, 0, 0, 128, 1)

    def slot(p, sh, sgn):
        sw = sh // unit
        r = sh % unit
        return (r * (C + 1) + p, (rows - sw // 128) % rows,
                (128 - sw % 128) % 128, 128 - sw % 128, sgn)

    def feats(k):
        n = int(nf[k])
        return Counter(zip(plane[k, :n].tolist(), s[k, :n].tolist()))

    S, U_max = CHAIN_S, CHAIN_U
    programs = []
    emit_pl = np.zeros((K, 2), np.int64)  # (program, local template idx)
    cur: list = []
    prev = None
    live_slots = 0
    n_local = 0  # templates already completed in the current program

    def flush():
        nonlocal cur, prev, n_local
        if cur:
            programs.append(cur)
        cur = []
        prev = None
        n_local = 0

    for k in range(K):
        fk = feats(k)
        if prev is not None:
            adds = fk - prev
            subs = prev - fk
            use_delta = (sum(adds.values()) + sum(subs.values())
                         < sum(fk.values()))
        else:
            use_delta = False
        if use_delta:
            slots = ([slot(p, sh, 1) for (p, sh), c in adds.items()
                      for _ in range(c)]
                     + [slot(p, sh, -1) for (p, sh), c in subs.items()
                        for _ in range(c)])
            keep0 = 1
        else:
            slots = [slot(p, sh, 1) for (p, sh), c in fk.items()
                     for _ in range(c)]
            keep0 = 0
        # zero-delta templates (exact duplicates) still get ONE no-op
        # sub-step (keep=1, all-PAD slots): emit rows stay STRICTLY
        # increasing, which the row-direct candidate extraction
        # (ops.similarity.extract_candidates_chain) relies on to invert
        # emit into a row->template map.
        need = max(1, -(-len(slots) // S))
        if len(cur) + need > U_max:
            flush()
            slots = [slot(p, sh, 1) for (p, sh), c in fk.items()
                     for _ in range(c)]
            keep0 = 0
            need = max(1, -(-len(slots) // S))
        live_slots += len(slots)
        slots = slots + [PAD] * (need * S - len(slots))
        for u in range(need):
            cur.append((keep0 if u == 0 else 1, n_local,
                        slots[u * S:(u + 1) * S]))
        emit_pl[k] = (len(programs), n_local)
        n_local += 1
        prev = fk
    flush()

    P = len(programs)
    # cost model: chain pays every padded sub-step slot; plain pays the
    # live feature slots (its unroll padding roughly cancels against the
    # chain's per-sub-step bookkeeping)
    chain_cost = sum(len(prog) for prog in programs) * S
    plain_cost = int(nf.sum())
    if plain_cost == 0 or chain_cost > max_ratio * plain_cost:
        return None

    # COMPACT output: every sub-step stores the running tile to its
    # template's own output row (meta row 6) — later sub-steps of the
    # same template overwrite earlier ones, so the final value at row
    # (p, local) is exactly that template's finished tile. The output
    # shrinks from P*CHAIN_U sub-step rows to P*u_out template rows
    # (u_out = max templates per program), halving both the kernel's
    # output DMA and the extraction scan on dense 2-sub-step banks.
    u_out = max(1 + max(loc for _, loc, _ in prog) for prog in programs)
    emit = emit_pl[:, 0] * u_out + emit_pl[:, 1]
    assert (np.diff(emit) > 0).all(), "emit rows must strictly increase"

    meta = np.zeros((P, 7, U_max, S), np.int32)
    meta[:, 0] = zp
    meta[:, 3] = 128
    meta[:, 4] = 1
    meta[:, 5, :, 0] = 1     # trailing no-op sub-steps keep the acc
    for p, prog in enumerate(programs):
        for u, (keep, loc, slots) in enumerate(prog):
            meta[p, 5, u, 0] = keep
            meta[p, 6, u, 0] = loc
            for sl, (i_, b_, a_, m_, g_) in enumerate(slots):
                meta[p, 0, u, sl] = i_
                meta[p, 1, u, sl] = b_
                meta[p, 2, u, sl] = a_
                meta[p, 3, u, sl] = m_
                meta[p, 4, u, sl] = g_
        # trailing no-op sub-steps re-store the LAST template's row
        # (keep=1 + all-PAD slots leave the tile unchanged) — they must
        # not clobber row 0
        meta[p, 6, len(prog):, 0] = prog[-1][1]
    return (ChainPlan(meta=meta, emit=emit.astype(np.int32)),
            ChainDesc(unit=unit, rows=rows, m_pad=M_pad, n_programs=P,
                      n_ori=n_ori, u_out=u_out))


def plan_chain_sharded(bank, n_shards: int, T: int, size_wh, n_ori: int,
                       max_ratio: float = CHAIN_MAX_RATIO):
    """Chain plans for a templ-sharded bank: plan each K/n_shards slice
    independently (chains never cross shard boundaries — grid programs
    don't either), pad every shard's program count to the max, and
    stack so a shard_map P('templ') in_spec hands each device its own
    slice. Returns (meta [n_shards*P_max, 6, U, S], emit
    [n_shards*K_loc], ChainDesc with n_programs=P_max) or None when ANY
    shard declines (all-or-nothing: the kernel choice is static)."""
    K = int(np.asarray(bank.fx).shape[0])
    if K % n_shards:
        return None
    K_loc = K // n_shards

    def slice_bank(s):
        lo, hi = s * K_loc, (s + 1) * K_loc
        return type(bank)(*(np.asarray(f)[lo:hi] for f in bank))

    shard_plans = []
    desc0 = None
    for s in range(n_shards):
        res = plan_chain(slice_bank(s), T, size_wh, n_ori,
                         max_ratio=max_ratio)
        if res is None:
            return None
        plan, desc = res
        if desc0 is None:
            desc0 = desc
        elif desc[:3] != desc0[:3]:   # unit/rows/m_pad must agree
            return None
        shard_plans.append((plan, desc))
    P_max = max(p.meta.shape[0] for p, _ in shard_plans)
    u_out = max(d.u_out for _, d in shard_plans)
    metas, emits = [], []
    for plan, desc in shard_plans:
        meta = plan.meta
        if meta.shape[0] < P_max:
            padp = np.zeros((P_max - meta.shape[0],) + meta.shape[1:],
                            meta.dtype)
            zp = ((desc0.unit - 1) * (desc0.n_ori * T * T + 1)
                  + desc0.n_ori * T * T)
            padp[:, 0] = zp
            padp[:, 3] = 128
            padp[:, 4] = 1
            padp[:, 5, :, 0] = 1
            meta = np.concatenate([meta, padp])
        metas.append(meta)
        # re-base emit rows onto the COMMON u_out (the per-shard local
        # template indices are unchanged; only the program stride moves)
        p_of = plan.emit // desc.u_out
        loc_of = plan.emit % desc.u_out
        emits.append((p_of * u_out + loc_of).astype(np.int32))
    return (np.concatenate(metas), np.concatenate(emits),
            ChainDesc(unit=desc0.unit, rows=desc0.rows,
                      m_pad=desc0.m_pad, n_programs=P_max,
                      n_ori=desc0.n_ori, u_out=u_out))
