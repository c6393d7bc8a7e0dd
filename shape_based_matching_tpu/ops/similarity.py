"""Batched template similarity — the TPU replacement for the OpenMP loop.

The reference scores templates one at a time with SIMD adds inside an OpenMP
``parallel for`` (line2Dup.cpp:1160-1297). Here the whole template bank is a
padded array pytree and every template scores in one device launch:

* coarse level: ``S[k, j] = sum_n LMflat[off[k, n] + j]`` for all K templates
  and all M decimated positions at once — a scan over the (padded) feature
  axis of batched contiguous-slice gathers. ``off`` encodes the reference's
  linear-memory addressing ((label, y%T, x%T) plane + (y//T)*W + x//T), and
  the *flat* offset semantics — including the wrap across image rows that the
  reference deliberately allows (line2Dup.cpp:946-949) — are preserved.
* refinement: all surviving candidates of all templates refine as one batched
  16×16-patch gather (line2Dup.cpp:860-922 semantics, incl. the multiple-of-T
  snapping and the clamp order of line2Dup.cpp:1236-1245).

Scores stay integer until the final ``raw * 100 / (4 * nfeat)`` float
(line2Dup.cpp:1206), so results match the C++ u8/u16 accumulators exactly
(responses are in {0,3,4}; no overflow differences in i32).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LevelBank(NamedTuple):
    """Padded per-pyramid-level template bank (device pytree).

    Replaces the reference's ``map<class_id, vector<TemplatePyramid>>``
    (line2Dup.h:320) with fixed-shape arrays: K templates × N feature slots.
    """

    fx: jnp.ndarray      # [K, N] int32 feature x (template frame)
    fy: jnp.ndarray      # [K, N] int32 feature y
    label: jnp.ndarray   # [K, N] int32 orientation bin 0..7
    valid: jnp.ndarray   # [K, N] bool
    nfeat: jnp.ndarray   # [K] int32 true feature count
    width: jnp.ndarray   # [K] int32 cropped template width at this level
    height: jnp.ndarray  # [K] int32


def pack_level_bank(templates, n_pad: int | None = None) -> LevelBank:
    """Pack a list of per-template dicts (one pyramid level) into arrays.

    Each dict: {'features': [(x, y, label), ...], 'width': int, 'height': int}.
    """
    K = len(templates)
    N = max((len(t["features"]) for t in templates), default=1)
    N = max(N, 1)
    if n_pad is not None:
        N = max(N, n_pad)
    fx = np.zeros((K, N), np.int32)
    fy = np.zeros((K, N), np.int32)
    lb = np.zeros((K, N), np.int32)
    va = np.zeros((K, N), bool)
    nf = np.zeros((K,), np.int32)
    w = np.zeros((K,), np.int32)
    h = np.zeros((K,), np.int32)
    for k, t in enumerate(templates):
        feats = t["features"]
        nf[k] = len(feats)
        w[k] = t["width"]
        h[k] = t["height"]
        for n, f in enumerate(feats):
            fx[k, n], fy[k, n], lb[k, n] = f[0], f[1], f[2]
            va[k, n] = True
    return LevelBank(*(jnp.asarray(a) for a in (fx, fy, lb, va, nf, w, h)))


def _flat_offsets(bank: LevelBank, T: int, W: int, M: int,
                  size_wh, n_ori: int = 8) -> jnp.ndarray:
    """Flat linear-memory offset per feature; invalid/OOB -> zero region (=L).

    off = (label*T*T + (y%T)*T + x%T) * M + (y//T)*W + x//T
    (accessLinearMemory, line2Dup.cpp:782-805).
    """
    w_img, h_img = size_wh
    L = n_ori * T * T * M
    inb = (
        bank.valid
        & (bank.fx >= 0) & (bank.fx < w_img)
        & (bank.fy >= 0) & (bank.fy < h_img)
    )
    plane = bank.label * (T * T) + (bank.fy % T) * T + (bank.fx % T)
    off = plane * M + (bank.fy // T) * W + (bank.fx // T)
    return jnp.where(inb, off, L).astype(jnp.int32)


def use_pallas_default() -> bool:
    """Pallas kernels engage automatically on TPU backends."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no devices
        return False


def coarse_similarity_dispatch(lm: jnp.ndarray, lmflat: jnp.ndarray,
                               bank: LevelBank, T: int, size_wh,
                               use_pallas: bool | None = None,
                               mask_positions: bool = True):
    """Pick the Pallas TPU kernel or the XLA fallback (identical results).

    `lm` is the [8, T*T, M] stack, `lmflat` its flat+zero-padded form.
    `mask_positions=False` returns raw (unmasked) maps for refinement use.
    """
    if use_pallas is None:
        use_pallas = use_pallas_default()
    n_ori = int(lm.shape[0])
    if use_pallas:
        from .pallas.similarity_pallas import coarse_similarity_pallas

        return coarse_similarity_pallas(lm, bank, T, size_wh,
                                        mask_positions=mask_positions)
    return coarse_similarity(lmflat, bank, T, size_wh,
                             mask_positions=mask_positions, n_ori=n_ori)


@partial(jax.jit,
         static_argnames=("T", "size_wh", "mask_positions", "n_ori"))
def coarse_similarity(lmflat: jnp.ndarray, bank: LevelBank, T: int,
                      size_wh,
                      mask_positions: bool = True,
                      n_ori: int = 8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Score all K templates over all M positions of the coarsest level.

    lmflat: [8*T*T*M + M] uint8 (linear memories + M-byte zero pad).
    Returns (S [K, M] int32 raw scores masked to valid positions,
             positions [K] int32).
    """
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    off = _flat_offsets(bank, T, W, M, size_wh, n_ori)  # [K, N]

    def body(acc, off_n):  # off_n: [K]
        seg = jax.vmap(
            lambda o: jax.lax.dynamic_slice(lmflat, (o,), (M,))
        )(off_n)
        return acc + seg.astype(jnp.int32), None

    K = off.shape[0]
    acc0 = jnp.zeros((K, M), jnp.int32)
    S, _ = jax.lax.scan(body, acc0, off.T)

    # span/positions bookkeeping (line2Dup.cpp:816-825)
    wf = (bank.width - 1) // T + 1
    hf = (bank.height - 1) // T + 1
    span_x = W - wf
    span_y = H - hf
    positions = span_y * W + span_x + 1  # may be <= 0 for oversize templates
    if mask_positions:
        j = jnp.arange(M, dtype=jnp.int32)[None, :]
        S = jnp.where(j < positions[:, None], S, 0)
    return S, positions


def compact_indices(flags: jnp.ndarray, C: int):
    """Order-preserving compaction: indices of the first C set flags.

    TPU-native replacement for ``jnp.nonzero(size=C)``: XLA's scatter-based
    nonzero is effectively serial (~10 ns/element — 2 ms over a [1000, 4096]
    candidate map). Here: block any/count + cumsum, then each output slot
    finds its block by *searchsorted* over the block prefix sums (a [C, NB]
    masked reduction — pure VPU work), then its lane within the block the
    same way. Exact same result/order as nonzero.

    Returns (idx [C] int32 with fill=len(flags), n_total int32).
    """
    flat = flags.reshape(-1)
    total = flat.shape[0]
    nb = -(-total // 128)
    pad = nb * 128 - total
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    blocks = flat.reshape(nb, 128).astype(jnp.int32)
    cnt = jnp.sum(blocks, axis=1, dtype=jnp.int32)           # [NB]
    incl = jnp.cumsum(cnt)                                    # inclusive
    n_total = incl[-1]
    slots = jnp.arange(C, dtype=jnp.int32)
    # block b serves slot i iff excl[b] <= i < incl[b]; searchsorted form:
    blk_of = jnp.sum(incl[None, :] <= slots[:, None], axis=1,
                     dtype=jnp.int32)                         # [C]
    got = blk_of < nb
    blk_safe = jnp.minimum(blk_of, nb - 1)
    excl = incl - cnt
    j = slots - excl[blk_safe]                                # rank in block
    rows = blocks[blk_safe]                                   # [C, 128]
    lane_incl = jnp.cumsum(rows, axis=1)                      # [C, 128]
    lane = jnp.sum(lane_incl <= j[:, None], axis=1, dtype=jnp.int32)
    idx = jnp.where(got, blk_safe * 128 + lane, total)
    return idx, n_total


def _rmin_for_threshold(nfeat: jnp.ndarray, threshold):
    """Smallest integer raw score clearing `f32(S*100)/f32(4*nfeat) >
    threshold` per template (see extract_candidates), plus the f32
    normalizer 4*nfeat."""
    t4n = (4 * nfeat).astype(jnp.float32)
    approx = threshold * t4n / jnp.float32(100.0)
    base = jnp.floor(approx).astype(jnp.int32) - 1
    probes = jnp.maximum(base[:, None]
                         + jnp.arange(4, dtype=jnp.int32)[None, :], 0)
    ok = (probes * 100).astype(jnp.float32) / t4n[:, None] > threshold
    big = jnp.int32(1 << 30)
    rmin = jnp.min(jnp.where(ok, probes, big), axis=1)  # [K]
    return rmin, t4n


def coarse_cells_dispatch(lm: jnp.ndarray, lmflat: jnp.ndarray,
                          bank: LevelBank, T: int, size_wh,
                          use_pallas: bool | None = None,
                          chain=None, chain_desc=None):
    """Coarse scores WITHOUT the [K, M] i32 materialization.

    Returns (cells, positions, M): `cells` is [K, Mp >= M] in the
    kernel's NATIVE cell dtype — u8 for the byte-packed kernel, u16 for
    packed2, i32 otherwise — unmasked (pad cells j >= M and cells past
    `positions` are garbage; extract_candidates_cells excludes them).
    Feed to extract_candidates_cells; the [K, M] map never round-trips
    HBM at 4 bytes/cell (~327 MB at K=10k on a 1024^2 frame).

    `chain`/`chain_desc`: an optional delta-chain plan for dense banks
    (Detector._get_chain / ops.pallas.chain_plan) — bit-identical
    output, ~5x less kernel work on dense rotation sweeps.
    """
    w_img, h_img = size_wh
    M = (w_img // T) * (h_img // T)
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_pallas:
        if chain is not None:
            from .pallas.similarity_pallas import chain_coarse_cells

            cells, positions = chain_coarse_cells(
                lm, bank, chain, chain_desc, T, size_wh)
            return cells, positions, M
        from .pallas.similarity_pallas import coarse_similarity_pallas

        cells, positions = coarse_similarity_pallas(
            lm, bank, T, size_wh, mask_positions=False, raw_cells=True)
        return cells, positions, M
    n_ori = int(lm.shape[0])
    S, positions = coarse_similarity(lmflat, bank, T, size_wh,
                                     mask_positions=False, n_ori=n_ori)
    return S, positions, M


def _extract_rows(cells, pos_row, rmin_row, passable_row, quirk_row,
                  t4n, row_tmpl, T: int, W: int, C: int, M: int):
    """Candidate extraction over generic score ROWS (the shared core of
    extract_candidates_cells and extract_candidates_chain).

    `cells` is [R, Mp] native-dtype score cells; pos/rmin/passable/quirk
    are PER-ROW vectors. `row_tmpl` maps row -> template id (None means
    rows ARE templates, i.e. the identity — the extra gather folds
    away); `t4n` stays per-TEMPLATE for the final score normalize.
    Candidate order is flat (row, position) — template-major whenever
    row order follows template order.
    """
    R, Mp = cells.shape
    cell_max = jnp.int32(jnp.iinfo(cells.dtype).max)
    rmin_c = jnp.minimum(rmin_row, cell_max).astype(cells.dtype)

    j = jnp.arange(Mp, dtype=jnp.int32)[None, :]
    live = j < pos_row[:, None]
    above = (live & passable_row[:, None] & (cells >= rmin_c[:, None])) | (
        quirk_row[:, None] & ~live & (j < M))

    flat = above.reshape(-1)                         # [R * Mp] bool
    total = R * Mp
    nb = -(-total // 128)
    pad = nb * 128 - total
    if pad:  # Mp is 128-aligned in practice; keep the general case exact
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    cnt = jnp.sum(flat.reshape(nb, 128), axis=1, dtype=jnp.int32)  # [NB]
    incl = jnp.cumsum(cnt)
    n_above = incl[-1]

    # two-level searchsorted: superblocks of 128 blocks
    ns = -(-nb // 128)
    cnt_p = jnp.concatenate(
        [cnt, jnp.zeros((ns * 128 - nb,), jnp.int32)]) if ns * 128 != nb \
        else cnt
    sup = jnp.sum(cnt_p.reshape(ns, 128), axis=1, dtype=jnp.int32)
    sup_incl = jnp.cumsum(sup)
    slots = jnp.arange(C, dtype=jnp.int32)
    sb = jnp.sum(sup_incl[None, :] <= slots[:, None], axis=1,
                 dtype=jnp.int32)                    # [C]
    got = sb < ns
    sb_safe = jnp.minimum(sb, ns - 1)
    sup_excl = sup_incl - sup
    r1 = slots - sup_excl[sb_safe]                   # rank inside superblock
    blk_rows = cnt_p.reshape(ns, 128)[sb_safe]       # [C, 128]
    blk_incl = jnp.cumsum(blk_rows, axis=1)
    bi = jnp.sum(blk_incl <= r1[:, None], axis=1, dtype=jnp.int32)
    blk = sb_safe * 128 + jnp.minimum(bi, 127)       # global block id
    got &= blk < nb
    blk_safe = jnp.minimum(blk, nb - 1)
    blk_excl = blk_incl - blk_rows
    r2 = r1 - blk_excl[jnp.arange(C), jnp.minimum(bi, 127)]  # rank in block

    # re-derive the block's 128 flags from the cells (O(C*128) gathers).
    # NOTE: resist "optimizing" this into cells.reshape(-1, 128)[blk]
    # row gathers — on TPU the [R, Mp] -> [nb, 128] reshape crosses the
    # tiled (8, 128) layout and relayouts the WHOLE cell array
    # (measured +17 ms at K=10k, tools/exp_chain_cost.py round 3).
    lane128 = jnp.arange(128, dtype=jnp.int32)[None, :]
    gidx = blk_safe[:, None] * 128 + lane128         # [C, 128] flat index
    gidx_c = jnp.minimum(gidx, total - 1)
    gk = gidx_c // Mp
    gj = gidx_c % Mp
    gcell = cells[gk, gj].astype(jnp.int32)
    glive = gj < pos_row[gk]
    gabove = ((glive & passable_row[gk]
               & (gcell >= rmin_row[gk]))
              | (quirk_row[gk] & ~glive & (gj < M))) & (gidx < total)
    lane_incl = jnp.cumsum(gabove.astype(jnp.int32), axis=1)
    lane = jnp.sum(lane_incl <= r2[:, None], axis=1, dtype=jnp.int32)
    idx = jnp.where(got, blk_safe * 128 + jnp.minimum(lane, 127), total)

    got &= idx < total
    idx_safe = jnp.minimum(idx, total - 1)
    row = (idx_safe // Mp).astype(jnp.int32)
    jj = (idx_safe % Mp).astype(jnp.int32)
    raw = jnp.where(jj < pos_row[row], cells[row, jj].astype(jnp.int32), 0)
    if row_tmpl is None:
        k = row
    else:
        k = jnp.minimum(row_tmpl[row], t4n.shape[0] - 1)
    sc = (raw * 100).astype(jnp.float32) / t4n[k]
    offset = T // 2 + (T % 2 - 1)
    x = (jj % W) * T + offset
    y = (jj // W) * T + offset
    return k, x, y, sc, got, n_above


@partial(jax.jit, static_argnames=("T", "W", "C", "M"))
def extract_candidates_cells(cells: jnp.ndarray, positions: jnp.ndarray,
                             nfeat: jnp.ndarray, threshold,
                             T: int, W: int, C: int, M: int):
    """extract_candidates on NATIVE-dtype score cells (u8/u16/i32).

    Exactly the semantics of masking + extract_candidates on the i32
    map — (template, row-major position) candidate order, the integer
    rmin compare, and the negative-threshold quirk (cells past
    `positions` count as score 0, so they pass iff rmin <= 0, matching
    the reference's zero-initialized similarity Mat scan,
    line2Dup.cpp:1190-1204) — but in ONE fused pass over the packed
    cells plus O(C) gathers:

    * block counts: the >=rmin compare fuses into a 128-lane-block sum
      (never materializing the bool map),
    * candidate slots find their block by TWO-level searchsorted over
      block-count prefix sums (a [C, NB] masked reduction is O(C*K*M/128)
      — 670M ops at K=10k — so blocks group into 128-block superblocks
      first: O(C*NB/128 + C*256)),
    * each slot re-derives its lane from a [C, 128]-cell block gather.
    """
    rmin, t4n = _rmin_for_threshold(nfeat, threshold)
    cell_max = jnp.int32(jnp.iinfo(cells.dtype).max)
    passable = rmin <= cell_max                      # [K]
    quirk = rmin <= 0                                # [K]
    return _extract_rows(cells, positions, rmin, passable, quirk,
                         t4n, None, T, W, C, M)


def _invert_emit(emit: jnp.ndarray, R: int, K: int):
    """Row -> template inverse of the strictly-increasing emit map,
    scatter-free via searchsorted. Returns (row_tmpl [R] i32 with K at
    rows no template stores to, hit [R] bool). The `.at[emit].set`
    scatter this replaces crashes XLA:TPU's scatter-fusion pass at some
    shapes (ScatterEmitter::ShouldFuseInputIntoScatter check failure,
    observed at K=1000), and emit's strict monotonicity (asserted by
    the planner) makes the binary-search inverse exact."""
    r = jnp.arange(R, dtype=jnp.int32)
    k = jnp.searchsorted(emit.astype(jnp.int32), r).astype(jnp.int32)
    k_safe = jnp.minimum(k, K - 1)
    hit = (k < K) & (emit[k_safe] == r)
    return jnp.where(hit, k_safe, K), hit


@partial(jax.jit, static_argnames=("T", "W", "C", "M"))
def extract_candidates_chain(rows_cells: jnp.ndarray, emit: jnp.ndarray,
                             positions: jnp.ndarray, nfeat: jnp.ndarray,
                             threshold, T: int, W: int, C: int, M: int):
    """extract_candidates_cells directly on RAW chain sub-step rows.

    `rows_cells` is chain_coarse_rows' [R, Mp] output; template k's
    cells live at row emit[k] (strictly increasing — guaranteed by the
    planner), other rows are chain intermediates. Inverting emit into a
    row->template map and extracting on the raw rows skips the [K, Mp]
    emit-gather materialization entirely (+2.6 ms at K=10k on v5e);
    non-emit rows get never-passing parameters so they contribute no
    candidates and the candidate order stays template-major. Returns
    exactly extract_candidates_cells(rows_cells[emit], ...).
    """
    R = rows_cells.shape[0]
    K = nfeat.shape[0]
    rmin, t4n = _rmin_for_threshold(nfeat, threshold)
    cell_max = jnp.int32(jnp.iinfo(rows_cells.dtype).max)
    passable = rmin <= cell_max                      # [K]
    quirk = rmin <= 0                                # [K]
    big = jnp.full((1,), 1 << 30, jnp.int32)
    row_tmpl, _ = _invert_emit(emit, R, K)
    pos_row = jnp.concatenate(
        [positions.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])[row_tmpl]
    rmin_row = jnp.concatenate([rmin, big])[row_tmpl]
    passable_row = jnp.concatenate(
        [passable, jnp.zeros((1,), jnp.bool_)])[row_tmpl]
    quirk_row = jnp.concatenate(
        [quirk, jnp.zeros((1,), jnp.bool_)])[row_tmpl]
    return _extract_rows(rows_cells, pos_row, rmin_row, passable_row,
                         quirk_row, t4n, row_tmpl, T, W, C, M)


def _extract_words(words, pos_row, rmin_row, passable_row, quirk_row,
                   t4n, row_tmpl, unit: int, T: int, W: int, C: int,
                   M: int):
    """Candidate extraction on the packed-kernel's NATIVE i32 words —
    the layout-friendly twin of _extract_rows.

    `words` is [R, rows, 128] i32 straight from the coarse kernel (the
    array extract_candidates_cells sees as a bitcast u8/u16 view);
    `unit` is cells per word (4 = u8 cells, 2 = u16). Semantics,
    candidate ORDER (flat row-major cell order) and every returned
    value are bit-identical to _extract_rows on the bitcast cells.

    Why a second implementation: on TPU the cells view's [R, Mp] ->
    [nb, 128] reshape crosses the tiled (8, 128) layout, so the
    `above`-compare + block-count pass relayouts the whole score array
    (the dominant extraction cost at K=10k). Here a BLOCK is one tile
    row — 128 words = 128*unit cells, already lane-aligned — so the
    compare unpacks bytes with shifts and the block count is a plain
    minor-axis reduce: one fused pass over the words, no relayout.
    """
    R, rows, lanes = words.shape
    bits = 32 // unit
    vmask = (1 << bits) - 1
    Mp = rows * lanes * unit
    blk_cells = lanes * unit                         # cells per block

    # j of each word's cell 0: (tile_row * 128 + lane) * unit
    tr_l = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    ln_l = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    jbase = ((tr_l * lanes) + ln_l) * unit           # [rows, 128]

    pos_b = pos_row[:, None, None]
    pas_b = passable_row[:, None, None]
    qrk_b = quirk_row[:, None, None]
    rmin_b = rmin_row[:, None, None]

    def word_flags(w, jb):
        """Per-sub-cell pass flags of word array `w` (leading axes
        broadcast against the per-row params)."""
        flags = []
        for s in range(unit):
            v = (w >> (bits * s)) & vmask
            j = jb + s
            live = j < pos_b
            flags.append((live & pas_b & (v >= rmin_b))
                         | (qrk_b & ~live & (j < M)))
        return flags

    flags = word_flags(words, jbase[None])
    cnt_blk = sum(jnp.sum(f, axis=2, dtype=jnp.int32) for f in flags)
    bcnt = cnt_blk.reshape(-1)                       # [NB] block counts
    nb = R * rows
    incl = jnp.cumsum(bcnt)
    n_above = incl[-1]

    # two-level searchsorted over block prefix sums (same machinery as
    # _extract_rows, block size = one tile row)
    ns = -(-nb // 128)
    cnt_p = jnp.concatenate(
        [bcnt, jnp.zeros((ns * 128 - nb,), jnp.int32)]) if ns * 128 != nb \
        else bcnt
    sup = jnp.sum(cnt_p.reshape(ns, 128), axis=1, dtype=jnp.int32)
    sup_incl = jnp.cumsum(sup)
    slots = jnp.arange(C, dtype=jnp.int32)
    sb = jnp.sum(sup_incl[None, :] <= slots[:, None], axis=1,
                 dtype=jnp.int32)
    got = sb < ns
    sb_safe = jnp.minimum(sb, ns - 1)
    sup_excl = sup_incl - sup
    r1 = slots - sup_excl[sb_safe]
    blk_rows = cnt_p.reshape(ns, 128)[sb_safe]       # [C, 128]
    blk_incl = jnp.cumsum(blk_rows, axis=1)
    bi = jnp.sum(blk_incl <= r1[:, None], axis=1, dtype=jnp.int32)
    blk = sb_safe * 128 + jnp.minimum(bi, 127)
    got &= blk < nb
    blk_safe = jnp.minimum(blk, nb - 1)
    blk_excl = blk_incl - blk_rows
    r2 = r1 - blk_excl[jnp.arange(C), jnp.minimum(bi, 127)]

    # candidate blocks: row + tile row; gather each block's 128 words
    # (contiguous minor axis — no relayout)
    grow = blk_safe // rows                          # [C]
    gtr = blk_safe % rows
    gw = words[grow, gtr]                            # [C, 128] i32
    gjb = (gtr[:, None] * lanes
           + jnp.arange(lanes, dtype=jnp.int32)[None, :]) * unit
    gpos = pos_row[grow][:, None, None]
    gpas = passable_row[grow][:, None, None]
    gqrk = quirk_row[grow][:, None, None]
    grmin = rmin_row[grow][:, None, None]
    gflags = []
    for s in range(unit):
        v = (gw >> (bits * s)) & vmask
        j = gjb + s
        live = j < gpos[:, :, 0]
        gflags.append((live & gpas[:, :, 0] & (v >= grmin[:, :, 0]))
                      | (gqrk[:, :, 0] & ~live & (j < M)))
    # within-block cell order is (lane, sub-cell): lane-major
    per_lane = sum(f.astype(jnp.int32) for f in gflags)   # [C, 128]
    lane_incl = jnp.cumsum(per_lane, axis=1)
    lane = jnp.sum(lane_incl <= r2[:, None], axis=1, dtype=jnp.int32)
    lane_c = jnp.minimum(lane, lanes - 1)
    lane_excl = lane_incl - per_lane
    r3 = r2 - lane_excl[jnp.arange(C), lane_c]       # rank within lane
    sflags = jnp.stack(
        [f[jnp.arange(C), lane_c] for f in gflags], axis=1)  # [C, unit]
    s_incl = jnp.cumsum(sflags.astype(jnp.int32), axis=1)
    s_pick = jnp.sum(s_incl <= r3[:, None], axis=1, dtype=jnp.int32)
    s_safe = jnp.minimum(s_pick, unit - 1)
    got &= lane < lanes

    jj = gjb[jnp.arange(C), lane_c] + s_safe         # cell index in row
    wsel = gw[jnp.arange(C), lane_c]
    raw_v = (wsel >> (bits * s_safe)) & vmask
    raw = jnp.where(jj < pos_row[grow], raw_v, 0)
    if row_tmpl is None:
        k = grow
    else:
        k = jnp.minimum(row_tmpl[grow], t4n.shape[0] - 1)
    sc = (raw * 100).astype(jnp.float32) / t4n[k]
    offset = T // 2 + (T % 2 - 1)
    x = (jj % W) * T + offset
    y = (jj // W) * T + offset
    return k, x, y, sc, got, n_above


@partial(jax.jit, static_argnames=("unit", "T", "W", "C", "M"))
def extract_candidates_words(words: jnp.ndarray, positions: jnp.ndarray,
                             nfeat: jnp.ndarray, threshold, unit: int,
                             T: int, W: int, C: int, M: int):
    """extract_candidates_cells on the packed kernel's native i32 word
    tiles [K, rows, 128] (raw_words=True output) — bit-identical
    results, no layout-crossing reshapes (see _extract_words)."""
    rmin, t4n = _rmin_for_threshold(nfeat, threshold)
    cell_max = jnp.int32((1 << (32 // unit)) - 1)
    passable = rmin <= cell_max
    quirk = rmin <= 0
    return _extract_words(words, positions.astype(jnp.int32), rmin,
                          passable, quirk, t4n, None, unit, T, W, C, M)


@partial(jax.jit, static_argnames=("unit", "T", "W", "C", "M"))
def extract_candidates_chain_words(words: jnp.ndarray, emit: jnp.ndarray,
                                   positions: jnp.ndarray,
                                   nfeat: jnp.ndarray, threshold,
                                   unit: int, T: int, W: int, C: int,
                                   M: int):
    """extract_candidates_chain on the chain kernel's RAW word tiles
    [R, rows, 128] i32 (R = programs * sub-steps) — the fast path that
    needs neither the emit gather NOR a layout-crossing compare pass."""
    R = words.shape[0]
    K = nfeat.shape[0]
    rmin, t4n = _rmin_for_threshold(nfeat, threshold)
    cell_max = jnp.int32((1 << (32 // unit)) - 1)
    passable = rmin <= cell_max
    quirk = rmin <= 0
    big = jnp.full((1,), 1 << 30, jnp.int32)
    row_tmpl, _ = _invert_emit(emit, R, K)
    pos_row = jnp.concatenate(
        [positions.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])[row_tmpl]
    rmin_row = jnp.concatenate([rmin, big])[row_tmpl]
    passable_row = jnp.concatenate(
        [passable, jnp.zeros((1,), jnp.bool_)])[row_tmpl]
    quirk_row = jnp.concatenate(
        [quirk, jnp.zeros((1,), jnp.bool_)])[row_tmpl]
    return _extract_words(words, pos_row, rmin_row, passable_row,
                          quirk_row, t4n, row_tmpl, unit, T, W, C, M)


@partial(jax.jit, static_argnames=("unit", "T", "W", "C", "M"))
def extract_candidates_chain_counted(words: jnp.ndarray,
                                     kcnt: jnp.ndarray,
                                     emit: jnp.ndarray,
                                     positions: jnp.ndarray,
                                     nfeat: jnp.ndarray, threshold,
                                     unit: int, T: int, W: int, C: int,
                                     M: int):
    """Candidate extraction from the counted chain kernel's outputs —
    bit-identical results to extract_candidates_chain_words, but the
    full-words compare+count pass (the ~1.9 ms dominant extraction cost
    at K=10k, tools/exp_chain_cost.py W1) is replaced by the kernel's
    in-register counts plus O(C) per-candidate work.

    `kcnt[emit[k]]` is template k's live-pass count (cells with
    `j < positions[k] AND cell >= rmin[k]`, counted in-kernel from the
    finished tile). The negative-threshold quirk cells (j in [pos, M)
    when rmin <= 0) sit AFTER all live cells in j order, so their count
    is `M - clip(pos, 0, M)` and a quirk candidate's cell index is pure
    arithmetic — no word data needed (its raw score is 0 by the
    reference's zero-initialized similarity Mat scan,
    line2Dup.cpp:1190-1204). Blocks are whole TEMPLATES here (the
    kernel can only count whole tiles cheaply); a live candidate
    re-derives its cell by a three-level descent over its template's
    own word tile: per-row counts -> row, per-lane counts -> lane,
    sub-cell flags -> cell. All descent stages recompute the SAME
    live-pass predicate the kernel counted, so ranks align exactly.
    """
    R = words.shape[0]
    K = nfeat.shape[0]
    rmin, t4n = _rmin_for_threshold(nfeat, threshold)
    pos = positions.astype(jnp.int32)
    quirk = rmin <= 0

    # per-block (= per-template output row) counts; unstored rows hold
    # garbage -> mask by the emit inverse (scatter-free, see
    # _invert_emit: the .at[emit] forms crash XLA:TPU scatter fusion at
    # some shapes)
    row_tmpl, ref = _invert_emit(emit, R, K)
    rt_safe = jnp.minimum(row_tmpl, K - 1)
    live_cnt = jnp.where(ref, kcnt, 0)
    qcnt_k = jnp.where(quirk, M - jnp.clip(pos, 0, M), 0)
    bcnt = live_cnt + jnp.where(ref, qcnt_k[rt_safe], 0)
    return _extract_counted_core(words, bcnt, live_cnt, row_tmpl, pos,
                                 rmin, t4n, unit, T, W, C, M)


@partial(jax.jit, static_argnames=("unit", "T", "W", "C", "M"))
def extract_candidates_words_counted(words: jnp.ndarray,
                                     kcnt: jnp.ndarray,
                                     positions: jnp.ndarray,
                                     nfeat: jnp.ndarray, threshold,
                                     unit: int, T: int, W: int, C: int,
                                     M: int):
    """extract_candidates_chain_counted for the PLAIN counted kernel,
    where output row r IS template r — scatter-free (the `.at[emit]`
    scatters of the chain variant crash XLA:TPU's scatter-fusion pass
    at some shapes: ScatterEmitter::ShouldFuseInputIntoScatter check
    failure at K=1000; identity emit needs no scatters at all)."""
    rmin, t4n = _rmin_for_threshold(nfeat, threshold)
    pos = positions.astype(jnp.int32)
    quirk = rmin <= 0
    qcnt_k = jnp.where(quirk, M - jnp.clip(pos, 0, M), 0)
    bcnt = kcnt + qcnt_k
    return _extract_counted_core(words, bcnt, kcnt, None, pos, rmin,
                                 t4n, unit, T, W, C, M)


def _searchsorted_blocks(bcnt: jnp.ndarray, C: int):
    """Two-level searchsorted of C candidate slots over per-block
    counts: returns (blk [C] block index clipped to R-1, rank [C] rank
    within block, got [C] slot-live flags, n_above total count)."""
    R = bcnt.shape[0]
    incl = jnp.cumsum(bcnt)
    n_above = incl[-1]
    ns = -(-R // 128)
    cnt_p = jnp.concatenate(
        [bcnt, jnp.zeros((ns * 128 - R,), jnp.int32)]) if ns * 128 != R \
        else bcnt
    sup = jnp.sum(cnt_p.reshape(ns, 128), axis=1, dtype=jnp.int32)
    sup_incl = jnp.cumsum(sup)
    slots = jnp.arange(C, dtype=jnp.int32)
    sb = jnp.sum(sup_incl[None, :] <= slots[:, None], axis=1,
                 dtype=jnp.int32)
    got = sb < ns
    sb_safe = jnp.minimum(sb, ns - 1)
    sup_excl = sup_incl - sup
    r1 = slots - sup_excl[sb_safe]
    blk_rows = cnt_p.reshape(ns, 128)[sb_safe]       # [C, 128]
    blk_incl = jnp.cumsum(blk_rows, axis=1)
    bi = jnp.sum(blk_incl <= r1[:, None], axis=1, dtype=jnp.int32)
    blk = sb_safe * 128 + jnp.minimum(bi, 127)
    got &= blk < R
    blk = jnp.minimum(blk, R - 1)
    blk_excl = blk_incl - blk_rows
    rank = r1 - blk_excl[jnp.arange(C), jnp.minimum(bi, 127)]
    return blk, rank, got, n_above


@partial(jax.jit, static_argnames=("T", "W", "C", "M"))
def extract_candidates_wide_counted(words: jnp.ndarray,
                                    kcnt: jnp.ndarray,
                                    positions: jnp.ndarray,
                                    nfeat: jnp.ndarray, threshold,
                                    T: int, W: int, C: int, M: int):
    """Counted extraction for the WIDE kernel's even/odd u16 layout.

    `words` is [K, 2, rows, 128] i32 from
    coarse_words_pallas_wide_counted: cell j of template k lives at
    plane e = j%4 & 1 (0 = even bytes, 1 = odd), word (row, lane) =
    divmod(j//4, 128), u16 half s = (j%4) >> 1 — i.e.
    j = (row*128 + lane)*4 + 2*s + e. Same candidate order, same
    returned values as every other extraction (template-major, j
    ascending): the descent enumerates the four (s, e) sub-cells of a
    word pair in j order (e0s0, e1s0, e0s1, e1s1)."""
    K = nfeat.shape[0]
    _, _, rows, lanes = words.shape
    rmin, t4n = _rmin_for_threshold(nfeat, threshold)
    pos = positions.astype(jnp.int32)
    quirk = rmin <= 0
    qcnt_k = jnp.where(quirk, M - jnp.clip(pos, 0, M), 0)
    bcnt = kcnt + qcnt_k

    grow, r1, got, n_above = _searchsorted_blocks(bcnt, C)
    k = grow
    pos_c = pos[k][:, None, None]                    # [C, 1, 1]
    rmin_c = rmin[k][:, None, None]
    lcnt_c = kcnt[grow]
    is_quirk = r1 >= lcnt_c

    # live candidates: row -> lane -> (s, e) descent over the
    # candidate's own word pair tile, recomputing the SAME live-pass
    # predicate the kernel counted so ranks align exactly
    gw = words[grow]                                 # [C, 2, rows, 128]
    tr = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    ln = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    jb4 = ((tr * lanes) + ln) * 4                    # [rows, 128]
    c_w = jnp.zeros((C, rows, lanes), jnp.int32)
    for e in range(2):
        for s in range(2):
            v = (gw[:, e] >> (16 * s)) & 0xFFFF
            c_w += ((jb4[None] + (2 * s + e) < pos_c)
                    & (v >= rmin_c)).astype(jnp.int32)
    r1l = jnp.where(is_quirk, 0, r1)
    row_sum = jnp.sum(c_w, axis=2, dtype=jnp.int32)  # [C, rows]
    row_incl = jnp.cumsum(row_sum, axis=1)
    rp = jnp.sum(row_incl <= r1l[:, None], axis=1, dtype=jnp.int32)
    rp_c = jnp.minimum(rp, rows - 1)
    ar = jnp.arange(C)
    r2 = r1l - (row_incl[ar, rp_c] - row_sum[ar, rp_c])
    c_row = c_w[ar, rp_c]                            # [C, 128]
    lane_incl = jnp.cumsum(c_row, axis=1)
    lp = jnp.sum(lane_incl <= r2[:, None], axis=1, dtype=jnp.int32)
    lp_c = jnp.minimum(lp, lanes - 1)
    r3 = r2 - (lane_incl[ar, lp_c] - c_row[ar, lp_c])
    w_e = gw[ar, 0, rp_c, lp_c]                      # [C] even-byte word
    w_o = gw[ar, 1, rp_c, lp_c]
    jw = ((rp_c * lanes) + lp_c) * 4
    sflags = []
    svals = []
    for d in range(4):                               # j offset = d
        e, s = d & 1, d >> 1
        v = ((w_o if e else w_e) >> (16 * s)) & 0xFFFF
        svals.append(v)
        sflags.append((jw + d < pos[k]) & (v >= rmin[k]))
    s_incl = jnp.cumsum(jnp.stack(sflags, axis=1).astype(jnp.int32),
                        axis=1)
    sp = jnp.sum(s_incl <= r3[:, None], axis=1, dtype=jnp.int32)
    s_safe = jnp.minimum(sp, 3)
    jj_live = jw + s_safe
    raw_live = jnp.take_along_axis(jnp.stack(svals, axis=1),
                                   s_safe[:, None], axis=1)[:, 0]

    # quirk candidates: cells [clip(pos,0,M), M) in order, raw score 0
    jq = jnp.clip(pos[k], 0, M) + (r1 - lcnt_c)
    jj = jnp.where(is_quirk, jq, jj_live)
    raw = jnp.where(is_quirk, 0, raw_live)

    sc = (raw * 100).astype(jnp.float32) / t4n[k]
    offset = T // 2 + (T % 2 - 1)
    x = (jj % W) * T + offset
    y = (jj // W) * T + offset
    return k, x, y, sc, got, n_above


def _extract_counted_core(words, bcnt, live_cnt, row_tmpl, pos, rmin,
                          t4n, unit: int, T: int, W: int, C: int,
                          M: int):
    """Shared tail of the counted extractions: two-level searchsorted
    over per-template block counts, then a row->lane->sub-cell descent
    over each candidate's own word tile. `row_tmpl=None` means rows ARE
    templates (the plain kernel)."""
    R, rows, lanes = words.shape
    K = pos.shape[0]
    bits = 32 // unit
    vmask = (1 << bits) - 1

    grow, r1, got, n_above = _searchsorted_blocks(bcnt, C)

    if row_tmpl is None:
        k = grow
    else:
        k = jnp.minimum(row_tmpl[grow], K - 1)
    pos_c = pos[k][:, None, None]                    # [C, 1, 1]
    rmin_c = rmin[k][:, None, None]
    lcnt_c = live_cnt[grow]
    is_quirk = r1 >= lcnt_c

    # live candidates: three-level descent over the template's words
    gw = words[grow]                                 # [C, rows, 128]
    tr = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    ln = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    jb = ((tr * lanes) + ln) * unit                  # [rows, 128]
    c_w = jnp.zeros(gw.shape, jnp.int32)
    for s in range(unit):
        v = (gw >> (bits * s)) & vmask
        c_w += ((jb[None] + s < pos_c) & (v >= rmin_c)).astype(jnp.int32)
    r1l = jnp.where(is_quirk, 0, r1)
    row_sum = jnp.sum(c_w, axis=2, dtype=jnp.int32)  # [C, rows]
    row_incl = jnp.cumsum(row_sum, axis=1)
    rp = jnp.sum(row_incl <= r1l[:, None], axis=1, dtype=jnp.int32)
    rp_c = jnp.minimum(rp, rows - 1)
    ar = jnp.arange(C)
    r2 = r1l - (row_incl[ar, rp_c] - row_sum[ar, rp_c])
    c_row = c_w[ar, rp_c]                            # [C, 128]
    lane_incl = jnp.cumsum(c_row, axis=1)
    lp = jnp.sum(lane_incl <= r2[:, None], axis=1, dtype=jnp.int32)
    lp_c = jnp.minimum(lp, lanes - 1)
    r3 = r2 - (lane_incl[ar, lp_c] - c_row[ar, lp_c])
    word = gw[ar, rp_c, lp_c]                        # [C]
    jw = ((rp_c * lanes) + lp_c) * unit
    sflags = []
    for s in range(unit):
        v = (word >> (bits * s)) & vmask
        sflags.append((jw + s < pos[k]) & (v >= rmin[k]))
    s_incl = jnp.cumsum(jnp.stack(sflags, axis=1).astype(jnp.int32),
                        axis=1)
    sp = jnp.sum(s_incl <= r3[:, None], axis=1, dtype=jnp.int32)
    s_safe = jnp.minimum(sp, unit - 1)
    jj_live = jw + s_safe
    raw_live = (word >> (bits * s_safe)) & vmask

    # quirk candidates: cells [clip(pos,0,M), M) in order, raw score 0
    jq = jnp.clip(pos[k], 0, M) + (r1 - lcnt_c)
    jj = jnp.where(is_quirk, jq, jj_live)
    raw = jnp.where(is_quirk, 0, raw_live)

    sc = (raw * 100).astype(jnp.float32) / t4n[k]
    offset = T // 2 + (T % 2 - 1)
    x = (jj % W) * T + offset
    y = (jj // W) * T + offset
    return k, x, y, sc, got, n_above


def counted_extract_enabled() -> bool:
    """In-kernel threshold counts + counted extraction on the chain
    route. SBM_NO_COUNTED_EXTRACT=1 falls back to the full-words
    compare pass (extract_candidates_chain_words)."""
    import os
    return os.environ.get("SBM_NO_COUNTED_EXTRACT", "") != "1"


def words_extract_enabled() -> bool:
    """Extraction on the kernels' native i32 word tiles (no bitcast
    views, no layout-crossing reshapes). SBM_NO_WORDS_EXTRACT=1 is the
    escape hatch back to the u8/u16 cells route."""
    import os
    return os.environ.get("SBM_NO_WORDS_EXTRACT", "") != "1"


def coarse_route(bank: LevelBank, T: int, size_wh, n_ori: int = 8,
                 chain: bool = False, use_pallas=None) -> str:
    """Which coarse kernel route coarse_extract_dispatch will take for
    this (bank, frame) config — 'chain' | 'wide' | 'packed4' | 'packed2'
    | 'cells'. Pure host-side predicate mirroring the dispatch
    conditions (kept adjacent so they can't drift: any new route must
    appear in both). Used for bench/DETAIL route tags so a recorded ms
    is attributable to the kernel that produced it."""
    import os

    if use_pallas is None:
        use_pallas = use_pallas_default()
    if not (use_pallas and words_extract_enabled()):
        return "cells"
    if chain:
        return "chain"
    w_img, h_img = size_wh
    W = w_img // T
    M = W * (h_img // T)
    C = n_ori * T * T
    N_slots = int(bank.fx.shape[1])
    M_pad = -(-(M + max(W, 1)) // 4096) * 4096
    if 4 * (C + 1) * M_pad > 36 * 2**20:
        return "cells"
    n4 = N_slots * 4
    if n4 <= 255:
        return "packed4"
    if n4 > 65535:
        return "cells"
    if (counted_extract_enabled()
            and os.environ.get("SBM_NO_WIDE", "") != "1"):
        return "wide"
    return "packed2"


def coarse_extract_dispatch(lm, lmflat, bank: LevelBank, T: int, size_wh,
                            threshold, cand_cap: int, use_pallas=None,
                            chain=None, chain_desc=None):
    """Coarse scoring + candidate extraction in one call, routed to the
    fastest bit-identical path:

    * delta-chain plan + Pallas: chain kernel's RAW word rows ->
      extract_candidates_chain_words (no emit gather, no bitcast),
    * packed Pallas kernel: native word tiles -> extract_candidates_words,
    * otherwise: cells/i32-map route (XLA fallback, stitch kernel,
      SBM_NO_WORDS_EXTRACT=1).

    Returns (k, x, y, sc, valid, n_above)."""
    w_img, h_img = size_wh
    W = w_img // T
    M = W * (h_img // T)
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_pallas and words_extract_enabled():
        if chain is not None:
            if counted_extract_enabled():
                from .pallas.similarity_pallas import (
                    chain_coarse_word_rows_counted)

                rmin, _ = _rmin_for_threshold(bank.nfeat, threshold)
                words, kcnt, positions = chain_coarse_word_rows_counted(
                    lm, bank, chain, chain_desc, T, size_wh, rmin)
                return extract_candidates_chain_counted(
                    words, kcnt, chain.emit, positions, bank.nfeat,
                    threshold, chain_desc.unit, T, W, cand_cap, M)
            from .pallas.similarity_pallas import chain_coarse_word_rows

            words, positions = chain_coarse_word_rows(
                lm, bank, chain, chain_desc, T, size_wh)
            return extract_candidates_chain_words(
                words, chain.emit, positions, bank.nfeat, threshold,
                chain_desc.unit, T, W, cand_cap, M)
        if counted_extract_enabled():
            from .pallas.similarity_pallas import (
                coarse_words_pallas_counted,
                coarse_words_pallas_wide_counted)

            rmin, _ = _rmin_for_threshold(bank.nfeat, threshold)
            resw = coarse_words_pallas_wide_counted(lm, bank, T,
                                                    size_wh, rmin)
            if resw is not None:
                words, kcnt, positions = resw
                return extract_candidates_wide_counted(
                    words, kcnt, positions, bank.nfeat, threshold,
                    T, W, cand_cap, M)
            resc = coarse_words_pallas_counted(lm, bank, T, size_wh,
                                               rmin)
            if resc is not None:
                words, kcnt, positions, unit = resc
                return extract_candidates_words_counted(
                    words, kcnt, positions, bank.nfeat, threshold,
                    unit, T, W, cand_cap, M)
        from .pallas.similarity_pallas import coarse_words_pallas

        res = coarse_words_pallas(lm, bank, T, size_wh)
        if res is not None:
            words, positions, unit = res
            return extract_candidates_words(
                words, positions, bank.nfeat, threshold, unit, T, W,
                cand_cap, M)
    cells, positions, M = coarse_cells_dispatch(
        lm, lmflat, bank, T, size_wh, use_pallas, chain=chain,
        chain_desc=chain_desc)
    return extract_candidates_cells(cells, positions, bank.nfeat,
                                    threshold, T, W, cand_cap, M)


def coarse_candidates(lm: jnp.ndarray, lmflat: jnp.ndarray,
                      bank: LevelBank, T: int, size_wh, threshold, C: int,
                      use_pallas: bool | None = None):
    """Coarse scoring + candidate extraction in one go: native-dtype
    cells -> extract_candidates_cells (the fast path everywhere the
    full score map isn't needed). Returns (k, x, y, sc, valid, n_above)."""
    cells, positions, M = coarse_cells_dispatch(lm, lmflat, bank, T,
                                                size_wh, use_pallas)
    W = size_wh[0] // T
    return extract_candidates_cells(cells, positions, bank.nfeat,
                                    threshold, T, W, C, M)


@partial(jax.jit, static_argnames=("T", "W", "C"))
def extract_candidates(S: jnp.ndarray, nfeat: jnp.ndarray, threshold,
                       T: int, W: int, C: int):
    """Threshold + candidate compaction (line2Dup.cpp:1200-1216).

    Candidates keep the reference's (template, row-major position) order via
    nonzero compaction (cheaper on TPU than top_k: one cumsum + scatter).
    Returns (k, x, y, score, valid, n_above) arrays of length C; n_above is
    the true count of positions above threshold (host checks overflow and
    escalates C on overflow so no candidate is ever silently dropped).
    """
    K, M = S.shape
    # Exact integer reformulation of `f32(S*100)/f32(4*nfeat) > threshold`:
    # the f32 score is monotone in the integer raw S, so per template there
    # is a smallest raw rmin that clears the threshold; find it by probing
    # the f32 formula around the real-arithmetic boundary (+-2 is far beyond
    # the f32 rounding error of quantities < 2^25). The [K, M] map then
    # needs only an integer compare — no f32 conversion/division per cell.
    t4n = (4 * nfeat).astype(jnp.float32)
    approx = threshold * t4n / jnp.float32(100.0)
    base = jnp.floor(approx).astype(jnp.int32) - 1
    probes = jnp.maximum(base[:, None]
                         + jnp.arange(4, dtype=jnp.int32)[None, :], 0)
    ok = (probes * 100).astype(jnp.float32) / t4n[:, None] > threshold
    big = jnp.int32(1 << 30)
    rmin = jnp.min(jnp.where(ok, probes, big), axis=1)  # [K]
    above = S >= rmin[:, None]
    idx, n_above = compact_indices(above, C)
    got = idx < K * M
    idx_safe = jnp.minimum(idx, K * M - 1)
    k = (idx_safe // M).astype(jnp.int32)
    sc = (S.reshape(-1)[idx_safe] * 100).astype(jnp.float32) / t4n[k]
    j = idx_safe % M
    offset = T // 2 + (T % 2 - 1)
    x = (j % W) * T + offset
    y = (j // W) * T + offset
    return k, x, y, sc, got, n_above


@partial(jax.jit, static_argnames=("K", "D"))
def distinct_templates(k: jnp.ndarray, valid: jnp.ndarray, K: int, D: int):
    """Compact the distinct template ids among valid candidates.

    Returns (slots [D] template ids with K as fill, slot_of_k [K] slot index,
    n_distinct).
    """
    present = jnp.zeros((K,), bool).at[jnp.where(valid, k, 0)].max(valid)
    slots_raw, n_distinct = compact_indices(present, D)
    slots = jnp.minimum(slots_raw, K).astype(jnp.int32)
    # slot_of_k = -1 for templates without a slot: overflow (n_distinct > D)
    # then safely INVALIDATES those candidates instead of mis-mapping them;
    # callers escalate D on overflow for full parity. rank = the template's
    # position among present ids (== its compacted slot when rank < D).
    rank = jnp.cumsum(present.astype(jnp.int32)) - 1
    slot_of_k = jnp.where(present & (rank < D), rank, -1).astype(jnp.int32)
    return slots, slot_of_k, n_distinct


def gather_bank(bank: LevelBank, slots: jnp.ndarray) -> LevelBank:
    """Sub-bank for the given template slots (id K -> all-invalid row)."""
    K = bank.fx.shape[0]
    safe = jnp.minimum(slots, K - 1)
    live = slots < K
    return LevelBank(
        fx=bank.fx[safe],
        fy=bank.fy[safe],
        label=bank.label[safe],
        valid=bank.valid[safe] & live[:, None],
        nfeat=bank.nfeat[safe],
        width=jnp.where(live, bank.width[safe], 1),
        height=jnp.where(live, bank.height[safe], 1),
    )


@partial(jax.jit, static_argnames=("T", "size_wh"))
def refine_from_maps(Sfull: jnp.ndarray, slot_of_k: jnp.ndarray,
                     bank: LevelBank, T: int, size_wh,
                     k: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     valid: jnp.ndarray, threshold):
    """Pyramid refinement using full fine-level score maps.

    `Sfull` [D, M] holds UNMASKED fine score maps for the distinct candidate
    templates. Under the border clamp (line2Dup.cpp:1239-1245) no feature is
    ever dropped and all linear-memory reads stay in-plane, so the 16×16
    local similarity (line2Dup.cpp:860-922) is exactly a window of the full
    map: patch[rr, cc] = Sfull[slot, (cy//T-8+rr)*W + (cx//T-8+cc)].
    """
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    border = 8 * T
    offset = T // 2 + (T % 2 - 1)

    width_k = bank.width[k]
    height_k = bank.height[k]
    nfeat_k = bank.nfeat[k].astype(jnp.float32)
    max_x = w_img - width_k - border
    max_y = h_img - height_k - border
    cx = jnp.minimum(jnp.maximum(x * 2 + 1, border), max_x)
    cy = jnp.minimum(jnp.maximum(y * 2 + 1, border), max_y)

    wx = cx // T - 8  # window origin in decimated grid
    wy = cy // T - 8
    rr = jnp.arange(16, dtype=jnp.int32)
    slot = slot_of_k[k]
    valid = valid & (slot >= 0)
    base = jnp.maximum(slot, 0) * M + wy * W + wx  # [C]
    idx = (base[:, None, None] + rr[None, :, None] * W
           + rr[None, None, :])  # [C, 16, 16]
    flat = Sfull.reshape(-1)
    patch = flat[jnp.clip(idx, 0, flat.shape[0] - 1)]  # [C, 16, 16]

    pf = patch.reshape(patch.shape[0], 256)
    best = jnp.argmax(pf, axis=1).astype(jnp.int32)
    raw = jnp.take_along_axis(pf, best[:, None], axis=1)[:, 0]
    sim = raw.astype(jnp.float32) * 100.0 / (4.0 * nfeat_k)
    nx = (wx + best % 16) * T + offset
    ny = (wy + best // 16) * T + offset
    nvalid = valid & (sim >= threshold)
    return k, nx, ny, sim, nvalid


@partial(jax.jit, static_argnames=("T", "size_wh"))
def refine_candidates(lmflat: jnp.ndarray, bank: LevelBank, T: int, size_wh,
                      k: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                      valid: jnp.ndarray, threshold):
    """One pyramid refinement step for all candidates at once.

    Implements the candidate loop of matchClass (line2Dup.cpp:1221-1293):
    doubling, border clamping, 16×16 local similarity, argmax update,
    threshold filter. All candidates (across all templates) batch together.
    """
    w_img, h_img = size_wh
    W, H = w_img // T, h_img // T
    M = W * H
    # invalid features route to the M-byte zero pad at the buffer's end;
    # derived from the buffer so 16-orientation stacks work too
    L = lmflat.shape[0] - M
    border = 8 * T
    offset = T // 2 + (T % 2 - 1)

    width_k = bank.width[k]
    height_k = bank.height[k]
    nfeat_k = bank.nfeat[k].astype(jnp.float32)
    max_x = w_img - width_k - border
    max_y = h_img - height_k - border

    cx = jnp.minimum(jnp.maximum(x * 2 + 1, border), max_x)
    cy = jnp.minimum(jnp.maximum(y * 2 + 1, border), max_y)

    off_x = (cx // T - 8) * T  # [C]
    off_y = (cy // T - 8) * T

    fx = bank.fx[k] + off_x[:, None]  # [C, N]
    fy = bank.fy[k] + off_y[:, None]
    inb = (
        bank.valid[k]
        & (fx >= 0) & (fx < w_img) & (fy >= 0) & (fy < h_img)
    )
    plane = bank.label[k] * (T * T) + (fy % T) * T + (fx % T)
    base = plane * M + (fy // T) * W + (fx // T)
    base = jnp.where(inb, base, L).astype(jnp.int32)  # [C, N]

    rr = jnp.arange(16, dtype=jnp.int32)
    # window positions kept FLAT [256] so the [.., N, 256] gather tiles
    # cleanly (a trailing [16, 16] pads 16 -> 128 lanes: 8x the memory)
    patch_off = (rr[:, None] * W + rr[None, :]).reshape(-1)  # [256]
    clip_hi = lmflat.shape[0] - 1

    def _patch_sum(base_c):
        idx = base_c[:, :, None] + patch_off[None, None, :]  # [c, N, 256]
        g = lmflat[jnp.clip(idx, 0, clip_hi)].astype(jnp.int32)
        return jnp.sum(g, axis=1)  # [c, 256]

    C_, N_ = base.shape
    if C_ * N_ <= 1 << 18:
        flat = _patch_sum(base)  # one shot: [C, N, 256] stays < ~256 MB
    else:
        # wide banks (8191-feature mode, line2Dup.cpp:811) x many
        # candidates: the one-shot gather materializes C*N*256 i32
        # (19 GB at 256 cand x 9126 slots) — chunk the CANDIDATE axis;
        # per-candidate feature sums are untouched, so results stay
        # bit-identical to the one-shot form.
        chunk = max(1, (1 << 18) // N_)
        Cp = -(-C_ // chunk) * chunk
        base_p = jnp.pad(base, ((0, Cp - C_), (0, 0)))
        flat = jax.lax.map(
            _patch_sum, base_p.reshape(Cp // chunk, chunk, N_)
        ).reshape(Cp, 256)[:C_]
    best = jnp.argmax(flat, axis=1).astype(jnp.int32)  # first max (C++ strict >)
    raw = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    sim = raw.astype(jnp.float32) * 100.0 / (4.0 * nfeat_k)
    best_r = best // 16
    best_c = best % 16
    nx = (cx // T - 8 + best_c) * T + offset
    ny = (cy // T - 8 + best_r) * T + offset
    nvalid = valid & (sim >= threshold)
    return k, nx, ny, sim, nvalid
