"""Subpixel / ICP sim2 pose refinement on matched edge points.

The reference repo's README points at its icp2D/subpixel/sim3 branches
(README.md:8-10: "icp 0.1-0.5 degree accuracy", "subpixel under 0.1
degree", "sim3 to handle scale") — the branches are not in the mounted
tree, so this is a from-scratch TPU-native design for the same
capability (BASELINE.json "production batch": subpixel/ICP sim3 pose
refine), not a port:

* scene edge extraction reuses the bit-exact LINE-2D frontend
  (blur/sobel) plus a gradient-direction non-max suppression —
  one fused device pass;
* nearest-edge correspondences come from a JUMP-FLOOD nearest-seed
  field (log2(R) passes of 9 static shifted min-selects — no kd-tree,
  no data-dependent control flow), giving every pixel the offset to
  its nearest edge pixel and that edge's unit normal;
* each ICP iteration solves the POINT-TO-PLANE least squares for a
  similarity transform directly (the residual n·(T(p) - q) is LINEAR
  in the sim2 parameters (a, b, tx, ty) = (s·cos, s·sin, t)), so one
  4x4 solve per candidate per iteration — batched over all matches
  with vmap, iterated with lax.scan. No Gauss-Newton damping needed.

Angle/scale fall out as atan2(b, a) / hypot(a, b). Accuracy contract
(tests/test_icp.py): pose recovered within 0.1 degree / 0.5% scale /
0.35 px median point error on clean synthetic warps — the README-claimed
"subpixel" accuracy tier.

Relationship to models/refine.py: refine_detections is the coarser
point-to-POINT Procrustes refiner (window-searched correspondences,
also offers a 6-DOF affine model, ~0.5-0.7 degree envelope); this module
is the high-precision sim2 backend (point-to-plane + subpixel edges +
O(1) jump-flood correspondences). Use refine_detections for affine/
robust cases, refine_matches_icp when subpixel pose matters.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import gaussian_blur7_u8, sobel3_f32
from ..utils.dispatch import counted_jit


class IcpResult(NamedTuple):
    """Refined pose per match: scene_pt = R(dtheta)*dscale*(templ_pt) +
    (tx, ty), where templ_pt is in the matched template's frame."""

    dtheta_deg: jnp.ndarray  # [C] residual rotation (degrees, CCW)
    dscale: jnp.ndarray      # [C] residual scale
    tx: jnp.ndarray          # [C] refined template-origin x (subpixel)
    ty: jnp.ndarray          # [C]
    rmse: jnp.ndarray        # [C] point-to-plane RMS residual (px)
    inliers: jnp.ndarray     # [C] int32 correspondences in the last iter
    valid: jnp.ndarray       # [C] bool — enough inliers to trust


def edge_nearest_field(src: jnp.ndarray, weak_threshold, radius: int = 8):
    """Scene edge field for ICP: (offset-to-nearest-edge [H, W, 2] i32,
    edge normal [H, W, 2] f32, edge mask [H, W] bool).

    Edges are gradient-magnitude local maxima ALONG the gradient
    direction (canny-style NMS on the LINE-2D frontend's blur+sobel),
    thresholded at the detector's weak threshold. The nearest-seed field
    runs jump flooding: passes at strides radius/2..1 propagate each
    pixel's best-known seed from 8 neighbors — O(log R) static shifted
    min-selects, exact within `radius`.

    THREE compiled programs (frontend, flood, epilogue) on the CPU
    backend: XLA CPU duplicates the flood's 32 chained pad/slice/select
    updates into every downstream consumer — one fused program (or even
    flood+epilogue, whose off/has each re-consume the seed planes) blows
    the HLO up ~40x and a 1 MP frame takes MINUTES on CPU instead of
    <1 s. jax.lax.optimization_barrier does not survive compilation to
    stop it. Measured split cost: ~2 s/MP frame total on 1 CPU
    (frontend 1.1 s, flood 0.7 s, epilogue 0.1 s).

    ONE fused program elsewhere: through a high-latency transport the
    per-frame cost of a host-facing deployment loop is dominated by
    (program count) x (per-dispatch overhead) — utils/dispatch.py — so
    accelerator backends run the whole field as a single jit
    (SBM_ICP_FUSED=0/1 overrides the backend default; parity is pinned
    by tests and the on-chip suite).
    """
    if _use_fused_field():
        return _edge_field_fused(src, weak_threshold, radius=radius)
    edge, normal, subpix = _edge_frontend(src, weak_threshold)
    seed_r, seed_c = _jump_flood(edge, radius=radius)
    off, has = _flood_epilogue(seed_r, seed_c, radius=radius)
    return off, normal, edge, has, subpix


def _use_fused_field() -> bool:
    import os

    env = os.environ.get("SBM_ICP_FUSED")
    if env is not None:
        return env not in ("0", "", "false")
    return jax.default_backend() != "cpu"


@partial(jax.jit, static_argnames=("radius",))
def _edge_field_fused_impl(src, weak_threshold, radius: int = 8):
    edge, normal, subpix = _edge_frontend_impl(src, weak_threshold)
    seed_r, seed_c = _jump_flood_impl(edge, radius)
    off, has = _flood_epilogue_impl(seed_r, seed_c, radius)
    return off, normal, edge, has, subpix


_edge_field_fused = counted_jit(_edge_field_fused_impl, "icp_field_fused")


def _edge_frontend_impl(src: jnp.ndarray, weak_threshold):
    smoothed = gaussian_blur7_u8(src)
    dx = sobel3_f32(smoothed, dx=True)
    dy = sobel3_f32(smoothed, dx=False)
    mag = dx * dx + dy * dy
    h, w = mag.shape

    # gradient-direction NMS: compare against the two neighbors along
    # the dominant direction (8-way quantized)
    ang = jnp.arctan2(dy, dx)  # [-pi, pi]
    octant = jnp.round(ang / (jnp.pi / 4)).astype(jnp.int32) % 4
    padm = jnp.pad(mag, 1, constant_values=-1.0)

    def shift(dr, dc):
        return jax.lax.dynamic_slice(padm, (1 + dr, 1 + dc), (h, w))

    n0 = [shift(0, 1), shift(1, 1), shift(1, 0), shift(1, -1)]
    n1 = [shift(0, -1), shift(-1, -1), shift(-1, 0), shift(-1, 1)]
    fwd = jnp.select([octant == i for i in range(4)], n0)
    bwd = jnp.select([octant == i for i in range(4)], n1)
    thr = jnp.asarray(weak_threshold, jnp.float32) ** 2
    edge = (mag > thr) & (mag >= fwd) & (mag >= bwd)

    inv = jnp.sqrt(jnp.maximum(mag, 1e-12))
    normal = jnp.stack([dx / inv, dy / inv], axis=-1)  # unit gradient

    # SUBPIXEL edge localization: parabola through the |g| profile along
    # the (8-way quantized) gradient direction — the peak offset moves
    # the edge off the integer raster (the "subpixel" capability of the
    # reference's branches; integer edges bias ICP rotations ~0.1 deg)
    g0 = jnp.sqrt(jnp.maximum(mag, 0.0))
    gf = jnp.sqrt(jnp.maximum(fwd, 0.0))
    gb = jnp.sqrt(jnp.maximum(bwd, 0.0))
    denom = gb - 2.0 * g0 + gf
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      0.5 * (gb - gf) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    step_x = jnp.select([octant == i for i in range(4)],
                        [jnp.float32(v) for v in (1.0, 1.0, 0.0, -1.0)])
    step_y = jnp.select([octant == i for i in range(4)],
                        [jnp.float32(v) for v in (0.0, 1.0, 1.0, 1.0)])
    subpix = jnp.stack([delta * step_x, delta * step_y], axis=-1)
    return edge, normal, subpix


_edge_frontend = counted_jit(jax.jit(_edge_frontend_impl), "icp_frontend")


def _jump_flood_impl(edge: jnp.ndarray, radius: int = 8):
    """Nearest-seed field by jump flooding (see edge_nearest_field)."""
    h, w = edge.shape
    # jump flooding: seed coords propagate toward every pixel
    big = jnp.int32(1 << 20)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    seed_r = jnp.where(edge, rows, big)
    seed_c = jnp.where(edge, cols, big)

    def dist2(sr, sc):
        dr = (sr - rows).astype(jnp.float32)
        dc = (sc - cols).astype(jnp.float32)
        return jnp.where(sr >= big, jnp.float32(1e18), dr * dr + dc * dc)

    s = 1
    strides = []
    while s < radius:
        s *= 2
    while s >= 1:
        strides.append(s)
        s //= 2
    for s in strides:
        best = dist2(seed_r, seed_c)
        for dr in (-s, 0, s):
            for dc in (-s, 0, s):
                if dr == 0 and dc == 0:
                    continue
                pr = jnp.pad(seed_r, ((s, s), (s, s)), constant_values=big)
                pc = jnp.pad(seed_c, ((s, s), (s, s)), constant_values=big)
                cr = jax.lax.dynamic_slice(pr, (s + dr, s + dc), (h, w))
                cc = jax.lax.dynamic_slice(pc, (s + dr, s + dc), (h, w))
                d = dist2(cr, cc)
                take = d < best
                best = jnp.where(take, d, best)
                seed_r = jnp.where(take, cr, seed_r)
                seed_c = jnp.where(take, cc, seed_c)

    return seed_r, seed_c


_jump_flood = counted_jit(
    jax.jit(_jump_flood_impl, static_argnames=("radius",)), "icp_flood")


def _flood_epilogue_impl(seed_r, seed_c, radius: int = 8):
    """Seed planes -> (offset-to-nearest [H, W, 2], within-radius mask)."""
    h, w = seed_r.shape
    big = jnp.int32(1 << 20)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    off = jnp.stack([jnp.where(seed_c >= big, 0, seed_c - cols),
                     jnp.where(seed_r >= big, 0, seed_r - rows)],
                    axis=-1).astype(jnp.int32)  # (dx, dy)
    has = (seed_r < big) & (jnp.abs(off[..., 0]) <= radius) \
        & (jnp.abs(off[..., 1]) <= radius)
    return off, has


_flood_epilogue = counted_jit(
    jax.jit(_flood_epilogue_impl, static_argnames=("radius",)),
    "icp_epilogue")


def _icp_refine_points_impl(off, normal, has, subpix, pts, origins,
                            pt_valid, iters: int = 12, radius: int = 8,
                            min_inliers: int = 8) -> IcpResult:
    """Batched sim2 point-to-plane ICP.

    off/normal/has/subpix: the edge_nearest_field outputs.
    pts: [C, N, 2] f32 template edge points (template frame).
    origins: [C, 2] f32 initial template origins in the scene (the
    LINE-2D match position). pt_valid: [C, N] bool feature mask.
    """
    h, w = has.shape

    def lookup(field, yy, xx):
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        return field[yy, xx]

    def one(pts_c, origin, pv):
        # state: (a, b, tx, ty) with scene = [a -b; b a] @ p + t
        init = jnp.array([1.0, 0.0, origin[0], origin[1]], jnp.float32)

        def step(state, _):
            a, b, tx, ty = state
            px, py = pts_c[:, 0], pts_c[:, 1]
            qx = a * px - b * py + tx
            qy = b * px + a * py + ty
            ix = jnp.round(qx).astype(jnp.int32)
            iy = jnp.round(qy).astype(jnp.int32)
            o = lookup(off, iy, ix)               # [N, 2] (dx, dy)
            ok = lookup(has, iy, ix) & pv
            ei = ix + o[:, 0]                     # nearest edge pixel
            ej = iy + o[:, 1]
            n = lookup(normal, ej, ei)            # [N, 2]
            sp = lookup(subpix, ej, ei)           # [N, 2] subpixel shift
            ex = ei.astype(jnp.float32) + sp[:, 0]
            ey = ej.astype(jnp.float32) + sp[:, 1]
            # residual r = n . (T(p) - e); reject far correspondences
            d2 = (qx - ex) ** 2 + (qy - ey) ** 2
            ok &= d2 <= jnp.float32(radius * radius)
            wgt = ok.astype(jnp.float32)
            nx, ny = n[:, 0], n[:, 1]
            # linear system rows: r = M @ (a, b, tx, ty) - n.e
            M = jnp.stack([nx * px + ny * py,
                           -nx * py + ny * px,
                           nx, ny], axis=1)       # [N, 4]
            rhs = nx * ex + ny * ey               # [N]
            A = (M * wgt[:, None]).T @ M          # 4x4
            v = (M * wgt[:, None]).T @ rhs
            n_in = jnp.sum(ok)
            # Tikhonov anchor toward the current state when degenerate
            lam = jnp.float32(1e-3)
            A = A + lam * jnp.eye(4, dtype=jnp.float32)
            v = v + lam * state
            new = jnp.linalg.solve(A, v)
            new = jnp.where(n_in >= min_inliers, new, state)
            r = (M @ new - rhs) * wgt
            rmse = jnp.sqrt(jnp.sum(r * r)
                            / jnp.maximum(n_in, 1).astype(jnp.float32))
            return new, (rmse, n_in)

        state, (rmses, n_ins) = jax.lax.scan(step, init, None,
                                             length=iters)
        a, b, tx, ty = state
        return (jnp.degrees(jnp.arctan2(b, a)), jnp.hypot(a, b), tx, ty,
                rmses[-1], n_ins[-1].astype(jnp.int32),
                n_ins[-1] >= min_inliers)

    outs = jax.vmap(one)(pts, origins, pt_valid)
    return IcpResult(*outs)


icp_refine_points = counted_jit(
    jax.jit(_icp_refine_points_impl,
            static_argnames=("iters", "radius", "min_inliers")),
    "icp_refine_points")


def _pack_icp_result_impl(res: IcpResult):
    """Stack the 7 per-match fields into ONE [7, C] f32 array so the
    host pays a single D2H transfer. jax.device_get on the NamedTuple
    pulls 7 leaves = 7 tunnel round trips — measured ~26 ms of the
    78 ms host deployment loop (tools/profile_production.py, v5e).
    inliers is an int32 feature count <= 8191, exact in f32."""
    return jnp.stack([res.dtheta_deg, res.dscale, res.tx, res.ty,
                      res.rmse, res.inliers.astype(jnp.float32),
                      res.valid.astype(jnp.float32)])


_pack_icp_result = counted_jit(jax.jit(_pack_icp_result_impl),
                               "icp_pack_result")


def _template_icp_points(detector, class_id: str, template_id: int):
    """Level-0 feature coordinates of one template as a [n, 2] f32
    array, cached on the detector (keyed (class_id, template_id);
    Detector._invalidate_banks drops the class's entries on retrain).
    The per-feature Python loop this replaces cost ~3.8 ms per
    32-match refine call (tools/profile_production.py)."""
    import numpy as np

    cache = getattr(detector, "_icp_pts", None)
    if cache is None:
        cache = {}
        try:
            detector._icp_pts = cache
        except AttributeError:
            pass
    key = (class_id, template_id)
    pts = cache.get(key)
    if pts is None:
        feats = detector.get_templates(class_id, template_id)[0].features
        pts = np.array([(f.x, f.y) for f in feats],
                       np.float32).reshape(-1, 2)
        cache[key] = pts
    return pts


def refine_matches_icp(detector, source, matches, iters: int = 12,
                       radius: int = 8):
    """Host convenience: sim2-refine a list of LINE-2D Matches against
    `source`. Returns a list of dicts ({match, dtheta_deg, dscale, tx,
    ty, rmse, inliers, valid}); the refined SUBPIXEL template origin is
    (tx, ty), and the total pose composes the matched template's trained
    angle/scale metadata with the residual (dtheta, dscale)."""
    import numpy as np

    if not matches:
        return []
    if isinstance(source, jax.Array) and source.ndim == 2:
        src = source  # device-resident gray frame: no host round trip
    else:
        src = jnp.asarray(np.asarray(source))
        if src.ndim == 3:
            from ..utils.verify import bgr2gray_u8

            src = jnp.asarray(bgr2gray_u8(np.asarray(source)))
    off, normal, edge, has, subpix = edge_nearest_field(
        src, detector._f32(detector.weak_threshold), radius)

    # the edge-field programs run while the host packs template points
    plist = [_template_icp_points(detector, m.class_id, m.template_id)
             for m in matches]
    N = max(p.shape[0] for p in plist)
    C = len(matches)
    pts = np.zeros((C, N, 2), np.float32)
    pv = np.zeros((C, N), bool)
    for i, p in enumerate(plist):
        pts[i, :p.shape[0]] = p
        pv[i, :p.shape[0]] = True
    origins = np.array([(m.x, m.y) for m in matches], np.float32)
    res = icp_refine_points(off, normal, has, subpix, jnp.asarray(pts),
                            jnp.asarray(origins), jnp.asarray(pv),
                            iters=iters, radius=radius)
    # ONE device->host transfer for the whole result struct; per-leaf
    # device_get (let alone per-scalar float(res.x[i]) pulls) pays the
    # tunnel round trip once per field.
    host = np.asarray(_pack_icp_result(res))
    out = []
    for i, m in enumerate(matches):
        out.append({
            "match": m,
            "dtheta_deg": float(host[0, i]),
            "dscale": float(host[1, i]),
            "tx": float(host[2, i]),
            "ty": float(host[3, i]),
            "rmse": float(host[4, i]),
            "inliers": int(host[5, i]),
            "valid": bool(host[6, i]),
        })
    return out


def _refine_packed_impl(off, normal, has, subpix, bank_fx, bank_fy,
                        bank_valid, k, x, y, sc, valid,
                        top_c: int = 32, iters: int = 12,
                        radius: int = 8, min_inliers: int = 8):
    """Device-side candidate selection + sim2 ICP refine for ONE frame's
    packed match arrays (the match_batch as_matches=False layout:
    k/x/y/sc/valid each [C]).

    Selects the top_c highest-score valid candidates with lax.top_k,
    gathers their level-0 template edge points straight from the packed
    LevelBank (bank_fx/fy/valid [K, N] — already device-resident), and
    batch-refines. No Match objects, no host sync: the deployment
    pipeline (detect -> refine) stays on device end to end.

    Returns (IcpResult [top_c], kk [top_c] selected template ids,
    ox, oy [top_c] integer match origins, top_sc [top_c] LINE-2D
    scores). Rows past the number of valid candidates have
    valid=False and top_sc=-inf.
    """
    score = jnp.where(valid, sc, -jnp.inf)
    top_sc, idx = jax.lax.top_k(score, top_c)
    kk = k[idx]
    pts = jnp.stack([bank_fx[kk], bank_fy[kk]], axis=-1).astype(jnp.float32)
    pv = bank_valid[kk] & jnp.isfinite(top_sc)[:, None]
    ox, oy = x[idx], y[idx]
    origins = jnp.stack([ox, oy], axis=-1).astype(jnp.float32)
    res = _icp_refine_points_impl(off, normal, has, subpix, pts, origins,
                                  pv, iters=iters, radius=radius,
                                  min_inliers=min_inliers)
    res = res._replace(valid=res.valid & jnp.isfinite(top_sc))
    return res, kk, ox, oy, top_sc


refine_packed_candidates = counted_jit(
    jax.jit(_refine_packed_impl,
            static_argnames=("top_c", "iters", "radius", "min_inliers")),
    "icp_refine_packed")


def _pack_refined_rows(res, kk, ox, oy, sc, ovf):
    """One class's refined outputs as the 13-row packed layout (see
    _pack_refined_classes)."""
    return jnp.stack([
        res.dtheta_deg, res.dscale, res.tx, res.ty, res.rmse,
        res.inliers.astype(jnp.float32),
        res.valid.astype(jnp.float32),
        kk.astype(jnp.float32),
        ox.astype(jnp.float32),
        oy.astype(jnp.float32),
        jnp.where(jnp.isfinite(sc), sc, jnp.float32(-1.0)),
        jnp.isfinite(sc).astype(jnp.float32),
        jnp.broadcast_to(ovf.astype(jnp.float32), kk.shape),
    ])


@jax.jit
def _pack_refined_classes(groups):
    """Pack per-class refined outputs into ONE [n_cls, 13, top_c] f32
    tensor for a single device->host sync. Rows: IcpResult's 7 fields,
    then template id, origin x, origin y, LINE-2D score, a live flag
    (isfinite(score)), and the class overflow flag broadcast. Integer
    fields (ids <= 2^24, pixel origins) are exact in f32."""
    return jnp.stack([_pack_refined_rows(*g) for g in groups])


@partial(jax.jit, static_argnames=("top_c", "iters", "radius",
                                   "min_inliers"))
def _refine_pack_classes_impl(off, normal, has, subpix, class_inputs,
                              top_c: int = 32, iters: int = 12,
                              radius: int = 8, min_inliers: int = 8):
    """Every class's candidate selection + sim2 refine + result packing
    as ONE device program. Per-frame deployment cost through a
    high-latency transport is (program count) x (per-dispatch overhead)
    (utils/dispatch.py), so the one-sync path fuses the per-class
    refine programs (1 per class) and the pack program into a single
    jit. class_inputs: tuple per class of (bank_fx, bank_fy, bank_valid,
    k, x, y, sc, valid, overflow) — shapes static per class set.
    Returns the _pack_refined_classes [n_cls, 13, top_c] layout."""
    rows = []
    for (fx, fy, bv, k, x, y, sc, valid, ovf) in class_inputs:
        res, kk, ox, oy, top_sc = _refine_packed_impl(
            off, normal, has, subpix, fx, fy, bv, k, x, y, sc, valid,
            top_c=top_c, iters=iters, radius=radius,
            min_inliers=min_inliers)
        rows.append(_pack_refined_rows(res, kk, ox, oy, top_sc, ovf))
    return jnp.stack(rows)


_refine_pack_classes = counted_jit(_refine_pack_classes_impl,
                                   "icp_refine_pack_classes")


def match_icp(detector, source, threshold: float, class_ids=None,
              top_c: int = 32, iters: int = 12, radius: int = 8,
              cand_cap: int = 256):
    """ONE-SYNC deployment loop: detect + subpixel/ICP-refine a frame
    and return host dicts (the refine_matches_icp schema) in a single
    device->host round trip.

    The 1:1 port of the reference's jabil flow (test_jabil.cpp:121-312)
    — det.match() then refine_matches_icp(matches[:N]) — blocks on the
    tunnel TWICE per frame: once to pull match candidates (the host
    needs them to build the ICP inputs) and once to pull poses. Each
    blocking sync costs whatever the tunnel's round-trip latency is
    that session (measured 3-25 ms; tools/profile_production.py), so
    the two-sync shape dominates the loop. This keeps candidate
    selection (lax.top_k) and template-point gathering (LevelBank rows)
    on device — refine_packed_candidates — and pulls match + pose
    results together.

    Selection differs from the host flow in one way: `top_c` highest-
    score candidates are refined PER CLASS (device top-k), where the
    host flow typically slices one global sorted list. Results come
    back sorted by (similarity desc, template_id) across classes.

    A class whose candidate count overflows `cand_cap` falls back to
    the exact two-sync path for that class (rare; identical results).
    """
    source, cids, dev = _match_icp_dispatch(
        detector, source, threshold, class_ids, top_c=top_c,
        iters=iters, radius=radius, cand_cap=cand_cap)
    return _match_icp_collect(detector, source, cids, dev, threshold,
                              top_c=top_c, iters=iters, radius=radius)


def _match_icp_dispatch(detector, source, threshold: float, class_ids=None,
                        top_c: int = 32, iters: int = 12, radius: int = 8,
                        cand_cap: int = 256):
    """Dispatch phase of match_icp: enqueue every device program for a
    frame (match, edge field, per-class refine, result packing) and
    return without blocking on the device. Returns (source_dev, cids,
    packed_device_tensor) — the tensor is `_pack_refined_classes`'s
    [n_cls, 13, top_c] layout, still on device; cids == [] means no
    trained classes."""
    import numpy as np

    if not isinstance(source, jax.Array):
        source = jnp.asarray(np.asarray(source))
    if source.ndim != 2:
        raise ValueError("match_icp expects a gray [H, W] frame")
    packed = detector.match_batch(source[None], threshold, class_ids,
                                  cand_cap=cand_cap, as_matches=False)
    if not packed:
        return source, [], None
    wt = detector._f32(detector.weak_threshold)
    off, normal, _edge, has, subpix = edge_nearest_field(
        source, wt, radius)

    cids = list(packed.keys())
    class_inputs = []
    for cid in cids:
        k, x, y, sc, valid, overflow = packed[cid]
        bank0 = detector._get_banks(cid)[0]
        class_inputs.append((bank0.fx, bank0.fy, bank0.valid,
                             k[0], x[0], y[0], sc[0], valid[0],
                             overflow[0]))
    dev = _refine_pack_classes(off, normal, has, subpix,
                               tuple(class_inputs), top_c=top_c,
                               iters=iters, radius=radius)
    return source, cids, dev


def _match_icp_collect(detector, source, cids, dev, threshold: float,
                       top_c: int = 32, iters: int = 12, radius: int = 8):
    """Collect phase of match_icp: the ONE blocking device->host sync
    plus host-side decoding (Match objects, overflow fallback, sort)."""
    import numpy as np

    from .detector import Match

    if not cids:
        return []

    from ..utils.dispatch import count as _dispatch_count

    _dispatch_count("d2h_pulls")
    host = np.asarray(dev)  # ONE sync

    out = []
    for ci, cid in enumerate(cids):
        if host[ci, 12, 0] >= 0.5:
            # overflow: exact escalating fallback for this class only
            matches = detector.match(source, threshold, [cid])
            out.extend(refine_matches_icp(detector, source,
                                          matches[:top_c],
                                          iters=iters, radius=radius))
            continue
        seen = set()
        for j in range(host.shape[2]):
            if host[ci, 11, j] < 0.5:
                continue  # dead top-k slot (fewer than top_c candidates)
            m = Match(int(host[ci, 8, j]), int(host[ci, 9, j]),
                      float(host[ci, 10, j]), cid, int(host[ci, 7, j]))
            key = (m.x, m.y, m.similarity, m.class_id, m.template_id)
            if key in seen:  # duplicates _sort_dedup would collapse
                continue
            seen.add(key)
            out.append({
                "match": m,
                "dtheta_deg": float(host[ci, 0, j]),
                "dscale": float(host[ci, 1, j]),
                "tx": float(host[ci, 2, j]),
                "ty": float(host[ci, 3, j]),
                "rmse": float(host[ci, 4, j]),
                "inliers": int(host[ci, 5, j]),
                "valid": bool(host[ci, 6, j] >= 0.5),
            })
    out.sort(key=lambda d: d["match"].sort_key())
    return out


class MatchIcpHandle:
    """In-flight match_icp result: the device programs are already
    enqueued; `.result()` performs the one blocking device->host sync
    and host decode (memoized). Lets a streaming loop overlap frame
    N's device compute with frame N-1's result pull — see
    match_icp_async."""

    __slots__ = ("_detector", "_source", "_cids", "_dev", "_args",
                 "_result")

    def __init__(self, detector, source, cids, dev, args):
        self._detector = detector
        self._source = source
        self._cids = cids
        self._dev = dev
        self._args = args
        self._result = None

    def result(self):
        """Block on the one device->host sync; returns the match_icp
        result list (same schema, memoized)."""
        if self._result is None:
            threshold, top_c, iters, radius = self._args
            self._result = _match_icp_collect(
                self._detector, self._source, self._cids, self._dev,
                threshold, top_c=top_c, iters=iters, radius=radius)
            self._detector = self._source = self._dev = None  # free
        return self._result


def match_icp_async(detector, source, threshold: float, class_ids=None,
                    top_c: int = 32, iters: int = 12, radius: int = 8,
                    cand_cap: int = 256):
    """Non-blocking match_icp: dispatch every device program for this
    frame and return a MatchIcpHandle immediately (zero host syncs —
    JAX dispatch is async; the device works while the host moves on).

    The per-frame deployment cost model is `device compute +
    n_blocking_syncs x sync latency` (docs/SCALING.md). match_icp pays
    1 sync SERIALLY after compute; a pipelined loop hides compute under
    the previous frame's sync:

        prev = None
        for frame in stream:
            h = det.match_icp_async(frame, thr)
            if prev is not None:
                consume(prev.result())   # frame N computes during this
            prev = h
        consume(prev.result())

    Results are identical to match_icp (same programs, same one-sync
    collect — tests/test_icp.py pins parity).

    Measured caveat (docs/SCALING.md "Per-frame host APIs"): through a
    TUNNELED device transport the steady-state pipelined loop runs ~4x
    SLOWER than sequential match_icp (165.7 vs 38.6 ms/frame,
    reproduced back-to-back) — with a frame always in flight, every
    dispatch pays contended tunnel latency. Use this API on
    directly-attached hardware (dispatch ~free, sync ~0.1 ms) where
    only the compute/sync overlap matters; on a tunnel prefer
    match_icp or match_refine_batch."""
    source, cids, dev = _match_icp_dispatch(
        detector, source, threshold, class_ids, top_c=top_c,
        iters=iters, radius=radius, cand_cap=cand_cap)
    return MatchIcpHandle(detector, source, cids, dev,
                          (threshold, top_c, iters, radius))


def match_refine_batch(detector, frames, threshold: float, class_ids=None,
                       top_c: int = 32, iters: int = 12, radius: int = 8,
                       cand_cap: int = 256):
    """Device-complete detect + subpixel-refine pipeline.

    The production deployment loop (the reference's match -> icp2D
    branches flow, README.md:8-10) without any host round trip between
    the stages: LINE-2D match_batch (packed device output), device-side
    top-k candidate selection, and batched sim2 point-to-plane ICP all
    stay on device; the caller decides when (whether) to pull results.

    frames: uint8 [B, H, W] gray (numpy or device-resident).
    Returns {class_id: list over B frames of dicts of DEVICE arrays
    {icp: IcpResult, k, x, y, score, overflow}} — one jax.device_get of
    the whole structure is the only transfer a consumer needs.
    """
    import numpy as np

    if not isinstance(frames, jax.Array):
        frames = jnp.asarray(np.asarray(frames))
    if frames.ndim != 3:
        raise ValueError("match_refine_batch expects gray [B, H, W] frames")
    packed = detector.match_batch(frames, threshold, class_ids,
                                  cand_cap=cand_cap, as_matches=False)
    wt = detector._f32(detector.weak_threshold)
    B = frames.shape[0]
    # frames OUTER: each frame's edge field (~20 MB of full-resolution
    # offset/normal/subpix planes at 1 MP) is shared by every class,
    # then dropped before the next frame's is built — device memory
    # stays O(1) in B instead of holding B field sets live. The fields
    # are deliberately NOT folded into one jit with the refine — see
    # edge_nearest_field's three-program note.
    out = {class_id: [] for class_id in packed}
    banks0 = {class_id: detector._get_banks(class_id)[0]
              for class_id in packed}
    for b in range(B):
        off, normal, _edge, has, subpix = edge_nearest_field(
            frames[b], wt, radius)
        for class_id, (k, x, y, sc, valid, overflow) in packed.items():
            bank0 = banks0[class_id]
            res, kk, ox, oy, top_sc = refine_packed_candidates(
                off, normal, has, subpix, bank0.fx, bank0.fy, bank0.valid,
                k[b], x[b], y[b], sc[b], valid[b], top_c=top_c,
                iters=iters, radius=radius)
            out[class_id].append({"icp": res, "k": kk, "x": ox, "y": oy,
                                  "score": top_sc,
                                  "overflow": overflow[b]})
    return out
