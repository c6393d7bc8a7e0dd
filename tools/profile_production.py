"""Attribute the host deployment-loop gap (VERDICT r3 weak #3).

production_batch (match -> Match objects -> refine_matches_icp) measured
76.4 ms vs 22.1 ms for the device-complete match_refine_batch. This
splits the host path into its serialized stages — each stage already
blocks in the real flow, so per-stage walls here ARE the deployment
loop's structure (unlike device-pipeline stage timing, which CLAUDE.md
bans):

  match        Detector.match (B=1 program + packed pull + Match build)
  sortdedup    _sort_dedup share of match (measured separately)
  build_pts    host loop packing template points for the ICP call
  edge_field   edge_nearest_field (3 device programs)
  icp          icp_refine_points dispatch + block
  pull         jax.device_get of the IcpResult

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/profile_production.py [n_templates n_features]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    num_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    num_features = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from shape_based_matching_tpu.models.icp import (_pack_icp_result,
                                                     edge_nearest_field,
                                                     icp_refine_points,
                                                     refine_matches_icp)
    from shape_based_matching_tpu.models.detector import _sort_dedup
    from shape_based_matching_tpu.utils import dispatch
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=num_features)
    frame = synthetic_scene(1024, 1024, templ_img, n_instances=4, seed=7)
    dev_frame = jax.device_put(frame)
    jax.block_until_ready(dev_frame)

    def once():
        matches = det.match(dev_frame, 85.0)
        return refine_matches_icp(det, dev_frame, matches[:32])

    res = once()  # compile everything
    assert res

    # whole-loop reference (matches bench.py production_batch)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            once()
        best = min(best, (time.perf_counter() - t0) / 10 * 1e3)
    print(f"whole production_batch: {best:.2f} ms")

    with dispatch.measure(transfers=True) as counts:
        once()
    print(f"dispatch counts per loop: {counts}")

    # stage walls (serialized, like the real flow) — min over reps
    stages = {}

    def rec(name, t0):
        dt = (time.perf_counter() - t0) * 1e3
        stages[name] = min(stages.get(name, float("inf")), dt)
        return time.perf_counter()

    wt = det._f32(det.weak_threshold)
    for _ in range(10):
        t = time.perf_counter()
        matches = det.match(dev_frame, 85.0)
        t = rec("match", t)
        _ = _sort_dedup(list(matches))
        t = rec("sortdedup_extra", t)
        m32 = matches[:32]
        N = max(len(det.get_templates(m.class_id, m.template_id)[0]
                    .features) for m in m32)
        C = len(m32)
        pts = np.zeros((C, N, 2), np.float32)
        pv = np.zeros((C, N), bool)
        origins = np.zeros((C, 2), np.float32)
        for i, m in enumerate(m32):
            t0l = det.get_templates(m.class_id, m.template_id)[0]
            for j, f in enumerate(t0l.features):
                pts[i, j] = (f.x, f.y)
                pv[i, j] = True
            origins[i] = (m.x, m.y)
        t = rec("build_pts", t)
        off, normal, edge, has, subpix = edge_nearest_field(
            dev_frame, wt, 8)
        jax.block_until_ready((off, normal, has, subpix))
        t = rec("edge_field", t)
        r = icp_refine_points(off, normal, has, subpix, jnp.asarray(pts),
                              jnp.asarray(origins), jnp.asarray(pv),
                              iters=12, radius=8)
        jax.block_until_ready(r)
        t = rec("icp", t)
        np.asarray(_pack_icp_result(r))
        t = rec("pull_packed", t)
        jax.device_get(r)
        t = rec("pull_7leaf", t)
    total = sum(stages.values())
    print(f"\nstage walls (min over 10 reps), sum {total:.2f} ms:")
    for k, v in sorted(stages.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v:8.2f} ms  ({100 * v / total:4.1f}%)")
    print(f"matches: {len(matches)}")


if __name__ == "__main__":
    main()
