"""Host-side wall attribution for one match_icp frame.

tools/profile_icp_device.py showed the ICP device programs cost ~0.06
ms/frame (queue-pipelined), yet match_icp measures ~50 ms/frame — the
cost is HOST work (Python dispatch path) + blocking syncs, not device
compute. This splits the per-frame wall of the dispatch phase into its
Python sections (all synchronous host code — safe to wall-clock
directly) and times the collect sync separately:

  match_batch   — Detector.match_batch(as_matches=False) call wall
  edge_field    — edge_nearest_field dispatch wall
  build_inputs  — class_inputs assembly (bank lookups)
  refine_pack   — _refine_pack_classes dispatch wall
  collect       — np.asarray(dev) sync + host decode

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/profile_match_icp_host.py [num_templates num_features]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def main():
    num_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    num_features = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from shape_based_matching_tpu.models import icp
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=num_features)
    frame = jax.device_put(synthetic_scene(1024, 1024, templ_img,
                                           n_instances=4, seed=7))
    jax.block_until_ready(frame)

    # warm every program
    r = det.match_icp(frame, 85.0, top_c=32)
    print(f"warm: {len(r)} refined matches", flush=True)

    n = 30
    stages = {k: [] for k in ("match_batch", "edge_field", "build_inputs",
                              "refine_pack", "collect", "whole")}
    for _ in range(n):
        t0 = time.perf_counter()
        packed = det.match_batch(frame[None], 85.0, None,
                                 cand_cap=256, as_matches=False)
        t1 = time.perf_counter()
        wt = det._f32(det.weak_threshold)
        off, normal, _e, has, subpix = icp.edge_nearest_field(frame, wt, 8)
        t2 = time.perf_counter()
        cids = list(packed.keys())
        class_inputs = []
        for cid in cids:
            k, x, y, sc, valid, overflow = packed[cid]
            bank0 = det._get_banks(cid)[0]
            class_inputs.append((bank0.fx, bank0.fy, bank0.valid,
                                 k[0], x[0], y[0], sc[0], valid[0],
                                 overflow[0]))
        t3 = time.perf_counter()
        dev = icp._refine_pack_classes(off, normal, has, subpix,
                                       tuple(class_inputs), top_c=32,
                                       iters=12, radius=8)
        t4 = time.perf_counter()
        out = icp._match_icp_collect(det, frame, cids, dev, 85.0,
                                     top_c=32, iters=12, radius=8)
        t5 = time.perf_counter()
        stages["match_batch"].append(t1 - t0)
        stages["edge_field"].append(t2 - t1)
        stages["build_inputs"].append(t3 - t2)
        stages["refine_pack"].append(t4 - t3)
        stages["collect"].append(t5 - t4)
        stages["whole"].append(t5 - t0)

    print(f"\nper-frame host walls over {n} frames (median / min, ms):")
    for k, v in stages.items():
        v = sorted(v)
        print(f"  {k:13s} {1e3 * v[len(v) // 2]:8.3f} / {1e3 * v[0]:8.3f}")
    assert out is not None


if __name__ == "__main__":
    main()
