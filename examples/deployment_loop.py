"""Deployment-loop tiers: how many device syncs per frame do you pay?

A per-frame host-facing detect + subpixel-ICP-refine loop costs
`device compute + n_blocking_syncs x sync latency`. Three equivalent
APIs (same results, docs/SCALING.md "Composition and deployment"):

  2 syncs  det.match() -> refine_matches_icp()   the 1:1 port of the
           reference's jabil driver flow (test_jabil.cpp:121-312)
  1 sync   det.match_icp()                       one-call detect+refine:
           candidate top-k + template points stay on device, match and
           pose results pull together
  1 sync,  det.match_icp_async()                 pipelined: dispatch
  hidden                                         frame N+1 before pulling
                                                 frame N — compute hides
                                                 under the previous sync
  0/frame  match_refine_batch()                  device-complete; sync
           once per batch, whenever the consumer wants

Usage: python examples/deployment_loop.py [n_frames]
"""

import sys
import time

import jax
import numpy as np

from shape_based_matching_tpu.models.icp import (match_refine_batch,
                                                 refine_matches_icp)
from shape_based_matching_tpu.utils.synthetic import (
    build_rotated_detector, synthetic_scene)


def main(n_frames: int = 3, num_templates: int = 90, hw: int = 512) -> None:
    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=63,
                                            size=min(256, hw // 2))
    frame = jax.device_put(
        synthetic_scene(hw, hw, templ_img, n_instances=3, seed=7))
    jax.block_until_ready(frame)

    # --- tier 1: the two-sync port of the reference's driver loop ----
    def host_loop():
        matches = det.match(frame, 85.0)
        return refine_matches_icp(det, frame, matches[:16])

    # --- tier 2: one-call, one-sync -----------------------------------
    def one_sync():
        return det.match_icp(frame, 85.0, top_c=16)

    # --- tier 2b: pipelined per-frame (dispatch N+1, then pull N) -----
    def pipelined(n):
        out = []
        prev = None
        for _ in range(n):
            h = det.match_icp_async(frame, 85.0, top_c=16)
            if prev is not None:
                out.append(prev.result())
            prev = h
        out.append(prev.result())
        return out

    # --- tier 3: device-complete; pull once at the end ----------------
    def device_complete(n):
        outs = [match_refine_batch(det, frame[None], 85.0, top_c=16)
                for _ in range(n)]
        return jax.device_get(outs[-1])

    ref = host_loop()          # also compiles everything
    assert ref, "no detections in the synthetic scene"
    got = one_sync()
    piped = pipelined(2)
    assert all(p == got for p in piped), "pipelined results differ"
    dev = device_complete(1)

    # all three agree on the top pose
    top = ref[0]
    top1 = got[0]
    assert (top["match"].x, top["match"].y) == (top1["match"].x,
                                                top1["match"].y)
    assert abs(top["dtheta_deg"] - top1["dtheta_deg"]) < 1e-3
    icp = dev["bench"][0]["icp"]
    best = int(np.argmax(np.where(np.isfinite(dev["bench"][0]["score"]),
                                  dev["bench"][0]["score"], -np.inf)))
    assert abs(float(icp.dtheta_deg[best]) - top["dtheta_deg"]) < 1e-3
    print(f"parity ok: top pose ({top['match'].x}, {top['match'].y}) "
          f"dtheta {top['dtheta_deg']:+.3f} deg on all three tiers")

    for name, fn in [("2-sync host loop", lambda: [host_loop()
                                                   for _ in range(n_frames)]),
                     ("1-sync match_icp", lambda: [one_sync()
                                                   for _ in range(n_frames)]),
                     ("pipelined async", lambda: pipelined(n_frames)),
                     ("device-complete", lambda: device_complete(n_frames))]:
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) / n_frames * 1e3
        print(f"{name:18s} {dt:8.2f} ms/frame")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
