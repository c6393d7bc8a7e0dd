"""On-chip paired A/B: host deployment loop vs device-complete pipeline.

VERDICT r3 #4 asks for production_batch <= ~1.5x production_device.
bench.py measures the two in separate subprocesses, where the tunnel's
~2x cross-process variance can swamp the ratio; this measures both in
ONE process with the ABBA harness so the gap is decidable.

Three variants, two paired comparisons (host loop is the common A):

A  = host loop (det.match -> Match objects -> refine_matches_icp), the
     1:1 port of the reference's jabil flow (test_jabil.cpp:121-312).
     TWO blocking tunnel syncs per frame.
B1 = det.match_icp: the one-sync deployment API (device top-k +
     bank-gathered template points; match + pose results pulled
     together). Host dicts per frame, like A.
B2 = match_refine_batch (device-complete: packed match -> top-k ->
     batched ICP, one pull per INNER block — the zero-syncs-per-frame
     throughput shape).

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/exp_prod_ab.py [num_templates num_features]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from ab_bench import ab_compare


def main():
    num_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    num_features = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from shape_based_matching_tpu.models.icp import (match_refine_batch,
                                                     refine_matches_icp)
    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=num_features)
    frame = synthetic_scene(1024, 1024, templ_img, n_instances=4, seed=7)
    dev_frame = jax.device_put(frame)
    frames = dev_frame[None]
    jax.block_until_ready(frames)

    def host_once():
        matches = det.match(dev_frame, 85.0)
        return refine_matches_icp(det, dev_frame, matches[:32])

    def run_host():
        # blocks inherently every iteration — that IS the host loop
        for _ in range(INNER):
            host_once()

    def run_onecall():
        for _ in range(INNER):
            det.match_icp(dev_frame, 85.0, top_c=32)

    def run_dev():
        out = None
        for _ in range(INNER):
            out = match_refine_batch(det, frames, 85.0, top_c=32)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))

    INNER = 5
    assert host_once(), "host loop found no matches"
    assert det.match_icp(dev_frame, 85.0, top_c=32), \
        "one-sync path found no matches"
    out = match_refine_batch(det, frames, 85.0, top_c=32)
    assert int(jax.device_get(
        out["bench"][0]["icp"].valid).sum()) > 0

    res = ab_compare(run_host, run_onecall, n_pairs=20, inner=INNER,
                     name_a="host_loop", name_b="match_icp_one_sync")
    print(res.summary())
    print()
    res2 = ab_compare(run_host, run_dev, n_pairs=20, inner=INNER,
                      name_a="host_loop", name_b="device_pipeline")
    print(res2.summary())


if __name__ == "__main__":
    main()
