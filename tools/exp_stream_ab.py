"""On-chip paired A/B: per-frame match_icp vs pipelined match_icp_async.

The per-frame deployment cost model is `device compute +
n_blocking_syncs x sync latency` (docs/SCALING.md). match_icp pays its
one sync SERIALLY after the frame's device compute; match_icp_async
dispatches frame N+1's programs before pulling frame N's results, so
device compute hides under the previous frame's blocking pull and
streaming throughput approaches max(compute, sync) instead of
compute + sync.

A = sequential loop:  [match_icp(frame_i) for i in ...]
B = pipelined loop:   dispatch i+1, then handle_i.result()

Both loops process the SAME rotating frame set and their results are
asserted identical before timing.

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/exp_stream_ab.py [num_templates num_features]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from ab_bench import ab_compare


def main():
    num_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    num_features = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=num_features)
    frames = [jax.device_put(synthetic_scene(1024, 1024, templ_img,
                                             n_instances=4, seed=s))
              for s in (7, 11, 13)]
    jax.block_until_ready(frames)

    def run_seq():
        out = []
        for i in range(INNER):
            out.append(det.match_icp(frames[i % 3], 85.0, top_c=32))
        return out

    def run_pipe():
        out = []
        prev = None
        for i in range(INNER):
            h = det.match_icp_async(frames[i % 3], 85.0, top_c=32)
            if prev is not None:
                out.append(prev.result())
            prev = h
        out.append(prev.result())
        return out

    INNER = 6

    def key(r):
        return (r["match"].x, r["match"].y, r["match"].similarity,
                r["match"].template_id, round(r["dtheta_deg"], 6))

    a = run_seq()
    b = run_pipe()
    assert a and a[0], "no matches"
    assert [[key(r) for r in fr] for fr in a] == \
           [[key(r) for r in fr] for fr in b], "A/B results differ"
    print(f"parity ok: {sum(len(f) for f in a)} refined matches over "
          f"{INNER} frames identical on both loops", flush=True)

    res = ab_compare(run_seq, run_pipe, n_pairs=20, inner=INNER,
                     name_a="match_icp_sequential",
                     name_b="match_icp_pipelined")
    print(res.summary())


if __name__ == "__main__":
    main()
