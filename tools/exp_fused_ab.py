"""On-chip paired A/B: split (3-program) vs fused (1-program) ICP edge
field through the same warm match_icp deployment call.

The merged refine+pack program (unconditional) already collapsed the
per-class refine + pack programs into one; this measures the remaining
toggle — SBM_ICP_FUSED — which fuses the edge field's frontend/flood/
epilogue programs into a single jit on accelerator backends (6 -> 4
programs per frame; tests/test_icp.py pins the counts). Per-frame cost
through the tunnel is (program count) x (per-dispatch overhead), so the
delta should track ~2 dispatch overheads.

Parity is asserted before timing.

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/exp_fused_ab.py [num_templates num_features]
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
    frame = jax.device_put(synthetic_scene(1024, 1024, templ_img,
                                           n_instances=4, seed=7))
    jax.block_until_ready(frame)

    def run_split():
        os.environ["SBM_ICP_FUSED"] = "0"
        for _ in range(INNER):
            det.match_icp(frame, 85.0, top_c=32)

    def run_fused():
        os.environ["SBM_ICP_FUSED"] = "1"
        for _ in range(INNER):
            det.match_icp(frame, 85.0, top_c=32)

    INNER = 5

    def key(r):
        return (r["match"].x, r["match"].y, r["match"].similarity,
                r["match"].template_id, round(r["dtheta_deg"], 6),
                round(r["dscale"], 8))

    os.environ["SBM_ICP_FUSED"] = "0"
    a = det.match_icp(frame, 85.0, top_c=32)
    os.environ["SBM_ICP_FUSED"] = "1"
    b = det.match_icp(frame, 85.0, top_c=32)
    assert a, "no matches"
    assert [key(r) for r in a] == [key(r) for r in b], "A/B results differ"
    print(f"parity ok: {len(a)} refined matches identical split vs fused",
          flush=True)

    res = ab_compare(run_split, run_fused, n_pairs=20, inner=INNER,
                     name_a="field_split_6prog", name_b="field_fused_4prog")
    print(res.summary())


if __name__ == "__main__":
    main()
