"""Queue-pipelined device-compute split of the ICP side of the
production pipeline (1024x1024 frame, 32 candidates).

Per CLAUDE.md, separately-timed single dispatches are artifacts through
the tunnel; this dispatches N iterations of ONE program back-to-back
and blocks once, so the wall is N x (true device throughput cost) +
one sync. Stages measured:

  frontend  — blur7 + sobel + edge/normal/subpix  (icp._edge_frontend)
  flood     — jump flood, radius 8                (icp._jump_flood)
  epilogue  — seed planes -> offset/has           (icp._flood_epilogue)
  fused     — all three as one program            (icp._edge_field_fused)
  refine    — batched sim2 ICP, 32 cands x 12 it  (icp.icp_refine_points)

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/profile_icp_device.py [H W N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from shape_based_matching_tpu.models import icp


def timed(name, fn, n):
    fn()  # warm/compile
    jax.effects_barrier()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"  {name:10s} {best * 1e3:8.3f} ms/iter  (n={n}, min of 5)",
          flush=True)
    return best


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    rng = np.random.default_rng(0)
    frame = jax.device_put(rng.integers(0, 256, (h, w), np.uint8))
    thr = jnp.float32(30.0)
    jax.block_until_ready(frame)

    print(f"device={jax.devices()[0].platform} frame={h}x{w}")

    edge, normal, subpix = icp._edge_frontend(frame, thr)
    seed_r, seed_c = icp._jump_flood(edge, radius=8)
    off, has = icp._flood_epilogue(seed_r, seed_c, radius=8)
    jax.block_until_ready((off, normal, has, subpix))

    c = 32
    npts = 128
    pts = jax.device_put(
        rng.uniform(-40, 40, (c, npts, 2)).astype(np.float32))
    origins = jax.device_put(
        rng.uniform(100, 900, (c, 2)).astype(np.float32))
    valid = jax.device_put(np.ones((c, npts), np.bool_))

    t_front = timed("frontend", lambda: icp._edge_frontend(frame, thr), n)
    t_flood = timed(
        "flood", lambda: icp._jump_flood(edge, radius=8), n)
    t_epi = timed(
        "epilogue", lambda: icp._flood_epilogue(seed_r, seed_c, radius=8), n)
    t_fused = timed(
        "fused", lambda: icp._edge_field_fused(frame, thr, radius=8), n)
    t_ref = timed(
        "refine", lambda: icp.icp_refine_points(
            off, normal, has, subpix, pts, origins, valid), n)

    print(f"split sum {1e3 * (t_front + t_flood + t_epi):8.3f} ms "
          f"vs fused {1e3 * t_fused:8.3f} ms; refine {1e3 * t_ref:.3f} ms")


if __name__ == "__main__":
    main()
