"""Attribute the training-sweep throughput (VERDICT r3 weak #6).

train_sweep measured 13.6 templates/s (128 frames of 256² in ~9.4 s)
with nothing saying whether device compute, tunnel transfers, or the
host greedy passes dominate. This splits one sweep into:

  dispatch+pull   device chunk programs + the compacted D2H pulls
                  (timed together: the pull blocks on the compute)
  unpack+nonzero  np.unpackbits + np.nonzero per frame/level
  greedy          native greedy_accept acceptance scans
  select          template_from_strong (scattered selection + crop)

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=~/.cache/sbm_jax_cache \
  python tools/profile_train_sweep.py [n_frames size]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from shape_based_matching_tpu import Detector
    from shape_based_matching_tpu.models import training
    from shape_based_matching_tpu.models.detector import _batch_train_level
    from shape_based_matching_tpu.ops.filters import pyr_down_u8
    from shape_based_matching_tpu.utils.synthetic import (
        synthetic_shape_image)

    frames = np.stack([synthetic_shape_image(size, seed=1000 + i)
                       for i in range(n_frames)])
    det = Detector(num_features=63)
    det.add_templates(frames[:4], "warm")  # compile chunk shapes

    # full sweep wall (matches bench.py train_sweep). The warm call
    # above compiles CHUNK-4 shapes only; the first full sweep compiles
    # the chunk-64 programs, so sweep #2 isolates the warm cost.
    t0 = time.perf_counter()
    ids = det.add_templates(frames, "bench")
    full = time.perf_counter() - t0
    assert all(i >= 0 for i in ids)
    print(f"full add_templates (cold 64-chunk shapes): {full:.2f} s "
          f"({n_frames / full:.1f} templates/s)")
    t0 = time.perf_counter()
    ids = det.add_templates(frames, "bench2")
    full = time.perf_counter() - t0
    assert all(i >= 0 for i in ids)
    print(f"full add_templates (warm):  {full:.2f} s "
          f"({n_frames / full:.1f} templates/s)")

    # ---- replicate the sweep with stage timers ----
    cand_cap = 4096
    chunk = 64
    thr2 = float(det.strong_threshold) ** 2
    strong_lo = np.nextafter(
        np.nextafter(np.float32(thr2), np.float32(0)), np.float32(0))
    zmask = jnp.zeros((1, 1, 1), jnp.uint8)

    stages = {"dispatch+pull": 0.0, "unpack+nonzero": 0.0,
              "greedy": 0.0, "select": 0.0}

    t0 = time.perf_counter()
    pending = []
    for b0 in range(0, n_frames, chunk):
        b1 = min(b0 + chunk, n_frames)
        src = jnp.asarray(frames[b0:b1])
        levels_out = []
        for l in range(det.pyramid_levels):
            if l > 0:
                src = jax.vmap(pyr_down_u8)(src)
            levels_out.append(
                (_batch_train_level(
                    src, zmask, jnp.float32(det.weak_threshold),
                    jnp.float32(strong_lo), True, False, 8, False,
                    cand_cap), (src.shape[1], src.shape[2])))
        pending.append((b0, b1, levels_out))
    host_chunks = []
    for b0, b1, levels_out in pending:
        host_chunks.append(
            (b0, b1, [(tuple(np.asarray(a) for a in outs), hw)
                      for outs, hw in levels_out]))
    stages["dispatch+pull"] = time.perf_counter() - t0

    for b0, b1, host_levels in host_chunks:
        for bi in range(b1 - b0):
            level_nfeat = 63
            for l, ((packed, idx, got, n_str, mag_v, quant_v, theta_v),
                    (h, w)) in enumerate(host_levels):
                if l > 0:
                    level_nfeat //= 2
                t0 = time.perf_counter()
                elig = np.unpackbits(
                    packed[bi], axis=-1)[:, :w].astype(bool)
                ys, xs = np.nonzero(elig)
                stages["unpack+nonzero"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                flags = training.greedy_accept(h, w, ys, xs)
                acc = np.zeros((h, w), bool)
                acc[ys[flags], xs[flags]] = True
                stages["greedy"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                m = got[bi]
                si = idx[bi][m]
                sy = si // w
                sx = si % w
                keep = acc[sy, sx]
                training.template_from_strong(
                    sx[keep], sy[keep], mag_v[bi][m][keep],
                    quant_v[bi][m][keep], theta_v[bi][m][keep],
                    level_nfeat, det.strong_threshold, l)
                stages["select"] += time.perf_counter() - t0

    total = sum(stages.values())
    print(f"\nstage split (one sweep, {n_frames} frames), "
          f"sum {total:.2f} s:")
    for k, v in sorted(stages.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v:7.2f} s  ({100 * v / total:4.1f}%)")


if __name__ == "__main__":
    main()
