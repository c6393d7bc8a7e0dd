"""On-chip check: committed bench_banks/ snapshots == live TPU training.

The snapshots are generated on CPU (tools/gen_bank_caches.py); training
must be backend-bit-exact for the cache to stand in for what bench
would have trained on the chip. Run (background, no short timeouts —
TPU grant discipline, CLAUDE.md):

    PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/check_bank_cache_tpu.py

Prints one OK/MISMATCH line per config; exits nonzero on any mismatch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    dict(num_templates=360, num_features=63),
    dict(num_templates=360, num_features=63, n_ori=16),
    dict(num_templates=8, num_features=8191, dense=True, size=768),
    dict(num_templates=1000, num_features=256, dense=True, size=256),
]


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sbm_jax_cache"))
    import jax

    from shape_based_matching_tpu.utils.synthetic import (
        _bank_cache_dir, _bank_cache_key, build_rotated_detector,
        load_bank_cache)
    from tests.test_bank_cache import _flat

    print(f"backend: {jax.default_backend()}", flush=True)
    bad = 0
    for cfg in CONFIGS:
        key = _bank_cache_key(
            cfg.get("num_templates", 360), cfg.get("num_features", 63),
            cfg.get("T", (4, 8)), cfg.get("size", 256),
            cfg.get("seed", 0), cfg.get("dense", False),
            cfg.get("n_ori", 8))
        cached = load_bank_cache(
            os.path.join(_bank_cache_dir(), key + ".npz"))
        det, _ = build_rotated_detector(cache=False, **cfg)
        ok = cached is not None and _flat(cached) == _flat(
            det.class_templates["bench"])
        print(f"{key}: {'OK' if ok else 'MISMATCH'}", flush=True)
        bad += not ok
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
