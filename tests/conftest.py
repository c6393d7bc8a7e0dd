"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests must be deterministic and runnable without TPU hardware; sharding tests
use the 8 virtual CPU devices. Set SBM_TEST_TPU=1 to run on real devices.
"""

import os

# Persistent compilation cache: the parity suite jit-compiles many shapes;
# caching across runs cuts wall time drastically on small hosts.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/sbm_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

if not os.environ.get("SBM_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    # NOTE: the env var JAX_PLATFORMS may be pinned (e.g. to a TPU plugin)
    # by the outer environment; jax.config wins over it.
    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


def _load_image(path, gray=True):
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        from PIL import Image

        im = Image.open(path)
        im = im.convert("L" if gray else "RGB")
        arr = np.asarray(im)
        if not gray:
            arr = arr[:, :, ::-1].copy()  # match cv2 BGR ordering
        return arr


@pytest.fixture(scope="session")
def case1_images():
    base = os.path.join(REFERENCE_DIR, "test", "case1")
    if not os.path.isdir(base):
        pytest.skip("reference fixtures not mounted")
    return {
        "train": _load_image(os.path.join(base, "train.png")),
        "test": _load_image(os.path.join(base, "test.png")),
    }


def has_cv2():
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False
