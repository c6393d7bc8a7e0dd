"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests must be deterministic and runnable without TPU hardware; sharding tests
use the 8 virtual CPU devices. Set SBM_TEST_TPU=1 to run on real devices.
"""

import os

if not os.environ.get("SBM_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

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
