"""Helpers for loading the goldens generated from the compiled C++ reference."""

import gzip
import json
import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, name)


def load_mat(name: str, dtype=None) -> np.ndarray:
    """Load a dumped cv::Mat: int32 header (rows, cols, channels) + data.

    dtype=None infers from the golden name (the historical kern_sim*
    u16 convention); pass it explicitly for other u16 dumps."""
    path = golden_path(name)
    if not os.path.exists(path) and os.path.exists(path + ".gz"):
        path += ".gz"
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        rows, cols, ch = np.frombuffer(f.read(12), np.int32)
        if dtype is None:
            dtype = np.uint16 if name.startswith("kern_sim") \
                and "64" not in name and "local64" not in name else np.uint8
        data = np.frombuffer(f.read(), dtype)
    shape = (int(rows), int(cols)) + ((int(ch),) if ch > 1 else ())
    return data.reshape(shape)


def load_json(name: str):
    with open(golden_path(name)) as f:
        return json.load(f)
