"""Native C++ host kernels must agree exactly with the Python fallbacks."""

import numpy as np
import pytest

from shape_based_matching_tpu import native


@pytest.fixture(scope="module")
def lib():
    handle = native.load()
    if handle is None:
        pytest.skip("native lib unavailable (no C++ compiler)")
    return handle


def test_greedy_accept_equivalence(lib, rng):
    import ctypes

    h, w = 120, 150
    mask = rng.rand(h, w) < 0.08
    ys, xs = np.nonzero(mask)
    ys32 = np.ascontiguousarray(ys, np.int32)
    xs32 = np.ascontiguousarray(xs, np.int32)
    flags = np.zeros(len(ys), np.uint8)
    lib.sbm_greedy_accept(
        h, w, len(ys),
        ys32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xs32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))

    accepted = np.zeros((h, w), bool)
    want = []
    for r, c in zip(ys.tolist(), xs.tolist()):
        r0, r1 = max(0, r - 2), min(h, r + 3)
        c0, c1 = max(0, c - 2), min(w, c + 3)
        ok = not accepted[r0:r1, c0:c1].any()
        want.append(ok)
        if ok:
            accepted[r, c] = True
    np.testing.assert_array_equal(flags.astype(bool), np.array(want))


def test_select_scattered_equivalence(lib, rng):
    import os

    from shape_based_matching_tpu.models.training import (
        Candidate, select_scattered_features)

    cands = [Candidate(int(rng.randint(0, 200)), int(rng.randint(0, 200)),
                       0, float(200 - i), 0.0) for i in range(150)]
    native_sel = select_scattered_features(cands, 40,
                                           float(len(cands) // 40 + 1))
    os.environ["SBM_NO_NATIVE"] = "1"
    try:
        import shape_based_matching_tpu.native as nat

        saved_handle, saved_tried = nat._handle, nat._tried
        nat._handle, nat._tried = None, True
        py_sel = select_scattered_features(cands, 40,
                                           float(len(cands) // 40 + 1))
        nat._handle, nat._tried = saved_handle, saved_tried
    finally:
        del os.environ["SBM_NO_NATIVE"]
    assert [(c.x, c.y) for c in native_sel] == [(c.x, c.y) for c in py_sel]


def test_nms_equivalence(lib, rng):
    import shape_based_matching_tpu.native as nat
    from shape_based_matching_tpu.utils.nms import nms_boxes

    boxes = [(int(rng.randint(0, 100)), int(rng.randint(0, 100)),
              int(rng.randint(5, 40)), int(rng.randint(5, 40)))
             for _ in range(80)]
    scores = [float(rng.rand()) for _ in range(80)]

    keep_native = nms_boxes(boxes, scores, 0.1, 0.5)
    saved_handle, saved_tried = nat._handle, nat._tried
    nat._handle, nat._tried = None, True
    keep_py = nms_boxes(boxes, scores, 0.1, 0.5)
    nat._handle, nat._tried = saved_handle, saved_tried
    assert keep_native == keep_py
