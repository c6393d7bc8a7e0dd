"""Detection-level NMS (greedy IoU), parity with nms.hpp:21-96.

Small-N, order-dependent greedy — runs on host over the (already short)
match list, exactly like the reference's cv_dnn::NMSBoxes.
"""

from __future__ import annotations

import numpy as np


def _jaccard(a, b) -> float:
    """1 - jaccardDistance__ (nms.hpp:70-89). Boxes are (x, y, w, h)."""
    ax, ay, aw, ah = a
    bx, by, bw, bh = b
    area_a = float(aw) * float(ah)
    area_b = float(bw) * float(bh)
    if (area_a + area_b) <= np.finfo(np.float32).eps:
        return 1.0  # distance 0 -> overlap 1
    ix = max(0.0, min(ax + aw, bx + bw) - max(ax, bx))
    iy = max(0.0, min(ay + ah, by + bh) - max(ay, by))
    inter = ix * iy
    return float(inter / (area_a + area_b - inter))


def nms_boxes(bboxes, scores, score_threshold: float, nms_threshold: float,
              eta: float = 1.0, top_k: int = 0):
    """Greedy NMS; returns kept indices (cv_dnn::NMSBoxes semantics)."""
    assert len(bboxes) == len(scores)
    pairs = [(s, i) for i, s in enumerate(scores) if s > score_threshold]
    pairs.sort(key=lambda p: -p[0])  # stable: ties keep index order
    if top_k > 0:
        pairs = pairs[:top_k]

    from ..native import load as _load_native

    lib = _load_native()
    if lib is not None and pairs:
        import ctypes

        b = np.ascontiguousarray(
            [list(map(float, bb)) for bb in bboxes], np.float32)
        order = np.ascontiguousarray([i for _, i in pairs], np.int32)
        out = np.zeros(len(pairs), np.int32)
        cnt = lib.sbm_nms_boxes(
            len(bboxes), b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(pairs), ctypes.c_float(nms_threshold), ctypes.c_float(eta),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return [int(i) for i in out[:cnt]]

    adaptive = nms_threshold
    keep: list[int] = []
    for _, idx in pairs:
        ok = True
        for kept in keep:
            if _jaccard(bboxes[idx], bboxes[kept]) > adaptive:
                ok = False
                break
        if ok:
            keep.append(idx)
            if eta < 1 and adaptive > 0.5:
                adaptive *= eta
    return keep
