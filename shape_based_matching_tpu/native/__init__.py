"""ctypes loader for the native host kernels (with transparent fallback).

`load()` returns the shared library handle or None. On first use we attempt
an automatic build with the system C++ compiler; failures degrade silently
to the pure-Python implementations (identical semantics, slower on large
template banks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsbm_host.so")
_handle = None
_tried = False


def build(verbose: bool = False) -> bool:
    src = os.path.join(_DIR, "sbm_host.cpp")
    cmd = ["c++", "-O3", "-shared", "-fPIC", "-std=c++14", src, "-o", _SO]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if verbose and res.stdout:
            print(res.stdout)
        if res.returncode != 0:
            if verbose:
                print(res.stderr, file=sys.stderr)
            return False
        return True
    except Exception:
        return False


def load():
    global _handle, _tried
    if _handle is not None or _tried:
        return _handle
    _tried = True
    if os.environ.get("SBM_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(
                                       os.path.join(_DIR, "sbm_host.cpp"))):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.sbm_greedy_accept.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.sbm_greedy_accept.restype = None
        lib.sbm_select_scattered.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32)]
        lib.sbm_select_scattered.restype = ctypes.c_int
        lib.sbm_nms_boxes.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int32)]
        lib.sbm_nms_boxes.restype = ctypes.c_int
        _handle = lib
    except OSError:
        _handle = None
    return _handle


if __name__ == "__main__":
    ok = build(verbose=True)
    print("built" if ok else "build failed")
