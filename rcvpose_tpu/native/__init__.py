"""ctypes bindings for the native IO runtime (rcvpose_io.cpp).

Compiled on first use with g++ (cached next to the source); every entry
point has a NumPy fallback so the framework degrades gracefully without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rcvpose_io.cpp")
_SO = os.path.join(_HERE, "rcvpose_io.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC, "-o", _SO],
        check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.read_dpt.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32)]
            lib.read_dpt.restype = ctypes.c_int
            lib.batch_read_dpt.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            lib.batch_read_dpt.restype = None
            _lib = lib
        except Exception:
            _lib = None
    return _lib


def available():
    return _load() is not None


def read_dpt(path, max_hw=(1024, 1280)):
    """Native .dpt read; falls back to the NumPy reader."""
    lib = _load()
    if lib is None:
        from rcvpose_tpu.data import readers
        return readers.read_depth(str(path))
    max_elems = max_hw[0] * max_hw[1]
    out = np.empty(max_elems, np.uint16)
    h = ctypes.c_uint32()
    w = ctypes.c_uint32()
    rc = lib.read_dpt(str(path).encode(),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                      max_elems, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"read_dpt({path}) failed with code {rc}")
    return out[: h.value * w.value].reshape(h.value, w.value).copy()


def batch_read_dpt(paths, max_hw=(1024, 1280), n_threads=0):
    """Threaded batch .dpt read -> list of (H, W) uint16 arrays."""
    lib = _load()
    if lib is None:
        from rcvpose_tpu.data import readers
        return [readers.read_depth(str(p)) for p in paths]
    n = len(paths)
    max_elems = max_hw[0] * max_hw[1]
    out = np.empty((n, max_elems), np.uint16)
    dims = np.zeros((n, 2), np.uint32)
    status = np.zeros(n, np.int32)
    joined = "\n".join(str(p) for p in paths).encode()
    lib.batch_read_dpt(
        joined, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        max_elems, dims.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    results = []
    for i in range(n):
        if status[i] != 0:
            raise IOError(f"batch_read_dpt({paths[i]}) code {status[i]}")
        h, w = int(dims[i, 0]), int(dims[i, 1])
        results.append(out[i, : h * w].reshape(h, w).copy())
    return results
