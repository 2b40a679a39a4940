"""ctypes binding to the native clustering kernels (runtime/cluster.cpp).

Loaded opportunistically; callers fall back to the numpy implementations in
modes/linkage.py when the shared library is absent. Build with
`make native` (see Makefile) or:
  g++ -O3 -shared -fPIC runtime/cluster.cpp -o ddiffpg_tpu/modes/libcluster.so
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is None:
        so = Path(__file__).parent / "libcluster.so"
        if not so.exists():
            raise FileNotFoundError(so)
        lib = ctypes.CDLL(str(so))
        lib.linkage_average.restype = ctypes.c_int
        lib.linkage_average.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        lib.dtw_batch.restype = ctypes.c_int
        lib.dtw_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        _LIB = lib
    return _LIB


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def linkage_average(dist: np.ndarray) -> np.ndarray:
    lib = _load()
    n = dist.shape[0]
    if n < 2:
        return np.zeros((0, 4))
    d = np.ascontiguousarray(dist, np.float64)
    Z = np.zeros((n - 1, 4), np.float64)
    rc = lib.linkage_average(_ptr(d, ctypes.c_double), n,
                             _ptr(Z, ctypes.c_double))
    if rc != 0:
        raise RuntimeError(f"linkage_average failed rc={rc}")
    return Z


def dtw_batch(a: np.ndarray, b: np.ndarray, la: np.ndarray,
              lb: np.ndarray) -> np.ndarray:
    lib = _load()
    P, Lmax, D = a.shape
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    la = np.ascontiguousarray(la, np.int32)
    lb = np.ascontiguousarray(lb, np.int32)
    out = np.zeros(P, np.float64)
    rc = lib.dtw_batch(_ptr(a, ctypes.c_double), _ptr(b, ctypes.c_double),
                       _ptr(la, ctypes.c_int32), _ptr(lb, ctypes.c_int32),
                       P, Lmax, D, _ptr(out, ctypes.c_double))
    if rc != 0:
        raise RuntimeError(f"dtw_batch failed rc={rc}")
    return out
