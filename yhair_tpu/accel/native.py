"""ctypes loader for the native C++ cluster builder (native/ directory).

The reference's BVH build is C++ [U:libs/yocto/yocto_bvh.cpp]; this is its
TPU-rebuild equivalent: the Morton/cluster build used by ops/clusters.py,
compiled to a shared library. Falls back to the numpy implementation when
the library hasn't been built (`native/build.sh`). Both paths produce
bit-identical layouts (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "lib", "libyhair_native.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.yh_n_clusters.restype = ctypes.c_int64
    lib.yh_n_clusters.argtypes = [ctypes.c_int64, ctypes.c_int64]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.yh_build_clusters.restype = ctypes.c_int
    lib.yh_build_clusters.argtypes = [
        f32p, f32p, f32p, f32p, ctypes.c_int64, ctypes.c_int64,
        f32p, f32p, f32p, f32p, i32p]
    if hasattr(lib, "yh_build_clusters_median"):
        lib.yh_build_clusters_median.restype = ctypes.c_int
        lib.yh_build_clusters_median.argtypes = lib.yh_build_clusters.argtypes
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


def build_clusters(p0, p1, r0, r1, cluster_size=128, method="median"):
    """Native cluster build. Returns dict of arrays matching
    ops.clusters.build's layout, or None if the library is unavailable
    (or doesn't implement `method`)."""
    lib = _lib()
    if lib is None:
        return None
    if method == "median":
        if not hasattr(lib, "yh_build_clusters_median"):
            return None
        fn = lib.yh_build_clusters_median
    elif method == "morton":
        fn = lib.yh_build_clusters
    else:
        return None
    p0 = np.ascontiguousarray(p0, np.float32)
    p1 = np.ascontiguousarray(p1, np.float32)
    r0 = np.ascontiguousarray(r0, np.float32)
    r1 = np.ascontiguousarray(r1, np.float32)
    n = p0.shape[0]
    c = int(lib.yh_n_clusters(n, cluster_size))
    padded = c * cluster_size
    s0 = np.empty((padded, 4), np.float32)
    s1 = np.empty((padded, 4), np.float32)
    cmin = np.empty((c, 3), np.float32)
    cmax = np.empty((c, 3), np.float32)
    seg_index = np.empty(padded, np.int32)
    rc = fn(p0, p1, r0, r1, n, cluster_size,
            s0, s1, cmin, cmax, seg_index)
    if rc != 0:
        raise RuntimeError(f"native cluster build ({method}) failed: {rc}")
    return {"s0": s0, "s1": s1, "cmin": cmin, "cmax": cmax,
            "seg_index": seg_index, "n_clusters": c,
            "cluster_size": cluster_size}
