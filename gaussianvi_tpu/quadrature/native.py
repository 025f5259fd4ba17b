"""ctypes bindings for the native C++ sparse-grid generator (csrc/spgh.cpp).

The reference's equivalent native component is a MATLAB-Compiler shared
library (quadrature/libSpGH/, loaded through the MATLAB runtime,
generateSpGHWeights.h:23-84).  Ours is dependency-free C++17 compiled with
g++; this module loads it via ctypes, builds it on demand when the shared
object is missing, and falls back to the NumPy implementation when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libspgh.so"))
_lib = None


def _build() -> bool:
    src = os.path.join(_CSRC, "spgh.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library():
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.spgh_count.restype = ctypes.c_int64
    lib.spgh_count.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.spgh_generate.restype = ctypes.c_int64
    lib.spgh_generate.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    lib.spgh_gh1d.restype = ctypes.c_int64
    lib.spgh_gh1d.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def sparse_gh_native(dim: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Native (dim, k) sparse rule; raises if the library is unavailable."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native spgh library unavailable (no g++?)")
    n = lib.spgh_count(dim, k)
    if n < 0:
        raise ValueError(f"invalid (dim, k) = ({dim}, {k})")
    nodes = np.empty((n, dim), np.float64)
    weights = np.empty(n, np.float64)
    got = lib.spgh_generate(
        dim, k,
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
    )
    if got != n:
        raise RuntimeError(f"spgh_generate returned {got}, expected {n}")
    return nodes, weights


def gh_1d_native(degree: int) -> tuple[np.ndarray, np.ndarray]:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native spgh library unavailable (no g++?)")
    nodes = np.empty(degree, np.float64)
    weights = np.empty(degree, np.float64)
    got = lib.spgh_gh1d(
        degree,
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if got != degree:
        raise RuntimeError(f"spgh_gh1d returned {got}")
    return nodes, weights
