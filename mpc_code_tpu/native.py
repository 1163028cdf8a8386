"""ctypes bindings for the native host-core library (native/hostcore.cpp).

The TPU compute path is JAX/XLA; this module covers the native *host
runtime* pieces (the analog of the reference's C++/Fortran dependency
layer, SURVEY.md §2.2): doubling DARE, steady-state Kalman gain, and the
MHE backward Riccati smoother that runs on the host between NLP solves.

The library builds on demand with ``make -C native`` (g++); if the
toolchain or build is unavailable everything falls back to the pure
numpy/JAX implementations — `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhostcore.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_DP = ctypes.POINTER(ctypes.c_double)


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "libhostcore.so"],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.hc_dare.restype = ctypes.c_int
        lib.hc_dare.argtypes = [_DP, _DP, _DP, _DP, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, _DP]
        lib.hc_kalman_gain.restype = ctypes.c_int
        lib.hc_kalman_gain.argtypes = [_DP, _DP, _DP, _DP, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int, _DP]
        lib.hc_riccati_smoother.restype = ctypes.c_int
        lib.hc_riccati_smoother.argtypes = [_DP, _DP, _DP, ctypes.c_int,
                                            ctypes.c_int, _DP]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _cptr(a: np.ndarray):
    return a.ctypes.data_as(_DP)


def dare(A, B, Q, R, iters: int = 30) -> np.ndarray:
    """Native doubling DARE; same convention as ops/dare.solve_dare."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native hostcore unavailable")
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    Q = np.ascontiguousarray(Q, dtype=np.float64)
    R = np.ascontiguousarray(R, dtype=np.float64)
    n, m = A.shape[0], B.shape[1]
    P = np.zeros((n, n), dtype=np.float64)
    rc = lib.hc_dare(_cptr(A), _cptr(B), _cptr(Q), _cptr(R), n, m, iters, _cptr(P))
    if rc != 0:
        raise ArithmeticError(f"hc_dare failed (rc={rc})")
    return P


def kalman_gain(A, C, Q, R, iters: int = 30) -> np.ndarray:
    """Native steady-state Kalman gain (reference Estimator.py:213-223)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native hostcore unavailable")
    A = np.ascontiguousarray(A, dtype=np.float64)
    C = np.ascontiguousarray(C, dtype=np.float64)
    Q = np.ascontiguousarray(Q, dtype=np.float64)
    R = np.ascontiguousarray(R, dtype=np.float64)
    n, p = A.shape[0], C.shape[0]
    K = np.zeros((n, p), dtype=np.float64)
    rc = lib.hc_kalman_gain(_cptr(A), _cptr(C), _cptr(Q), _cptr(R), n, p, iters,
                            _cptr(K))
    if rc != 0:
        raise ArithmeticError(f"hc_kalman_gain failed (rc={rc})")
    return K


def riccati_smoother(bigP, bigPc, bigA) -> np.ndarray:
    """Native MHE backward Riccati smoother (reference Estimator.py:654-664).

    Inputs: lists/arrays of N (n x n) matrices. Returns the N smoothed
    covariances Pis.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native hostcore unavailable")
    bigP = np.ascontiguousarray(np.stack(bigP), dtype=np.float64)
    bigPc = np.ascontiguousarray(np.stack(bigPc), dtype=np.float64)
    bigA = np.ascontiguousarray(np.stack(bigA), dtype=np.float64)
    N, n, _ = bigP.shape
    Pis = np.zeros_like(bigP)
    rc = lib.hc_riccati_smoother(_cptr(bigP), _cptr(bigPc), _cptr(bigA), n, N,
                                 _cptr(Pis))
    if rc != 0:
        raise ArithmeticError(f"hc_riccati_smoother failed (rc={rc})")
    return Pis
