"""ctypes bindings for the native host window codelets (libsnwindow.so).

The reference architecture runs every small diagonal-window recursion as a
*CPU codelet* (StarPU tasks executing src/schur/cpu_utils.c — small-window
Schur cpu_utils.c:2426, AED cpu_utils.c:2837, block moves cpu_utils.c:3377)
while the accelerator gets the BLAS-3 trailing updates.  This module is the
TPU build's equivalent: the latency-bound scalar window work runs on the
host in true f64 via ``native/window_kernels.cpp`` (the TPU's emulated
double-f32 f64 is both less accurate and ~1000x slower on sequential scalar
loops), and every O(n^2)-sized update stays on the TPU as MXU GEMMs.

The library auto-builds on first use (g++ is part of the toolchain); if the
build fails, callers fall back to the pure-JAX device kernels — the solvers
work either way, the native path is the fast one.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsnwindow.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_NATIVE_DIR, "window_kernels.cpp")
        try:
            if (not os.path.exists(_SO_PATH)
                    or os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-Wall", "-fPIC", "-shared",
                     "-o", _SO_PATH, src],
                    check=True, capture_output=True, timeout=240)
            lib = ctypes.CDLL(_SO_PATH)
        except Exception:
            _LIB = None
            return None

        c_dp = ctypes.POINTER(ctypes.c_double)
        c_ip = ctypes.POINTER(ctypes.c_int)
        c_up = ctypes.POINTER(ctypes.c_ubyte)
        lib.sn_hseqr.restype = ctypes.c_int
        lib.sn_hseqr.argtypes = [ctypes.c_int, c_dp, c_dp, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_double]
        lib.sn_eigvals.restype = None
        lib.sn_eigvals.argtypes = [ctypes.c_int, c_dp, c_dp, c_dp]
        lib.sn_reorder.restype = ctypes.c_int
        lib.sn_reorder.argtypes = [ctypes.c_int, c_dp, c_dp, ctypes.c_int,
                                   c_up]
        lib.sn_aed.restype = ctypes.c_int
        lib.sn_aed.argtypes = [ctypes.c_int, c_dp, c_dp, ctypes.c_double,
                               ctypes.c_double, c_ip, c_dp, c_dp, c_ip, c_dp]
        _LIB = lib
        return _LIB


def available() -> bool:
    """True when the native codelet library is (or can be) loaded."""
    if os.environ.get("STARNEIG_NO_NATIVE"):
        return False
    return _load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def hseqr(H: np.ndarray, Z: np.ndarray, ilo: int, ihi: int, thresh: float):
    """Schur-reduce the Hessenberg block [ilo, ihi) of H in place.

    H: (w, w) C-contiguous f64; Z: (zr, w) accumulated on the right.
    Returns info (0 = success).  2x2 blocks come out standardized.
    """
    lib = _load()
    w = H.shape[0]
    return int(lib.sn_hseqr(w, _dp(H), _dp(Z), Z.shape[0],
                            int(ilo), int(ihi), float(thresh)))


def eigvals(T: np.ndarray):
    """Eigenvalues of a standardized quasi-triangular T -> (er, ei)."""
    lib = _load()
    w = T.shape[0]
    er = np.empty(w)
    ei = np.empty(w)
    lib.sn_eigvals(w, _dp(np.ascontiguousarray(T)), _dp(er), _dp(ei))
    return er, ei


def reorder(T: np.ndarray, Z: np.ndarray, select: np.ndarray):
    """Move selected eigenvalues to the top of T in place.

    select: (w,) uint8, updated in place to the realized selection.
    Returns the number of failed (rejected) swaps.
    """
    lib = _load()
    w = T.shape[0]
    return int(lib.sn_reorder(
        w, _dp(T), _dp(Z), Z.shape[0],
        select.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))))


def aed(H: np.ndarray, s: float, thresh: float):
    """Full AED processing of a Hessenberg window (in true f64 on host).

    Returns (T, V, kbot, sr, si, beta, info): the processed window, its
    orthogonal transform, the undeflated size, shift candidates from the
    undeflated diagonal, the condensed spike head, and the QR info code.
    """
    lib = _load()
    w = H.shape[0]
    T = np.ascontiguousarray(H, dtype=np.float64).copy()
    V = np.eye(w)
    kbot = ctypes.c_int(0)
    nsh = ctypes.c_int(0)
    beta = ctypes.c_double(0.0)
    sr = np.zeros(w)
    si = np.zeros(w)
    info = int(lib.sn_aed(w, _dp(T), _dp(V), float(s), float(thresh),
                          ctypes.byref(kbot), _dp(sr), _dp(si),
                          ctypes.byref(nsh), ctypes.byref(beta)))
    n = int(nsh.value)
    return T, V, int(kbot.value), sr[:n], si[:n], float(beta.value), info
