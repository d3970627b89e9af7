"""Native (C++) runtime components.

``qp_oracle``: a dependency-free dense IPM oracle compiled on first use with
the system compiler and loaded via ctypes (no pybind11 required). The numpy
implementation in ``qpth_tpu.solvers.oracle`` is the reference for it; both
play the role of the reference package's per-instance CPU fallback solver
(qp.py:97-120).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "qp_oracle.cpp")
_LIB_PATH = os.path.join(_HERE, "_qp_oracle.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    """Compile the shared library if needed. Returns an error string or
    None on success."""
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return None
    # Prefer an OpenMP build (the batch loop parallelizes across cores);
    # fall back to serial if the toolchain lacks it.
    for extra in (["-fopenmp"], []):
        for cxx in ("g++", "c++", "clang++"):
            try:
                r = subprocess.run(
                    [cxx, "-O3", "-march=native", *extra, "-shared",
                     "-fPIC", "-o", _LIB_PATH, _SRC],
                    capture_output=True, text=True, timeout=120)
                if r.returncode == 0:
                    return None
                err = r.stderr
            except (OSError, subprocess.TimeoutExpired) as e:
                err = str(e)
    return err


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        _build_error = _build()
        if _build_error is None:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.qp_solve_batch.restype = ctypes.c_int
            lib.qp_solve_batch.argtypes = (
                [ctypes.c_int] * 7
                + [ctypes.POINTER(ctypes.c_double)] * 6
                + [ctypes.c_double, ctypes.c_int]
                + [ctypes.POINTER(ctypes.c_double)] * 4)
            lib.qp_solve_batch_status.restype = ctypes.c_int
            lib.qp_solve_batch_status.argtypes = (
                lib.qp_solve_batch.argtypes
                + [ctypes.POINTER(ctypes.c_int)])
            _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def solve_qp_batch_native(Q, p, G, h, A=None, b=None, tol=1e-11,
                          max_iter=100, return_status: bool = False):
    """Batched native solve. Matrix params may have batch dim 1 (shared) or
    B; p/h/b must be (B, .). Returns (x, nu, lam, s) float64 arrays — or,
    with ``return_status=True``, (x, nu, lam, s, status) where status is a
    per-lane int array (0 = converged, 1 = max_iter best-effort, -1 =
    numerical failure). Failed lanes come back NaN-filled; healthy lanes
    are unaffected (per-lane isolation — one infeasible instance in a
    debugging batch must not mask the others' solutions).

    Falls back to the numpy oracle if the native library is unavailable.
    """
    lib = _load()
    p = np.ascontiguousarray(np.atleast_2d(np.asarray(p, np.float64)))
    B, n = p.shape
    if lib is None:
        from ..solvers.oracle import solve_qp_batch_np

        return solve_qp_batch_np(Q, p, G, h, A, b, tol=tol,
                                 max_iter=max_iter,
                                 return_status=return_status)

    def canon(M, rank):
        M = np.asarray(M, np.float64)
        if M.ndim == rank - 1:
            M = M[None]
        return np.ascontiguousarray(M)

    Q = canon(Q, 3)
    G = canon(G, 3)
    h = np.ascontiguousarray(
        np.broadcast_to(np.atleast_2d(np.asarray(h, np.float64)),
                        (B, G.shape[-2])))
    m = G.shape[-2]
    has_eq = A is not None and np.size(A) > 0
    if has_eq:
        A = canon(A, 3)
        neq = A.shape[-2]
        b = np.ascontiguousarray(
            np.broadcast_to(np.atleast_2d(np.asarray(b, np.float64)),
                            (B, neq)))
    else:
        neq = 0
        A = np.zeros((1, 0, n))
        b = np.zeros((B, 0))

    x = np.empty((B, n))
    y = np.empty((B, max(neq, 1)))
    lam = np.empty((B, m))
    s = np.empty((B, m))

    status = np.empty((B,), dtype=np.int32)
    ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.qp_solve_batch_status(
        B, n, m, neq, Q.shape[0], G.shape[0], A.shape[0],
        ptr(Q), ptr(p), ptr(G), ptr(h), ptr(A), ptr(b),
        ctypes.c_double(tol), int(max_iter),
        ptr(x), ptr(y), ptr(lam), ptr(s),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    out = (x, y[:, :neq], lam, s)
    return out + (status,) if return_status else out
