"""ctypes bindings for the native host components.

Reference parity (SURVEY §2.6): external/pmrrr (tridiagonal MRRR
eigensolver, C+MPI+pthreads) -> native/elx_tridiag.cpp (bisection +
inverse iteration, OpenMP); external/suite_sparse AMD ->
native/elx_amd.cpp (minimum-degree). Compiled on demand with g++; every
entry point has a pure-Python/JAX fallback so the library works without
a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))
_SO = os.path.join(_SRC, "libelx_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _SRC], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        # retry without OpenMP
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", _SO,
                 os.path.join(_SRC, "elx_tridiag.cpp"),
                 os.path.join(_SRC, "elx_amd.cpp")],
                check=True, capture_output=True, timeout=120)
            return os.path.exists(_SO)
        except Exception:
            return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.elx_tridiag_eig.restype = ctypes.c_int
        lib.elx_tridiag_eig.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int,
        ]
        lib.elx_amd.restype = ctypes.c_int
        lib.elx_amd.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
        ]
        lib.elx_hess_qr.restype = ctypes.c_int
        lib.elx_hess_qr.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.complex128, flags="C"),
            np.ctypeslib.ndpointer(np.complex128, flags="C"),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def tridiag_eig_native(d: np.ndarray, e: np.ndarray,
                       want_vectors: bool = True
                       ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Host tridiagonal eigensolver (pmrrr-role). Raises RuntimeError if
    the native library is unavailable — callers fall back to the JAX
    solver."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = d.shape[0]
    d = np.ascontiguousarray(d, np.float64)
    e = np.ascontiguousarray(e, np.float64)
    if e.shape[0] != max(n - 1, 0):
        raise ValueError("e must have length n-1")
    w = np.zeros(n, np.float64)
    Z = np.zeros((n, n) if want_vectors else (1, 1), np.float64)
    rc = lib.elx_tridiag_eig(n, d, np.ascontiguousarray(
        e if n > 1 else np.zeros(1)), w, Z.reshape(-1), int(want_vectors))
    if rc != 0:
        raise RuntimeError(f"elx_tridiag_eig rc={rc}")
    # Z stored per-eigenvector contiguously => rows are vectors; transpose
    return (w, Z.T.copy() if want_vectors else None)


def hess_qr_native(H: np.ndarray, want_vecs: bool = True,
                   max_sweeps_per_eig: int = 40
                   ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Serial complex Hessenberg QR (zlahqr-role) for the Schur driver's
    small windows. Raises RuntimeError if the native library is
    unavailable — callers fall back to the numpy sweeps."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = H.shape[0]
    T = np.ascontiguousarray(H, np.complex128).copy()
    Z = np.zeros((n, n) if want_vecs else (1, 1), np.complex128)
    rc = lib.elx_hess_qr(n, T.reshape(-1), Z.reshape(-1),
                         int(want_vecs), int(max_sweeps_per_eig))
    if rc != 0:
        raise RuntimeError(f"elx_hess_qr rc={rc}")
    return T, (Z if want_vecs else None)


def amd_order(colptr: np.ndarray, rowind: np.ndarray, n: int) -> np.ndarray:
    """Fill-reducing ordering (AMD-role). Falls back to a Python
    minimum-degree when the native library is unavailable."""
    lib = _load()
    colptr = np.ascontiguousarray(colptr, np.int64)
    rowind = np.ascontiguousarray(rowind, np.int32)
    if lib is not None:
        perm = np.zeros(n, np.int32)
        rc = lib.elx_amd(n, colptr, rowind, perm)
        if rc == 0:
            return perm.astype(np.int64)
    return _amd_python(colptr, rowind, n)


def _amd_python(colptr, rowind, n) -> np.ndarray:
    """Pure-Python minimum degree (fallback)."""
    adj = [set() for _ in range(n)]
    for j in range(n):
        for p in range(colptr[j], colptr[j + 1]):
            i = int(rowind[p])
            if i != j:
                adj[i].add(j)
                adj[j].add(i)
    eliminated = [False] * n
    perm = np.zeros(n, np.int64)
    for k in range(n):
        best, best_deg = -1, None
        for v in range(n):
            if eliminated[v]:
                continue
            dv = len(adj[v])
            if best_deg is None or dv < best_deg:
                best, best_deg = v, dv
        perm[k] = best
        eliminated[best] = True
        nbrs = [u for u in adj[best] if not eliminated[u]]
        for u in nbrs:
            adj[u].discard(best)
        for a in range(len(nbrs)):
            for b in range(a + 1, len(nbrs)):
                adj[nbrs[a]].add(nbrs[b])
                adj[nbrs[b]].add(nbrs[a])
        adj[best].clear()
    return perm
