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


_HOSTKEY = os.path.join(_SRC, ".buildhost")


def _host_cpu_key() -> str:
    """Hash of the host CPU profile. The library compiles with
    -march=native; a container rescheduled onto a host with different
    vector features must rebuild rather than SIGILL on stale code."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split())).encode()
                    ).hexdigest()[:16]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:16]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _SRC], check=True,
                       capture_output=True, timeout=120)
        if os.path.exists(_SO):
            with open(_HOSTKEY, "w") as f:
                f.write(_host_cpu_key())
            return True
        return False
    except Exception:
        # retry without OpenMP
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", _SO,
                 os.path.join(_SRC, "elx_tridiag.cpp"),
                 os.path.join(_SRC, "elx_amd.cpp")],
                check=True, capture_output=True, timeout=120)
            if os.path.exists(_SO):
                with open(_HOSTKEY, "w") as f:
                    f.write(_host_cpu_key())
                return True
            return False
        except Exception:
            return False


def _stale() -> bool:
    """True when any source is newer than the built library, or the
    library was built on a host with a different CPU profile."""
    try:
        with open(_HOSTKEY) as f:
            if f.read().strip() != _host_cpu_key():
                return True
    except OSError:
        return True
    try:
        so_t = os.path.getmtime(_SO)
        for f in os.listdir(_SRC):
            if f.endswith(".cpp") and \
                    os.path.getmtime(os.path.join(_SRC, f)) > so_t:
                return True
    except OSError:
        pass
    return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if (not os.path.exists(_SO) or _stale()) and not _build():
        if not os.path.exists(_SO):
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
        if hasattr(lib, "elx_sn_symbolic"):
            lib.elx_sn_symbolic.restype = ctypes.c_longlong
            lib.elx_sn_symbolic.argtypes = [
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.int32, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                ctypes.c_longlong,
            ]
        lib.elx_hess_qr.restype = ctypes.c_int
        lib.elx_hess_qr.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.complex128, flags="C"),
            np.ctypeslib.ndpointer(np.complex128, flags="C"),
            ctypes.c_int,
            ctypes.c_int,
        ]
        if hasattr(lib, "elx_hess_qr_real"):
            lib.elx_hess_qr_real.restype = ctypes.c_int
            lib.elx_hess_qr_real.argtypes = [
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                ctypes.c_int,
                ctypes.c_int,
            ]
        if hasattr(lib, "elx_real_aed"):
            lib.elx_real_aed.restype = ctypes.c_int
            lib.elx_real_aed.argtypes = [
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
            ]
        if hasattr(lib, "elx_complex_aed"):
            lib.elx_complex_aed.restype = ctypes.c_int
            lib.elx_complex_aed.argtypes = [
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.complex128, flags="C"),
                np.ctypeslib.ndpointer(np.complex128, flags="C"),
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
            ]
        if hasattr(lib, "elx_complex_chase"):
            lib.elx_complex_chase.restype = ctypes.c_int
            lib.elx_complex_chase.argtypes = [
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.complex128, flags="C"),
                np.ctypeslib.ndpointer(np.complex128, flags="C"),
                np.ctypeslib.ndpointer(np.complex128, flags="C"),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
        if hasattr(lib, "elx_real_chase"):
            lib.elx_real_chase.restype = ctypes.c_int
            lib.elx_real_chase.argtypes = [
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
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


def hess_qr_real_native(H: np.ndarray, want_vecs: bool = True,
                        max_sweeps_per_eig: int = 40
                        ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Serial REAL Hessenberg QR with Francis double shifts (dlahqr-role):
    returns the quasi-triangular real Schur factor (standardized 1x1/2x2
    diagonal blocks). Raises RuntimeError if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "elx_hess_qr_real"):
        raise RuntimeError("native real hess_qr unavailable")
    n = H.shape[0]
    T = np.ascontiguousarray(H, np.float64).copy()
    Z = np.zeros((n, n) if want_vecs else (1, 1), np.float64)
    rc = lib.elx_hess_qr_real(n, T.reshape(-1), Z.reshape(-1),
                              int(want_vecs), int(max_sweeps_per_eig))
    if rc != 0:
        raise RuntimeError(f"elx_hess_qr_real rc={rc}")
    return T, (Z if want_vecs else None)


def real_aed_native(Hw: np.ndarray, beta: float, eps: float,
                    scale0: float = 0.0
                    ) -> Tuple[np.ndarray, np.ndarray, int, float, np.ndarray]:
    """Full native real AED window processing: window Schur, bottom-up
    per-block spike deflation with orthogonal block swaps, spike
    elimination and re-Hessenberg of the kept block — all window-local.
    Returns (Tw, W, n_deflated, gamma, shifts): apply W to the off-window strips
    and write ``gamma`` into the spike column head."""
    lib = _load()
    if lib is None or not hasattr(lib, "elx_real_aed"):
        raise RuntimeError("native real AED unavailable")
    w = Hw.shape[0]
    T = np.ascontiguousarray(Hw, np.float64).copy()
    Z = np.zeros((w, w), np.float64)
    g = np.zeros(1, np.float64)
    sh = np.zeros(2 * w, np.float64)
    d = lib.elx_real_aed(w, T.reshape(-1), Z.reshape(-1),
                         float(beta), float(eps), float(scale0), g, sh)
    if d < 0:
        raise RuntimeError("elx_real_aed failed")
    kept = w - d
    shifts = sh[:kept] + 1j * sh[w:w + kept]
    return T, Z, int(d), float(g[0]), shifts


def complex_aed_native(Hw: np.ndarray, beta: complex, eps: float,
                       scale0: float = 0.0
                       ) -> Tuple[np.ndarray, np.ndarray, int, complex, np.ndarray]:
    """Full native complex AED window processing (zlaqr3 role); see
    ``real_aed_native``. Returns (Tw, W, n_deflated, gamma, shifts)."""
    lib = _load()
    if lib is None or not hasattr(lib, "elx_complex_aed"):
        raise RuntimeError("native complex AED unavailable")
    w = Hw.shape[0]
    T = np.ascontiguousarray(Hw, np.complex128).copy()
    Z = np.zeros((w, w), np.complex128)
    g = np.zeros(2, np.float64)
    sh = np.zeros(2 * w, np.float64)
    d = lib.elx_complex_aed(w, T.reshape(-1), Z.reshape(-1),
                            float(np.real(beta)), float(np.imag(beta)),
                            float(eps), float(scale0), g, sh)
    if d < 0:
        raise RuntimeError("elx_complex_aed failed")
    kept = w - d
    shifts = sh[:kept] + 1j * sh[w:w + kept]
    return T, Z, int(d), complex(g[0], g[1]), shifts


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


def complex_chase_native(Tw: np.ndarray, shifts: np.ndarray, nb: int,
                         t0: int, span: int, l: int, m: int, k1: int,
                         k2: int) -> np.ndarray:
    """One accumulation-window pass of the complex multibulge chase
    (native/elx_chase.cpp). Mutates ``Tw`` (the window rows/cols
    [k1, k2) of T, complex128 contiguous) in place and returns the
    accumulated window unitary U (w x w). Raises RuntimeError when the
    native library is unavailable — the caller falls back to the numpy
    batched chase."""
    lib = _load()
    if lib is None or not hasattr(lib, "elx_complex_chase"):
        raise RuntimeError("native library unavailable")
    w = Tw.shape[0]
    U = np.empty((w, w), np.complex128)
    rc = lib.elx_complex_chase(
        w, Tw.reshape(-1), U.reshape(-1),
        np.ascontiguousarray(shifts, np.complex128),
        int(nb), int(t0), int(span), int(l), int(m), int(k1), int(k2))
    if rc != 0:
        raise RuntimeError(f"elx_complex_chase rc={rc}")
    return U


def real_chase_native(Tw: np.ndarray, shifts: np.ndarray, nb: int,
                      t0: int, span: int, l: int, m: int, k1: int,
                      k2: int) -> np.ndarray:
    """Real-arithmetic variant of :func:`complex_chase_native` (the
    shift array carries the PAIRED real parts — callers pass real
    two-shift sums/products via consecutive entries exactly as the
    numpy sweep does)."""
    lib = _load()
    if lib is None or not hasattr(lib, "elx_real_chase"):
        raise RuntimeError("native library unavailable")
    w = Tw.shape[0]
    U = np.empty((w, w), np.float64)
    rc = lib.elx_real_chase(
        w, Tw.reshape(-1), U.reshape(-1),
        np.ascontiguousarray(shifts, np.float64),
        int(nb), int(t0), int(span), int(l), int(m), int(k1), int(k2))
    if rc != 0:
        raise RuntimeError(f"elx_real_chase rc={rc}")
    return U


def sn_symbolic(colptr: np.ndarray, rowind: np.ndarray, n: int,
                perm0: np.ndarray, sn_max: int):
    """Native supernodal symbolic analysis (native/elx_symbolic.cpp):
    permute -> etree -> postorder -> relabel -> etree -> per-column
    structures -> width-capped fundamental supernodes, in one C++ pass
    (the Python set-based propagation cost ~70 s at 90k dof). Returns
    (permT, parent, sn_start, snid, sn_parent, sn_rows_list) or None
    when the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "elx_sn_symbolic"):
        return None
    colptr = np.ascontiguousarray(colptr, np.int64)
    rowind = np.ascontiguousarray(rowind, np.int32)
    perm0 = np.ascontiguousarray(perm0, np.int64)
    permT = np.zeros(n, np.int64)
    parent = np.zeros(n, np.int64)
    sn_start = np.zeros(n + 1, np.int64)
    snid = np.zeros(n, np.int64)
    sn_parent = np.zeros(n, np.int64)
    rowptr = np.zeros(n + 1, np.int64)
    cap = max(4 * rowind.shape[0] + 16 * n, 1)
    for _ in range(3):
        rows = np.zeros(cap, np.int64)
        nsn = lib.elx_sn_symbolic(n, colptr, rowind, perm0, sn_max,
                                  permT, parent, sn_start, snid,
                                  sn_parent, rowptr, rows, cap)
        if nsn >= 0:
            nsn = int(nsn)
            sn_rows = [rows[rowptr[s]:rowptr[s + 1]].copy()
                       for s in range(nsn)]
            return (permT, parent, sn_start[:nsn + 1].copy(),
                    snid, sn_parent[:nsn].copy(), sn_rows)
        if nsn == -1:
            return None
        cap = int(-nsn)
    return None
