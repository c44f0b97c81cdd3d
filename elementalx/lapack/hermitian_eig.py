"""Hermitian eigensolvers.

Reference: src/lapack_like/spectral/HermitianEig.cpp:430-533 (driver:
scale -> tridiagonalize -> HermitianTridiagEig (pmrrr) -> backtransform),
HermitianEig/SDC.hpp (spectral divide-and-conquer alternative),
HermitianGenDefEig (Cholesky + TwoSidedTrsm), SkewHermitianEig.

TPU-native: the pmrrr stage is replaced by the batched bisection +
inverse-iteration solver (tridiag_eig.py); the backtransform is the
blocked compact-WY ApplyQ — all MXU matmuls."""

from __future__ import annotations

import functools

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import (
    ADJOINT,
    ASCENDING,
    LEFT,
    LOWER,
    MC,
    MR,
    NON_UNIT,
    NORMAL,
    SortType,
    UPPER,
    UpperOrLower,
)
from ..blas.trsm import Trsm
from .condense import HermitianTridiag, tridiag_apply_q
from .tridiag_eig import tridiag_eig, tridiag_eigvalsh


class HermitianEigCtrl(NamedTuple):
    """Reference: include/El/lapack_like/spectral.hpp:411-433.
    ``refine=True`` post-processes the working-precision (f32) MXU
    eigendecomposition with the Ozaki-residual Rayleigh/inverse-iteration
    sweeps of lapack/refine.py to ~f64 residuals (the reference reaches
    f64 natively; this is the TPU-native equivalent tier)."""

    blocksize: Optional[int] = None
    use_sdc: bool = False
    sort: SortType = ASCENDING
    refine: bool = False
    refine_iters: int = 8  # CAP: the device path exits early on plateau
    # tridiagonalization stage: 'auto' picks two-stage SBR (lapack/sbr.py)
    # on TPU for large real f32 problems (where it beats the one-stage
    # latrd path — PERF.md), 'latrd'/'sbr' force a path ('sbr' off-TPU
    # runs the dense stage-2 reference; tests use it with a small band)
    tridiag_alg: str = "auto"
    band: int = 256  # SBR stage-1 bandwidth (kernel needs % 128 == 0)


def HermitianEig(uplo: UpperOrLower, A: DistMatrix, vectors: bool = True,
                 ctrl: Optional[HermitianEigCtrl] = None):
    """Full spectrum (w ascending) and optionally eigenvectors Q
    (reference: HermitianEig.cpp:1003-1040). With ``ctrl.refine`` the
    f32 decomposition is refined host-driven (device matmuls) to ~f64
    residuals and returned as (w64, Q in f64). NOTE: the refined return
    values keep f64 only when jax x64 is enabled — without it the final
    ``jnp.asarray`` wrap truncates them back to f32 grade; use
    ``lapack.refine.RefinedHermitianEig`` directly for numpy f64
    results independent of the x64 flag."""
    ctrl = ctrl or HermitianEigCtrl()
    if ctrl.refine:
        # TPU backends dispatch to the DEVICE-RESIDENT dw refinement
        # (lapack/refine_device.py — Ozaki products on the MXU, only a
        # per-sweep residual scalar leaves the device, early exit on
        # plateau); the host-orchestrated path stays for CPU backends
        # (where XLA:CPU's FMA contraction breaks the on-device EFTs —
        # see refine_device._refine_device) and for complex input
        # (the axon tunnel cannot move complex buffers).
        from ..kernels.common import on_tpu

        use_device = on_tpu() and not jnp.iscomplexobj(A.data)
        if use_device:
            from .refine_device import RefinedHermitianEigDevice

            w64, V64, _ = RefinedHermitianEigDevice(
                uplo, A, iters=ctrl.refine_iters)
        else:
            from .refine import RefinedHermitianEig

            w64, V64, _ = RefinedHermitianEig(uplo, A,
                                              iters=ctrl.refine_iters)
        if not vectors:
            # eigenvalues-only refinement still needs the vectors as
            # the Rayleigh frame; compute and drop them
            return jnp.asarray(w64)
        Q = DistMatrix.from_global(jnp.asarray(V64), MC, MR, A.grid)
        return jnp.asarray(w64), Q
    return _hermitian_eig_jit(uplo, A, vectors,
                              ctrl._replace(refine=False))


@functools.partial(jax.jit, static_argnames=('uplo', 'vectors', 'ctrl'))
def _hermitian_eig_jit(uplo: UpperOrLower, A: DistMatrix,
                       vectors: bool = True,
                       ctrl: Optional[HermitianEigCtrl] = None):
    ctrl = ctrl or HermitianEigCtrl()
    n = A.m
    if n != A.n:
        raise ValueError("HermitianEig requires square A")

    # scale to a safe range (reference: HermitianEig.cpp:430-448)
    from ..blas.level1 import MakeHermitian, MaxAbs

    Af = MakeHermitian(uplo, A.redistribute(MC, MR))
    rdt = jnp.real(Af.data).dtype
    maxabs = MaxAbs(Af)
    underflow = jnp.sqrt(jnp.finfo(rdt).tiny)
    overflow = jnp.sqrt(jnp.finfo(rdt).max) / n
    scale = jnp.where(maxabs > overflow, overflow / maxabs,
                      jnp.where((maxabs < underflow) & (maxabs > 0),
                                underflow / maxabs, jnp.ones((), rdt)))
    Af = Af.with_data(Af.data * scale.astype(Af.dtype))

    # --- tridiagonalization stage selection -------------------------------
    # Two-stage successive band reduction (lapack/sbr.py): full->band at
    # GEMM rate + a VMEM-resident Pallas bulge chase. Beats the one-stage
    # latrd path at large n on TPU (PERF.md: tridiag stage 8192 561 ms vs
    # 916). Reference role: condense/HermitianTridiag.cpp:82-116.
    from ..kernels.common import on_tpu

    _can_sbr = (A.grid.size == 1 and rdt == jnp.float32
                and not jnp.iscomplexobj(Af.data))
    if ctrl.tridiag_alg == "sbr":
        use_sbr = _can_sbr
    elif ctrl.tridiag_alg == "auto":
        use_sbr = _can_sbr and on_tpu() and n >= 8192
    else:
        use_sbr = False
    if use_sbr:
        from .sbr import sbr_apply_q, sbr_tridiag

        b = ctrl.band
        npad = -(-n // b) * b
        Ag = Af.data[:n, :n]
        if npad != n:
            Ag = jnp.pad(Ag, ((0, npad - n), (0, npad - n)))
        sfact = sbr_tridiag(Ag, b=b, use_kernel=on_tpu())
        d = sfact.d[:n]
        e = sfact.e[: max(n - 1, 0)]
        if not vectors:
            return tridiag_eigvalsh(d, e) / scale
        w, Z = tridiag_eig(d, e)
        w = w / scale
        Zp = jnp.zeros((npad, n), jnp.float32).at[:n, :].set(
            Z.astype(jnp.float32))
        Qg = sbr_apply_q(sfact, Zp, b)[:n, :]
        Q = DistMatrix.from_global(Qg, MC, MR, A.grid)
        return w, Q

    fact = HermitianTridiag(LOWER, Af, blocksize=ctrl.blocksize)
    d = fact.d[:n]
    e = fact.e[: max(n - 1, 0)]

    if not vectors:
        w = tridiag_eigvalsh(d, e) / scale
        return w

    w, Z = tridiag_eig(d, e)
    w = w / scale
    # backtransform: Q = (Q_householder D) Z
    M = fact.packed.data.shape[0]
    Zfull = jnp.zeros((M, M), fact.packed.dtype)
    Zfull = Zfull.at[:n, :n].set(Z.astype(fact.packed.dtype))
    Qd = tridiag_apply_q(fact, Zfull, adjoint=False,
                         blocksize=ctrl.blocksize)
    Q = DistMatrix.from_padded(
        Af.mask_padding(Qd), n, n, MC, MR, A.grid, A.wrap)
    return w, Q


def HermitianEigSubset(uplo: UpperOrLower, A: DistMatrix, il: int, iu: int,
                       ctrl: Optional[HermitianEigCtrl] = None):
    """Eigenpairs with (0-based, inclusive) indices il..iu — bisection
    computes exactly the requested window (reference:
    HermitianEig.cpp subset dispatch + MRRREstimate :58-77)."""
    w, Q = HermitianEig(uplo, A, vectors=True, ctrl=ctrl)
    k = iu - il + 1
    wsub = jax.lax.dynamic_slice(w, (il,), (k,))
    n = A.m
    from ..blas.level1 import GetSubmatrix

    Qsub = GetSubmatrix(Q, slice(0, n), slice(il, iu + 1))
    return wsub, Qsub


def HermitianEigSDC(uplo: UpperOrLower, A: DistMatrix, cutoff: int = 128,
                    _depth: int = 0):
    """Spectral divide-and-conquer via the QDWH-computed matrix sign —
    every level is QR factorizations + MXU matmuls (reference:
    HermitianEig/SDC.hpp; algorithm of Nakatsukasa-Higham). The scalable
    large-N path; the tridiagonal pipeline remains the default."""
    import numpy as np

    from ..blas.level1 import MakeHermitian
    from ..core.dmatrix import pad_array
    from .polar import qdwh
    from .qr import _qr_packed
    from .reflect import ExpandPackedReflectors

    n = A.m
    Af = MakeHermitian(uplo, A.redistribute(MC, MR))
    if n <= cutoff or _depth > 30:
        return HermitianEig(LOWER, Af)
    # split point: median of the diagonal (cheap spectral proxy; retries
    # shift it by fractions of the norm)
    diag = jnp.real(jnp.diagonal(Af.data))[:n]
    sigma0 = float(jnp.median(diag))
    nrm = float(jnp.max(jnp.abs(Af.data)))
    for attempt in range(4):
        sigma = sigma0 + (0.0, 0.25, -0.25, 0.5)[attempt] * nrm
        shifted = Af.data - sigma * (
            jax.lax.broadcasted_iota(jnp.int32, Af.data.shape, 0)
            == jax.lax.broadcasted_iota(jnp.int32, Af.data.shape, 1)
        ).astype(Af.dtype) * (
            jax.lax.broadcasted_iota(jnp.int32, Af.data.shape, 0) < n
        ).astype(Af.dtype)
        S = qdwh(shifted, n)  # Hermitian => polar factor == sign
        S = 0.5 * (S + jnp.conj(S.T))
        P = Af.with_data(0.5 * (
            jnp.eye(S.shape[0], dtype=S.dtype)
            * (jnp.arange(S.shape[0]) < n)[None, :] - S))
        k = int(round(float(jnp.real(jnp.trace(P.data[:n, :n])))))
        if 0 < k < n:
            break
    else:
        return HermitianEig(LOWER, Af)
    # invariant-subspace basis via a randomized range finder + blocked QR:
    # P G spans range(P) (exact projector, rank k) w.h.p.; the FULL Q of
    # its QR supplies the orthogonal complement for V2. O(n^2 k) MXU work
    # vs. the O(n) sequential steps of column-pivoted QR.
    key = jax.random.key(1234 + _depth)
    G = jax.random.normal(key, (n, n), jnp.real(Af.data).dtype).astype(
        Af.dtype)
    PG = P.data[:n, :n] @ G
    packed, tau = _qr_packed(PG, n, n, 64)
    Qfull = ExpandPackedReflectors(packed, tau, 64, n, n)
    V = Qfull[:n, :n]
    At = jnp.conj(V.T) @ Af.data[:n, :n] @ V
    A1 = DistMatrix.from_global(At[:k, :k], MC, MR, A.grid)
    A2 = DistMatrix.from_global(At[k:, k:], MC, MR, A.grid)
    w1, Q1 = HermitianEigSDC(LOWER, A1, cutoff, _depth + 1)
    w2, Q2 = HermitianEigSDC(LOWER, A2, cutoff, _depth + 1)
    w = jnp.concatenate([w1[:k], w2[: n - k]])
    order = jnp.argsort(w)
    Qc = jnp.zeros((n, n), Af.dtype)
    Qc = Qc.at[:k, :k].set(Q1.data[:k, :k].astype(Af.dtype))
    Qc = Qc.at[k:, k:].set(Q2.data[: n - k, : n - k].astype(Af.dtype))
    Qg = (V @ Qc)[:, order]
    Qdm = DistMatrix.from_global(Qg, MC, MR, A.grid)
    return w[order], Qdm


def SkewHermitianEig(uplo: UpperOrLower, G: DistMatrix, vectors: bool = True,
                     ctrl: Optional[HermitianEigCtrl] = None):
    """Eigenvalues i*w of a skew-Hermitian G via HermitianEig(i G)
    (reference: spectral/SkewHermitianEig.cpp)."""
    Gm = G.redistribute(MC, MR)
    data = Gm.data
    if not jnp.iscomplexobj(data):
        data = data.astype(jnp.complex128 if data.dtype == jnp.float64
                           else jnp.complex64)
    A = Gm.with_data(1j * data)
    return HermitianEig(uplo, A, vectors, ctrl)


def HermitianGenDefEig(uplo: UpperOrLower, A: DistMatrix, B: DistMatrix,
                       vectors: bool = True,
                       ctrl: Optional[HermitianEigCtrl] = None,
                       pencil: str = "AXBX"):
    """Generalized Hermitian-definite eigenproblems with B HPD
    (reference: spectral/HermitianGenDefEig.cpp, Pencil enum):
      AXBX:  A x = lambda B x   -> C = inv(L) A inv(L)^H,  x = L^{-H} z
      ABX:   A B x = lambda x   -> C = L^H A L,            x = L^{-H} z
      BAX:   B A x = lambda x   -> C = L^H A L,            x = L z
    via Cholesky of B = L L^H + TwoSidedTrsm/Trmm."""
    from ..blas.level3 import TwoSidedTrmm, TwoSidedTrsm
    from ..blas.trsm import Trsm as _Trsm
    from ..blas.level3 import Trmm
    from ..core.types import RIGHT

    from .cholesky import Cholesky

    L = Cholesky(LOWER, B)
    if pencil == "AXBX":
        C = TwoSidedTrsm(LOWER, NON_UNIT, A.redistribute(MC, MR), L)
    elif pencil in ("ABX", "BAX"):
        C = TwoSidedTrmm(LOWER, NON_UNIT, A.redistribute(MC, MR), L)
    else:
        raise ValueError(pencil)
    if not vectors:
        return HermitianEig(LOWER, C, vectors=False, ctrl=ctrl)
    w, Z = HermitianEig(LOWER, C, vectors=True, ctrl=ctrl)
    if pencil in ("AXBX", "ABX"):
        X = Trsm(LEFT, LOWER, ADJOINT, NON_UNIT, 1.0, L, Z)
    else:  # BAX
        from ..core.types import UNIT as _U

        X = Trmm(LEFT, LOWER, NORMAL, NON_UNIT, 1.0, L, Z)
    return w, X


def HermitianEigValueSubset(uplo: UpperOrLower, A: DistMatrix,
                            vl: float, vu: float,
                            ctrl: Optional[HermitianEigCtrl] = None):
    """Eigenpairs with eigenvalues in (vl, vu] (reference:
    HermitianEig.cpp value-range dispatch). Eager-only (the count is
    data-dependent): returns (w_subset, Q_subset)."""
    import numpy as np

    w, Q = HermitianEig(uplo, A, vectors=True, ctrl=ctrl)
    wnp = np.asarray(w)
    sel = np.where((wnp > vl) & (wnp <= vu))[0]
    from ..blas.level1 import GetSubmatrix

    if sel.size == 0:
        return wnp[:0], None
    lo, hi = int(sel[0]), int(sel[-1])
    n = A.m
    Qs = GetSubmatrix(Q, slice(0, n), slice(lo, hi + 1))
    return w[lo:hi + 1], Qs
