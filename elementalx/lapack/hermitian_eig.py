"""Hermitian eigensolvers.

Reference: src/lapack_like/spectral/HermitianEig.cpp:430-533 (driver:
scale -> tridiagonalize -> HermitianTridiagEig (pmrrr) -> backtransform),
HermitianEig/SDC.hpp (spectral divide-and-conquer alternative),
HermitianGenDefEig (Cholesky + TwoSidedTrsm), SkewHermitianEig.

TPU-native: the pmrrr stage is replaced by the batched bisection +
inverse-iteration solver (tridiag_eig.py); the backtransform is the
blocked compact-WY ApplyQ — all MXU matmuls."""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

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
    """Reference: include/El/lapack_like/spectral.hpp:411-433."""

    blocksize: Optional[int] = None
    use_sdc: bool = False
    sort: SortType = ASCENDING


def HermitianEig(uplo: UpperOrLower, A: DistMatrix, vectors: bool = True,
                 ctrl: Optional[HermitianEigCtrl] = None):
    """Full spectrum (w ascending) and optionally eigenvectors Q
    (reference: HermitianEig.cpp:1003-1040)."""
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
                       ctrl: Optional[HermitianEigCtrl] = None):
    """Generalized A x = lambda B x with B HPD (pencil type AXBX)
    (reference: spectral/HermitianGenDefEig.cpp): Cholesky of B, reduce to
    standard form with TwoSidedTrsm, solve, backtransform."""
    from ..blas.level3 import TwoSidedTrsm
    from .cholesky import Cholesky

    L = Cholesky(LOWER, B)
    C = TwoSidedTrsm(LOWER, NON_UNIT, A.redistribute(MC, MR), L)
    if not vectors:
        return HermitianEig(LOWER, C, vectors=False, ctrl=ctrl)
    w, Z = HermitianEig(LOWER, C, vectors=True, ctrl=ctrl)
    # x = L^{-H} z
    X = Trsm(LEFT, LOWER, ADJOINT, NON_UNIT, 1.0, L, Z)
    return w, X
