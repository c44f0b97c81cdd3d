"""Euclidean minimization: least squares and constrained variants.

Reference: src/lapack_like/euclidean_min/ — LeastSquares (QR-based),
Ridge, Tikhonov, LSE (equality-constrained), GLM (general Gauss-Markov).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix, pad_array
from ..core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    MC,
    MR,
    NON_UNIT,
    NORMAL,
    Orientation,
    RIGHT,
    TRANSPOSE,
    UPPER,
)
from ..blas.gemm import Gemm
from ..blas.level1 import Adjoint, GetSubmatrix
from ..blas.trsm import Trsm


def LeastSquares(orientation: Orientation, A: DistMatrix, B: DistMatrix
                 ) -> DistMatrix:
    """min_X ||op(A) X - B||_F; underdetermined systems get the
    minimum-norm solution (reference: euclidean_min/LeastSquares.cpp via
    QR/LQ)."""
    if orientation != NORMAL:
        return LeastSquares(NORMAL, Adjoint(A.redistribute(MC, MR)), B)
    m, n = A.m, A.n
    if m >= n:
        # X = R^{-1} Q^H B
        from .qr import ApplyQ, QR

        fact = QR(A)
        QhB = ApplyQ(True, fact, B)
        Rtop = GetSubmatrix(fact.packed, slice(0, n), slice(0, n))
        Btop = GetSubmatrix(QhB, slice(0, n), slice(0, B.n))
        return Trsm(LEFT, UPPER, NORMAL, NON_UNIT, 1.0, Rtop, Btop)
    # minimum norm: A = L Q, X = Q^H L^{-1} B
    from .lq import LQ
    from .qr import ApplyQ, QRFactorization

    fact = LQ(A)
    Lsq = GetSubmatrix(fact.packed, slice(0, m), slice(0, m))
    Y = Trsm(LEFT, LOWER, NORMAL, NON_UNIT, 1.0, Lsq, B)
    # embed Y into n rows then apply Q^H (Q from the LQ = QR of A^H)
    Ydat = Y.redistribute(MC, MR).data
    n_pad = pad_array(jnp.zeros((n, Y.n), Ydat.dtype), A.grid)
    full = n_pad.at[:m, : Y.n].set(Ydat[:m, : Y.n])
    Yfull = DistMatrix.from_padded(full, n, Y.n, MC, MR, A.grid, A.wrap)
    qr_fact = QRFactorization(Adjoint(fact.packed), jnp.conj(fact.tau))
    return ApplyQ(False, qr_fact, Yfull)


def Ridge(orientation: Orientation, A: DistMatrix, B: DistMatrix,
          gamma: float) -> DistMatrix:
    """min ||A X - B||^2 + gamma^2 ||X||^2 via the HPD normal equations
    (reference: euclidean_min/Ridge.cpp)."""
    from .cholesky import HPDSolve

    if orientation != NORMAL:
        A = Adjoint(A.redistribute(MC, MR))
    G = Gemm(ADJOINT, NORMAL, 1.0, A, A)
    from ..blas.level1 import ShiftDiagonal

    G = ShiftDiagonal(G, gamma * gamma)
    AhB = Gemm(ADJOINT, NORMAL, 1.0, A, B)
    return HPDSolve(LOWER, NORMAL, G, AhB)


def Tikhonov(orientation: Orientation, A: DistMatrix, B: DistMatrix,
             G: DistMatrix) -> DistMatrix:
    """min ||A X - B||^2 + ||G X||^2 (reference: euclidean_min/Tikhonov.cpp)."""
    from .cholesky import HPDSolve

    if orientation != NORMAL:
        A = Adjoint(A.redistribute(MC, MR))
    N = Gemm(ADJOINT, NORMAL, 1.0, A, A)
    GtG = Gemm(ADJOINT, NORMAL, 1.0, G, G)
    Nfull = N.with_data(N.data + GtG.data.astype(N.dtype))
    AhB = Gemm(ADJOINT, NORMAL, 1.0, A, B)
    return HPDSolve(LOWER, NORMAL, Nfull, AhB)


def LSE(A: DistMatrix, B: DistMatrix, C: DistMatrix, D: DistMatrix
        ) -> DistMatrix:
    """min ||A X - C|| s.t. B X = D (reference: euclidean_min/LSE.cpp via
    generalized RQ; here the KKT saddle system solved by pivoted LU —
    mathematically equivalent, one distributed solve):
        [2 A^H A  B^H] [X]   [2 A^H C]
        [B        0  ] [l] = [D      ]
    """
    from .lu import LinearSolve

    n = A.n
    p = B.m
    AhA = Gemm(ADJOINT, NORMAL, 2.0, A, A)
    AhC = Gemm(ADJOINT, NORMAL, 2.0, A, C)
    Bd = B.redistribute(MC, MR).data[:p, :n]
    top = jnp.concatenate([AhA.data[:n, :n], jnp.conj(Bd.T)], axis=1)
    bot = jnp.concatenate([Bd, jnp.zeros((p, p), Bd.dtype)], axis=1)
    K = jnp.concatenate([top, bot], axis=0)
    rhs = jnp.concatenate([AhC.data[:n, : C.n],
                           D.redistribute(MC, MR).data[:p, : C.n]], axis=0)
    Kdm = DistMatrix.from_global(K, MC, MR, A.grid)
    Rdm = DistMatrix.from_global(rhs, MC, MR, A.grid)
    Z = LinearSolve(Kdm, Rdm)
    return GetSubmatrix(Z, slice(0, n), slice(0, C.n))


def GLM(A: DistMatrix, B: DistMatrix, D: DistMatrix):
    """General Gauss-Markov: min_{X,Y} ||Y|| s.t. D = A X + B Y
    (reference: euclidean_min/GLM.cpp via generalized QR; here the
    equivalent KKT system):
        [0    0    A^H ] [X]   [0]
        [0    I    B^H ] [Y] = [0]
        [A    B    0   ] [l]   [D]
    """
    from .lu import LinearSolve

    n, p, m = A.n, B.n, A.m
    Ad = A.redistribute(MC, MR).data[:m, :n]
    Bd = B.redistribute(MC, MR).data[:m, :p]
    dt = Ad.dtype
    Z = jnp.zeros
    row1 = jnp.concatenate([Z((n, n), dt), Z((n, p), dt), jnp.conj(Ad.T)],
                           axis=1)
    row2 = jnp.concatenate([Z((p, n), dt), jnp.eye(p, dtype=dt),
                            jnp.conj(Bd.T)], axis=1)
    row3 = jnp.concatenate([Ad, Bd, Z((m, m), dt)], axis=1)
    K = jnp.concatenate([row1, row2, row3], axis=0)
    nrhs = D.n
    rhs = jnp.concatenate([Z((n, nrhs), dt), Z((p, nrhs), dt),
                           D.redistribute(MC, MR).data[:m, :nrhs]], axis=0)
    Kdm = DistMatrix.from_global(K, MC, MR, A.grid)
    Rdm = DistMatrix.from_global(rhs, MC, MR, A.grid)
    S = LinearSolve(Kdm, Rdm)
    X = GetSubmatrix(S, slice(0, n), slice(0, nrhs))
    Y = GetSubmatrix(S, slice(n, n + p), slice(0, nrhs))
    return X, Y
