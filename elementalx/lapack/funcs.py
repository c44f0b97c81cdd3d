"""Matrix functions: inverses, sign, square root.

Reference: src/lapack_like/funcs/ — Inverse (LU-based general, HPD,
triangular), Pseudoinverse (SVD), Sign (Newton with determinant scaling,
funcs/Sign.cpp), SquareRoot (Newton), HermitianFunction (eig + f(Lambda)).

All iterations are matmul/solve-dominated — exactly what the MXU wants;
each Newton step is a distributed LU solve."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    MC,
    MR,
    NON_UNIT,
    NORMAL,
    UNIT,
    UPPER,
    UnitOrNonUnit,
    UpperOrLower,
)
from ..blas.gemm import Gemm
from ..blas.level1 import FillDiagonal, MakeTrapezoidal, Zero
from ..blas.trsm import Trsm


def _identity_like(A: DistMatrix) -> DistMatrix:
    return FillDiagonal(Zero(A), 1.0)


def TriangularInverse(uplo: UpperOrLower, diag: UnitOrNonUnit,
                      A: DistMatrix) -> DistMatrix:
    """inv of a triangular matrix (reference: funcs/Inverse/Triangular.cpp)
    via the distributed blocked Trsm against I."""
    I = _identity_like(A.redistribute(MC, MR))
    X = Trsm(LEFT, uplo, NORMAL, diag, 1.0, A, I)
    return MakeTrapezoidal(uplo, X)


def Inverse(A: DistMatrix) -> DistMatrix:
    """General inverse via pivoted LU (reference: funcs/Inverse/General.cpp)."""
    from .lu import LU, SolveAfter

    F, P = LU(A)
    I = _identity_like(A.redistribute(MC, MR))
    return SolveAfter(NORMAL, F, P, I)


def HPDInverse(uplo: UpperOrLower, A: DistMatrix) -> DistMatrix:
    """Reference: funcs/Inverse/HPD.cpp (Cholesky-based)."""
    from .cholesky import Cholesky, SolveAfter as CholSolve

    L = Cholesky(uplo, A)
    I = _identity_like(A.redistribute(MC, MR))
    return CholSolve(uplo, NORMAL, L, I)


def SymmetricInverse(uplo: UpperOrLower, A: DistMatrix,
                     conjugate: bool = False) -> DistMatrix:
    """Reference: funcs/Inverse/Symmetric.cpp (LDL-based)."""
    from ..blas.level1 import MakeSymmetric
    from .ldl import LDL, SolveAfter as LDLSolve

    Af = MakeSymmetric(uplo, A.redistribute(MC, MR), conjugate=conjugate)
    F = LDL(Af, conjugate=conjugate)
    I = _identity_like(Af)
    return LDLSolve(F, I, conjugate=conjugate)


def HermitianInverse(uplo: UpperOrLower, A: DistMatrix) -> DistMatrix:
    return SymmetricInverse(uplo, A, conjugate=True)


def Pseudoinverse(A: DistMatrix, tol: Optional[float] = None) -> DistMatrix:
    """Moore-Penrose via SVD (reference: funcs/Pseudoinverse.cpp)."""
    from ..blas.level1 import DiagonalScale, Adjoint
    from .svd import SVD

    U, s, V = SVD(A)
    eps = jnp.finfo(jnp.real(A.data).dtype).eps
    cutoff = (tol if tol is not None
              else max(A.m, A.n) * eps) * s[0]
    sinv = jnp.where(s > cutoff, 1.0 / jnp.where(s == 0, 1, s),
                     jnp.zeros_like(s))
    # pinv = V diag(sinv) U^H
    Vd = V.redistribute(MC, MR)
    k = sinv.shape[0]
    scal = jnp.zeros((Vd.data.shape[1],), Vd.dtype).at[:k].set(
        sinv.astype(Vd.dtype))
    Vs = Vd.with_data(Vd.data * scal[None, :])
    return Gemm(NORMAL, ADJOINT, 1.0, Vs, U)


class SignCtrl:
    """Reference: include/El/lapack_like/funcs.hpp SignCtrl."""

    def __init__(self, max_its: int = 100, tol: float = 0.0,
                 power: float = 1.0, scaling: str = "determinant"):
        self.max_its = max_its
        self.tol = tol
        self.scaling = scaling


def Sign(A: DistMatrix, ctrl: Optional[SignCtrl] = None) -> DistMatrix:
    """Matrix sign via scaled Newton iteration
    X_{k+1} = (mu X + (mu X)^{-1}) / 2 with determinant scaling
    (reference: funcs/Sign.cpp). One pivoted LU per step supplies BOTH
    the determinant scaling (from diag(U) + pivot parity) and the
    inverse."""
    ctrl = ctrl or SignCtrl()
    from .lu import LU, SolveAfter

    X = A.redistribute(MC, MR)
    n = A.m
    eps = jnp.finfo(jnp.real(X.data).dtype).eps
    tol = ctrl.tol or n * eps
    its = min(ctrl.max_its, 30)
    I = FillDiagonal(Zero(X), 1.0)
    for _ in range(its):
        F, P = LU(X)
        # determinant magnitude from diag(U): mu = |det X|^{-1/n}
        d = jnp.diagonal(F.data)
        idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        mag = jnp.where(idx < n, jnp.abs(d), jnp.ones_like(jnp.abs(d)))
        kappa = jnp.sum(jnp.log(mag)) / n
        mu = jnp.exp(-kappa).astype(jnp.real(X.data).dtype)
        # inv(X) from the same factors; Newton step on the scaled iterate:
        # (mu X + (mu X)^{-1})/2 = (mu X + inv(X)/mu)/2
        Xinv = SolveAfter(NORMAL, F, P, I)
        newd = 0.5 * (mu.astype(X.dtype) * X.data
                      + Xinv.data / mu.astype(X.dtype))
        diff = jnp.linalg.norm(newd - X.data)
        X = X.with_data(newd)
        # early exit only outside jit
        try:
            if float(diff) <= float(tol) * float(jnp.linalg.norm(newd)):
                break
        except (jax.errors.TracerArrayConversionError, TypeError):
            pass
    return X


def SquareRoot(A: DistMatrix, max_its: int = 30) -> DistMatrix:
    """Principal square root via the Denman-Beavers iteration
    (reference: funcs/SquareRoot.cpp Newton variant):
    Y_{k+1} = (Y_k + Z_k^{-1})/2, Z_{k+1} = (Z_k + Y_k^{-1})/2."""
    Y = A.redistribute(MC, MR)
    Z = _identity_like(Y)
    eps = jnp.finfo(jnp.real(Y.data).dtype).eps
    for _ in range(max_its):
        Yinv = Inverse(Y)
        Zinv = Inverse(Z)
        Y2 = Y.with_data(0.5 * (Y.data + Zinv.data))
        Z2 = Z.with_data(0.5 * (Z.data + Yinv.data))
        diff = jnp.linalg.norm(Y2.data - Y.data)
        Y, Z = Y2, Z2
        try:  # eager early exit (mirrors Sign)
            if float(diff) <= 10 * float(eps) * float(jnp.linalg.norm(Y.data)):
                break
        except (jax.errors.TracerArrayConversionError, TypeError):
            pass
    return Y


def HPSDSquareRoot(uplo: UpperOrLower, A: DistMatrix) -> DistMatrix:
    """Hermitian PSD square root via eigendecomposition
    (reference: funcs/SquareRoot.cpp HPSD path)."""
    from ..blas.level3 import HermitianFromEVD
    from .hermitian_eig import HermitianEig

    w, Q = HermitianEig(uplo, A)
    wc = jnp.where(w > 0, jnp.sqrt(jnp.where(w > 0, w, 0)), 0.0)
    return HermitianFromEVD(uplo, Q, wc)


def HermitianFunction(uplo: UpperOrLower, A: DistMatrix, f) -> DistMatrix:
    """A := Q f(Lambda) Q^H (reference: funcs/HermitianFunction.cpp)."""
    from ..blas.level3 import HermitianFromEVD
    from .hermitian_eig import HermitianEig

    w, Q = HermitianEig(uplo, A)
    return HermitianFromEVD(uplo, Q, f(w))


def HermitianSign(uplo: UpperOrLower, A: DistMatrix,
                  want_n: bool = False):
    """Matrix sign of a Hermitian matrix via its eigendecomposition,
    A := Q sgn(Lambda) Q^H; with ``want_n`` also returns
    N = Q |Lambda| Q^H (reference: funcs/Sign.cpp HermitianSign —
    zero eigenvalues map to sign 0, as there)."""
    from ..blas.level3 import HermitianFromEVD
    from .hermitian_eig import HermitianEig

    w, Q = HermitianEig(uplo, A)
    sgn = jnp.where(w > 0, 1.0, jnp.where(w < 0, -1.0, 0.0)).astype(w.dtype)
    S = HermitianFromEVD(uplo, Q, sgn)
    if not want_n:
        return S
    return S, HermitianFromEVD(uplo, Q, jnp.abs(w))


def HermitianPseudoinverse(uplo: UpperOrLower, A: DistMatrix,
                           tol: Optional[float] = None) -> DistMatrix:
    """Moore-Penrose pseudoinverse of a Hermitian matrix: invert the
    eigenvalues above the tolerance, zero the rest (reference:
    funcs/Pseudoinverse.cpp HermitianPseudoinverse; default tolerance
    n eps max|w|)."""
    from ..blas.level3 import HermitianFromEVD
    from .hermitian_eig import HermitianEig

    w, Q = HermitianEig(uplo, A)
    eps = jnp.finfo(w.dtype).eps
    cutoff = (A.m * eps * jnp.max(jnp.abs(w))) if tol is None else tol
    keep = jnp.abs(w) > cutoff
    inv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    return HermitianFromEVD(uplo, Q, inv)


def HPSDCholesky(uplo: UpperOrLower, A: DistMatrix) -> DistMatrix:
    """Cholesky-like factor of a Hermitian positive SEMI-definite
    matrix (reference: factor/Cholesky.cpp:176 HPSDCholesky):
    S := sqrt(A), then the triangular factor of S's QR (UPPER:
    A = S^H S = R^H R) or LQ (LOWER: A = S S^H = L L^H), with the
    diagonal phase absorbed so the factor diagonal is nonnegative."""
    from ..core.types import LOWER as _LOW, UPPER as _UP
    from ..blas.level1 import MakeHermitian, MakeTrapezoidal
    from .qr import QR

    S = MakeHermitian(uplo, HPSDSquareRoot(uplo, A))
    if uplo == _UP:
        R = MakeTrapezoidal(_UP, QR(S).packed)
        d = jnp.diagonal(R.data)
        phase = jnp.where(jnp.abs(d) == 0, jnp.ones_like(d),
                          jnp.conj(d) / jnp.where(jnp.abs(d) == 0, 1,
                                                  jnp.abs(d)))
        return R.with_data(R.data * phase[:, None])
    from ..blas.level1 import Adjoint

    # LOWER: A = L L^H with L = R^H of the UPPER factorization of the
    # same Hermitian matrix (R^H R = A  =>  L = R^H); symmetrize first
    # so the UPPER path reads valid data
    return Adjoint(HPSDCholesky(_UP, MakeHermitian(uplo, A)))
