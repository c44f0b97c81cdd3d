"""BLAS-like level 3 beyond Gemm/Trsm.

Reference: src/blas_like/level3/ (SURVEY §2.3): Herk/Syrk, Her2k/Syr2k,
Symm/Hemm, Trmm, Trrk/Trr2k, Trtrmm, TwoSidedTrmm/TwoSidedTrsm,
MultiShiftTrsm, EVD reconstruction helpers.

TPU-native stance: triangular-restricted rank-k updates are computed as
full sharded MXU matmuls merged into the target triangle with a mask —
on the MXU a full matmul at 100% utilisation beats a half-FLOP kernel
with ragged tiles, and XLA fuses the select into the matmul epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix, check_same_grid
from ..core.environment import Blocksize
from ..core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    LeftOrRight,
    MC,
    MR,
    NON_UNIT,
    NORMAL,
    Orientation,
    RIGHT,
    TRANSPOSE,
    UNIT,
    UPPER,
    UnitOrNonUnit,
    UpperOrLower,
)
from .gemm import Gemm, local_gemm
from .level1 import MakeSymmetric, MakeTrapezoidal, Transpose, Adjoint
from .trsm import Trsm


def _tri_mask(A: DistMatrix, uplo: UpperOrLower, offset: int = 0):
    P, Q = A.data.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (P, Q), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (P, Q), 1)
    return (j - i >= offset) if uplo == UPPER else (j - i <= offset)


def _merge_triangle(uplo: UpperOrLower, new: DistMatrix, old: DistMatrix
                    ) -> DistMatrix:
    """Take the uplo triangle from ``new`` and the rest from ``old``."""
    mask = _tri_mask(old, uplo)
    return old.with_data(jnp.where(mask, new.data.astype(old.dtype), old.data))


def _op(X: DistMatrix, orientation: Orientation) -> DistMatrix:
    if orientation == NORMAL:
        return X
    if orientation == TRANSPOSE:
        return Transpose(X)
    return Adjoint(X)


# ---------------------------------------------------------------------------
# rank-k updates
# ---------------------------------------------------------------------------


def Herk(uplo: UpperOrLower, orientation: Orientation, alpha, A: DistMatrix,
         beta=0.0, C: DistMatrix = None) -> DistMatrix:
    """C := alpha op(A) op(A)^H + beta C on the uplo triangle
    (reference: level3/Herk.cpp)."""
    Aop = _op(A, orientation)
    prod = Gemm(NORMAL, ADJOINT, alpha, Aop, Aop,
                beta=beta if C is not None else 0.0, C=C)
    if C is None:
        return MakeTrapezoidal(uplo, prod)
    return _merge_triangle(uplo, prod, C.redistribute(MC, MR))


def Syrk(uplo: UpperOrLower, orientation: Orientation, alpha, A: DistMatrix,
         beta=0.0, C: DistMatrix = None) -> DistMatrix:
    """C := alpha op(A) op(A)^T + beta C on the triangle (Syrk.cpp)."""
    Aop = _op(A, orientation)
    prod = Gemm(NORMAL, TRANSPOSE, alpha, Aop, Aop,
                beta=beta if C is not None else 0.0, C=C)
    if C is None:
        return MakeTrapezoidal(uplo, prod)
    return _merge_triangle(uplo, prod, C.redistribute(MC, MR))


def Her2k(uplo: UpperOrLower, orientation: Orientation, alpha, A: DistMatrix,
          B: DistMatrix, beta=0.0, C: DistMatrix = None) -> DistMatrix:
    """C := alpha op(A) op(B)^H + conj(alpha) op(B) op(A)^H + beta C
    (reference: Her2k.cpp)."""
    Aop, Bop = _op(A, orientation), _op(B, orientation)
    P1 = Gemm(NORMAL, ADJOINT, alpha, Aop, Bop)
    P2 = Gemm(NORMAL, ADJOINT, jnp.conj(jnp.asarray(alpha)), Bop, Aop)
    total = P1.with_data(P1.data + P2.data.astype(P1.dtype))
    if C is not None:
        Cd = C.redistribute(MC, MR)
        total = total.with_data(total.data
                                + jnp.asarray(beta, total.dtype) * Cd.data)
        return _merge_triangle(uplo, total, Cd)
    return MakeTrapezoidal(uplo, total)


def Syr2k(uplo: UpperOrLower, orientation: Orientation, alpha, A: DistMatrix,
          B: DistMatrix, beta=0.0, C: DistMatrix = None) -> DistMatrix:
    """Reference: Syr2k.cpp."""
    Aop, Bop = _op(A, orientation), _op(B, orientation)
    P1 = Gemm(NORMAL, TRANSPOSE, alpha, Aop, Bop)
    P2 = Gemm(NORMAL, TRANSPOSE, alpha, Bop, Aop)
    total = P1.with_data(P1.data + P2.data.astype(P1.dtype))
    if C is not None:
        Cd = C.redistribute(MC, MR)
        total = total.with_data(total.data
                                + jnp.asarray(beta, total.dtype) * Cd.data)
        return _merge_triangle(uplo, total, Cd)
    return MakeTrapezoidal(uplo, total)


def Trrk(uplo: UpperOrLower, orientA: Orientation, orientB: Orientation,
         alpha, A: DistMatrix, B: DistMatrix, beta, C: DistMatrix
         ) -> DistMatrix:
    """Triangle-restricted C := alpha op(A) op(B) + beta C
    (reference: Trrk.cpp; the LocalTrrk workhorse of the factorizations)."""
    prod = Gemm(orientA, orientB, alpha, A, B, beta=beta, C=C)
    return _merge_triangle(uplo, prod, C.redistribute(MC, MR))


def Trr2k(uplo: UpperOrLower, orientA: Orientation, orientB: Orientation,
          orientC: Orientation, orientD: Orientation,
          alpha, A: DistMatrix, B: DistMatrix,
          beta, C: DistMatrix, D: DistMatrix,
          gamma, E: DistMatrix) -> DistMatrix:
    """Triangle-restricted E := alpha op(A)op(B) + beta op(C)op(D) + gamma E
    (reference: Trr2k.cpp)."""
    P1 = Gemm(orientA, orientB, alpha, A, B)
    P2 = Gemm(orientC, orientD, beta, C, D)
    Ed = E.redistribute(MC, MR)
    total = Ed.with_data(P1.data.astype(Ed.dtype) + P2.data.astype(Ed.dtype)
                         + jnp.asarray(gamma, Ed.dtype) * Ed.data)
    return _merge_triangle(uplo, total, Ed)


# ---------------------------------------------------------------------------
# symmetric / triangular multiplies
# ---------------------------------------------------------------------------


def Symm(side: LeftOrRight, uplo: UpperOrLower, alpha, A: DistMatrix,
         B: DistMatrix, beta=0.0, C: DistMatrix = None,
         conjugate: bool = False) -> DistMatrix:
    """C := alpha A B + beta C with A symmetric stored in uplo
    (reference: Symm.cpp). The reference avoids materialising the full A;
    here symmetrise + one MXU gemm is the faster schedule."""
    Afull = MakeSymmetric(uplo, A.redistribute(MC, MR), conjugate=conjugate)
    if side == LEFT:
        return Gemm(NORMAL, NORMAL, alpha, Afull, B, beta=beta, C=C)
    return Gemm(NORMAL, NORMAL, alpha, B, Afull, beta=beta, C=C)


def Hemm(side: LeftOrRight, uplo: UpperOrLower, alpha, A: DistMatrix,
         B: DistMatrix, beta=0.0, C: DistMatrix = None) -> DistMatrix:
    """Reference: Hemm.cpp."""
    return Symm(side, uplo, alpha, A, B, beta=beta, C=C, conjugate=True)


def _tri_data(A: DistMatrix, uplo: UpperOrLower, diag: UnitOrNonUnit
              ) -> DistMatrix:
    T = MakeTrapezoidal(uplo, A.redistribute(MC, MR))
    if diag == UNIT:
        from .level1 import FillDiagonal

        T = FillDiagonal(T, 1.0)
    return T


def Trmm(side: LeftOrRight, uplo: UpperOrLower, orientation: Orientation,
         diag: UnitOrNonUnit, alpha, A: DistMatrix, B: DistMatrix
         ) -> DistMatrix:
    """B := alpha op(A) B or alpha B op(A), A triangular
    (reference: Trmm.cpp)."""
    T = _tri_data(A, uplo, diag)
    if side == LEFT:
        return Gemm(orientation, NORMAL, alpha, T, B)
    return Gemm(NORMAL, orientation, alpha, B, T)


def Trtrmm(uplo: UpperOrLower, A: DistMatrix, conjugate: bool = False
           ) -> DistMatrix:
    """A := L^T L or U U^T (triangle x its transpose, result in the same
    triangle; reference: Trtrmm.cpp, used by triangular inversion)."""
    T = _tri_data(A, uplo, NON_UNIT)
    orient = ADJOINT if conjugate else TRANSPOSE
    if uplo == LOWER:
        prod = Gemm(orient, NORMAL, 1.0, T, T)
    else:
        prod = Gemm(NORMAL, orient, 1.0, T, T)
    return _merge_triangle(uplo, prod, A.redistribute(MC, MR))


# ---------------------------------------------------------------------------
# two-sided solves/multiplies (generalized eigenproblem reductions)
# ---------------------------------------------------------------------------


def TwoSidedTrsm(uplo: UpperOrLower, diag: UnitOrNonUnit, A: DistMatrix,
                 B: DistMatrix) -> DistMatrix:
    """A := inv(B) A inv(B)^H for Hermitian A and triangular B — the
    reduction of A x = lambda B x to standard form after Cholesky
    (reference: TwoSidedTrsm.cpp). For uplo=LOWER, B=L:
    A := inv(L) A inv(L)^H."""
    if uplo == LOWER:
        half = Trsm(LEFT, LOWER, NORMAL, diag, 1.0, B, A)
        return Trsm(RIGHT, LOWER, ADJOINT, diag, 1.0, B, half)
    half = Trsm(LEFT, UPPER, ADJOINT, diag, 1.0, B, A)
    return Trsm(RIGHT, UPPER, NORMAL, diag, 1.0, B, half)


def TwoSidedTrmm(uplo: UpperOrLower, diag: UnitOrNonUnit, A: DistMatrix,
                 B: DistMatrix) -> DistMatrix:
    """A := B^H A B (uplo=LOWER: L^H A L; reference: TwoSidedTrmm.cpp)."""
    if uplo == LOWER:
        half = Trmm(LEFT, LOWER, ADJOINT, diag, 1.0, B, A)
        return Trmm(RIGHT, LOWER, NORMAL, diag, 1.0, B, half)
    half = Trmm(LEFT, UPPER, NORMAL, diag, 1.0, B, A)
    return Trmm(RIGHT, UPPER, ADJOINT, diag, 1.0, B, half)


# ---------------------------------------------------------------------------
# multi-shift solves (eigenvector back-substitution)
# ---------------------------------------------------------------------------


def MultiShiftTrsm(side: LeftOrRight, uplo: UpperOrLower,
                   orientation: Orientation, alpha, T: DistMatrix,
                   shifts: jax.Array, B: DistMatrix) -> DistMatrix:
    """Solve (op(T) - shifts[j] I) X[:,j] = alpha B[:,j] per column
    (LEFT), or X[j,:] (op(T) - shifts[j] I) = alpha B[:,j] per row
    (RIGHT), for triangular T (reference: MultiShiftTrsm.cpp, used by
    TriangEig). Columns/rows are independent => vmapped batched
    triangular solves on the MXU. The reference only implements
    LEFT+UPPER (MultiShiftTrsm.cpp:28-37 raises otherwise); both sides
    and both uplos are supported here via transpose reductions."""
    if side != LEFT:
        # row j of X solves X[j,:] (op(T) - s_j) = alpha B[j,:], i.e.
        # (op(T)^T - s_j) X[j,:]^T = alpha B[j,:]^T — a LEFT solve with
        # the orientation flipped and B transposed
        flip = {NORMAL: TRANSPOSE, TRANSPOSE: NORMAL, ADJOINT: NORMAL}
        if orientation == ADJOINT:
            # X (T^H - s) = B  <=>  (conj(T) - s) X^T = B^T; reduce via
            # conjugation: solve (T - conj(s)) Y = conj(B^T), X^T = conj(Y)
            Tm = T.redistribute(MC, MR)
            Bt = Transpose(B)
            Bc = Bt.with_data(jnp.conj(Bt.data))
            Y = MultiShiftTrsm(LEFT, uplo, NORMAL, jnp.conj(
                jnp.asarray(alpha)), Tm, jnp.conj(jnp.asarray(shifts)), Bc)
            return Transpose(Y.with_data(jnp.conj(Y.data)))
        Xt = MultiShiftTrsm(LEFT, uplo, flip[orientation], alpha, T,
                            shifts, Transpose(B))
        return Transpose(Xt)
    Td = T.replicated()
    m = T.m
    lower = uplo == LOWER
    if orientation == TRANSPOSE:
        Td, lower = Td.T, not lower
    elif orientation == ADJOINT:
        Td, lower = jnp.conj(Td.T), not lower
    Bd = B.replicated() * jnp.asarray(alpha, B.dtype)
    M = Td.shape[0]
    sh = jnp.asarray(shifts).astype(Td.dtype)
    nshift = sh.shape[0]

    # blocked multi-shift sweep (MultiShiftTrsm.cpp's memory profile:
    # per window only an (nshift, nb, nb) shifted-diagonal batch)
    from .multishift import ms_blocked_upper
    from .quasi import _flip_idx

    rhs = Bd[:, :nshift]
    if lower:
        fl = _flip_idx(M, m)
        cols = ms_blocked_upper(Td[fl][:, fl], sh, rhs[fl],
                                Blocksize(), mrows=m)[fl]
    else:
        cols = ms_blocked_upper(Td, sh, rhs, Blocksize(), mrows=m)
    out = Bd.at[:, : nshift].set(cols)
    return DistMatrix.from_padded(out, B.m, B.n, MC, MR, B.grid, B.wrap)


# ---------------------------------------------------------------------------
# EVD reconstruction helpers (reference: HermitianFromEVD.cpp etc.)
# ---------------------------------------------------------------------------


def HermitianFromEVD(uplo: UpperOrLower, Q: DistMatrix, w: jax.Array
                     ) -> DistMatrix:
    """A := Q diag(w) Q^H (reference: HermitianFromEVD.cpp)."""
    Qd = Q.redistribute(MC, MR)
    wv = jnp.zeros((Qd.data.shape[1],), Qd.data.dtype).at[: w.shape[0]].set(
        w.astype(Qd.data.dtype))
    scaled = Qd.with_data(Qd.data * wv[None, :])
    return Gemm(NORMAL, ADJOINT, 1.0, scaled, Qd)


def NormalFromEVD(Q: DistMatrix, w: jax.Array) -> DistMatrix:
    """A := Q diag(w) Q^H with complex w (reference: NormalFromEVD.cpp)."""
    return HermitianFromEVD(LOWER, Q, w)


def Trdtrmm(uplo: UpperOrLower, A: DistMatrix, conjugate: bool = False
            ) -> DistMatrix:
    """A := L inv(D) L^T (LOWER) or U inv(D) U^T from an LDL-packed
    factor (unit triangle + D on the diagonal) — used to invert LDL
    factorizations (reference: level3/Trdtrmm.cpp)."""
    from ..blas.level1 import FillDiagonal, GetDiagonal, DiagonalSolve

    Am = A.redistribute(MC, MR)
    d = GetDiagonal(Am)
    T = _tri_data(Am, uplo, UNIT)
    orient = ADJOINT if conjugate else TRANSPOSE
    # L inv(D) L^T: scale columns of L by 1/d, multiply by L^T
    Ls = DiagonalSolve(RIGHT, NORMAL, d, T)
    if uplo == LOWER:
        prod = Gemm(NORMAL, orient, 1.0, Ls, T)
    else:
        prod = Gemm(orient, NORMAL, 1.0, T, Ls)
    return _merge_triangle(uplo, prod, Am)
