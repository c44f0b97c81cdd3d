"""BLAS-like level 1: entrywise and reduction operations.

Reference: include/El/blas_like/level1/*.hpp + src/blas_like/level1/
(SURVEY §2.3). Every op here is embarrassingly data-parallel, so the
TPU-native form is a plain jnp expression on the padded global array —
XLA fuses chains of them and never communicates except for reductions
(psum over the mesh, emitted automatically).

All ops preserve the padding-is-zero invariant (see core.dmatrix): ops
whose function does not map 0 -> 0 re-mask the padding region.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix, check_same_grid, pad_array
from ..core.types import (
    Dist,
    LOWER,
    MC,
    MD,
    MR,
    STAR,
    UPPER,
    UpperOrLower,
)

Scalar = Union[float, complex, jax.Array]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _like(A: DistMatrix, data: jax.Array) -> DistMatrix:
    return A.with_data(data)


def _binary(A: DistMatrix, B: DistMatrix, f) -> DistMatrix:
    check_same_grid(A, B)
    if A.shape != B.shape:
        raise ValueError(f"shape mismatch {A.shape} vs {B.shape}")
    Bd = B.data if B.dist == A.dist else B.redistribute(*A.dist).data
    return _like(A, f(A.data, Bd))


def _iota_masks(A: DistMatrix):
    P, Q = A.data.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (P, Q), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (P, Q), 1)
    return i, j


# ---------------------------------------------------------------------------
# fills / structure
# ---------------------------------------------------------------------------


def Zero(A: DistMatrix) -> DistMatrix:
    """Reference: blas_like/level1/Zero.hpp."""
    return _like(A, jnp.zeros_like(A.data))


def Fill(A: DistMatrix, alpha: Scalar) -> DistMatrix:
    """Fill the logical region with alpha (reference: Fill.hpp)."""
    full = jnp.full_like(A.data, alpha)
    return _like(A, A.mask_padding(full))


def FillDiagonal(A: DistMatrix, alpha: Scalar, offset: int = 0) -> DistMatrix:
    i, j = _iota_masks(A)
    on_diag = (j - i == offset) & A.pad_mask()
    return _like(A, jnp.where(on_diag, jnp.asarray(alpha, A.dtype), A.data))


def ShiftDiagonal(A: DistMatrix, alpha: Scalar, offset: int = 0) -> DistMatrix:
    """A += alpha*I on the given diagonal (reference: ShiftDiagonal.hpp)."""
    i, j = _iota_masks(A)
    on_diag = (j - i == offset) & A.pad_mask()
    return _like(A, A.data + jnp.where(on_diag, jnp.asarray(alpha, A.dtype),
                                       jnp.zeros((), A.dtype)))


def MakeTrapezoidal(uplo: UpperOrLower, A: DistMatrix, offset: int = 0) -> DistMatrix:
    """Zero outside the upper/lower trapezoid (reference: MakeTrapezoidal.hpp)."""
    i, j = _iota_masks(A)
    keep = (j - i >= offset) if uplo == UPPER else (j - i <= offset)
    return _like(A, jnp.where(keep, A.data, jnp.zeros((), A.dtype)))


def ScaleTrapezoid(alpha: Scalar, uplo: UpperOrLower, A: DistMatrix,
                   offset: int = 0) -> DistMatrix:
    """Scale the trapezoid by alpha (reference: ScaleTrapezoid.hpp)."""
    i, j = _iota_masks(A)
    inside = (j - i >= offset) if uplo == UPPER else (j - i <= offset)
    return _like(A, jnp.where(inside, A.data * jnp.asarray(alpha, A.dtype), A.data))


def MakeSymmetric(uplo: UpperOrLower, A: DistMatrix,
                  conjugate: bool = False) -> DistMatrix:
    """Reflect the uplo triangle to the other side
    (reference: MakeSymmetric.hpp / MakeHermitian)."""
    d = A.data
    dT = jnp.conj(d.T) if conjugate else d.T
    i, j = _iota_masks(A)
    take_own = (j >= i) if uplo == UPPER else (j <= i)
    out = jnp.where(take_own, d, dT)
    if conjugate:
        diag = (i == j)
        out = jnp.where(diag, jnp.real(out).astype(A.dtype), out)
    return _like(A, out)


def MakeHermitian(uplo: UpperOrLower, A: DistMatrix) -> DistMatrix:
    return MakeSymmetric(uplo, A, conjugate=True)


def MakeReal(A: DistMatrix) -> DistMatrix:
    return _like(A, jnp.real(A.data).astype(A.dtype))


def Conjugate(A: DistMatrix) -> DistMatrix:
    return _like(A, jnp.conj(A.data))


def RealPart(A: DistMatrix) -> DistMatrix:
    return _like(A, jnp.real(A.data))


def ImagPart(A: DistMatrix) -> DistMatrix:
    return _like(A, jnp.imag(A.data))


# ---------------------------------------------------------------------------
# scaling / axpy family
# ---------------------------------------------------------------------------


def Scale(alpha: Scalar, A: DistMatrix) -> DistMatrix:
    """Reference: Scale.hpp."""
    return _like(A, A.data * jnp.asarray(alpha, A.data.dtype))


def SafeScale(numerator: Scalar, denominator: Scalar, A: DistMatrix) -> DistMatrix:
    """A *= num/den with overflow-aware staging (reference: SafeScale.hpp).
    XLA computes in the array dtype; we simply order the ops to avoid
    spurious overflow for extreme scalings."""
    return _like(A, (A.data / jnp.asarray(denominator, A.dtype))
                 * jnp.asarray(numerator, A.dtype))


def Axpy(alpha: Scalar, X: DistMatrix, Y: DistMatrix) -> DistMatrix:
    """Y + alpha*X (reference: Axpy.hpp)."""
    return _binary(Y, X, lambda y, x: y + jnp.asarray(alpha, y.dtype) * x)


def Axpby(alpha: Scalar, X: DistMatrix, beta: Scalar, Y: DistMatrix) -> DistMatrix:
    """beta*Y + alpha*X (reference: Axpby? — composed in level1)."""
    return _binary(Y, X,
                   lambda y, x: jnp.asarray(beta, y.dtype) * y
                   + jnp.asarray(alpha, y.dtype) * x)


def Add(A: DistMatrix, B: DistMatrix) -> DistMatrix:
    return _binary(A, B, lambda a, b: a + b)


def Subtract(A: DistMatrix, B: DistMatrix) -> DistMatrix:
    return _binary(A, B, lambda a, b: a - b)


def Hadamard(A: DistMatrix, B: DistMatrix) -> DistMatrix:
    """Entrywise product (reference: Hadamard.hpp)."""
    return _binary(A, B, lambda a, b: a * b)


def Transpose(A: DistMatrix, conjugate: bool = False) -> DistMatrix:
    """B = A^T (or A^H). The dist tags transpose with the data
    (reference: Transpose.hpp)."""
    d = A.data.T
    if conjugate:
        d = jnp.conj(d)
    return DistMatrix.from_padded(d, A.n, A.m, A.row_dist, A.col_dist,
                                  A.grid, A.wrap)


def Adjoint(A: DistMatrix) -> DistMatrix:
    return Transpose(A, conjugate=True)


def Swap(A: DistMatrix, B: DistMatrix) -> Tuple[DistMatrix, DistMatrix]:
    """Functional swap (reference: Swap.hpp)."""
    return B.redistribute(*A.dist), A.redistribute(*B.dist)


def Broadcast(A: DistMatrix) -> DistMatrix:
    """No-op: single-controller JAX has no root-relative state
    (reference: Broadcast.hpp)."""
    return A


# ---------------------------------------------------------------------------
# maps
# ---------------------------------------------------------------------------


def EntrywiseMap(A: DistMatrix, f: Callable[[jax.Array], jax.Array]) -> DistMatrix:
    """B[i,j] = f(A[i,j]) (reference: EntrywiseMap.hpp). Re-masks padding
    since f(0) may be nonzero."""
    return _like(A, A.mask_padding(f(A.data)))


def EntrywiseFill(A: DistMatrix, f: Callable[[], jax.Array]) -> DistMatrix:
    """Fill entrywise from a sampler (reference: EntrywiseFill.hpp).
    The sampler receives the padded shape for vectorization."""
    return _like(A, A.mask_padding(f(A.data.shape).astype(A.dtype)))


def IndexDependentMap(A: DistMatrix,
                      f: Callable[[jax.Array, jax.Array, jax.Array], jax.Array]
                      ) -> DistMatrix:
    """B[i,j] = f(i, j, A[i,j]) (reference: IndexDependentMap.hpp)."""
    i, j = _iota_masks(A)
    return _like(A, A.mask_padding(f(i, j, A.data)))


def IndexDependentFill(A: DistMatrix,
                       f: Callable[[jax.Array, jax.Array], jax.Array]) -> DistMatrix:
    """B[i,j] = f(i, j) (reference: IndexDependentFill.hpp). This is how
    every deterministic matrix generator is built."""
    i, j = _iota_masks(A)
    return _like(A, A.mask_padding(f(i, j).astype(A.dtype)))


def Round(A: DistMatrix) -> DistMatrix:
    return EntrywiseMap(A, jnp.round)


# ---------------------------------------------------------------------------
# diagonal access / scaling
# ---------------------------------------------------------------------------


def _diag_length(m: int, n: int, offset: int) -> int:
    if offset >= 0:
        return max(min(m, n - offset), 0)
    return max(min(m + offset, n), 0)


def GetDiagonal(A: DistMatrix, offset: int = 0) -> DistMatrix:
    """d = diag(A, offset) as a column vector, tagged [MD,*] like the
    reference (reference: GetDiagonal.hpp; diag lives on the MD comm)."""
    d = jnp.diagonal(A.data, offset)
    dlen = _diag_length(A.m, A.n, offset)
    col = pad_array(d[:, None], A.grid)
    return DistMatrix.from_padded(col, dlen, 1, MD, STAR, A.grid, A.wrap)


def SetDiagonal(A: DistMatrix, d: DistMatrix, offset: int = 0) -> DistMatrix:
    """Reference: SetDiagonal.hpp."""
    dvec = d.replicated()[:, 0]
    i, j = _iota_masks(A)
    on_diag = (j - i == offset) & A.pad_mask()
    # value for position (i,j) on the diagonal is dvec[min(i,j) adjusted]
    idx = jnp.where(offset >= 0, i, j)
    vals = dvec[jnp.clip(idx, 0, dvec.shape[0] - 1)].astype(A.dtype)
    return _like(A, jnp.where(on_diag, vals, A.data))


def UpdateDiagonal(A: DistMatrix, alpha: Scalar, d: DistMatrix,
                   offset: int = 0) -> DistMatrix:
    dvec = d.replicated()[:, 0]
    i, j = _iota_masks(A)
    on_diag = (j - i == offset) & A.pad_mask()
    idx = jnp.where(offset >= 0, i, j)
    vals = dvec[jnp.clip(idx, 0, dvec.shape[0] - 1)].astype(A.dtype)
    return _like(A, jnp.where(on_diag, A.data + jnp.asarray(alpha, A.dtype) * vals,
                              A.data))


def DiagonalScale(side, orientation, d: DistMatrix, A: DistMatrix) -> DistMatrix:
    """A := diag(d) A (LEFT) or A diag(d) (RIGHT)
    (reference: DiagonalScale.hpp)."""
    from ..core.types import LEFT, ADJOINT

    dvec = d.replicated()[:, 0]
    if orientation == ADJOINT:
        dvec = jnp.conj(dvec)
    dvec = dvec.astype(A.dtype)
    if side == LEFT:
        return _like(A, A.data * dvec[: A.data.shape[0], None])
    return _like(A, A.data * dvec[None, : A.data.shape[1]])


def DiagonalSolve(side, orientation, d: DistMatrix, A: DistMatrix) -> DistMatrix:
    """A := diag(d)^{-1} A etc. (reference: DiagonalSolve.hpp). The padded
    tail of d is zero; guard it to avoid inf*0 NaNs in the padding."""
    from ..core.types import LEFT, ADJOINT

    dvec = d.replicated()[:, 0]
    if orientation == ADJOINT:
        dvec = jnp.conj(dvec)
    safe = jnp.where(dvec == 0, jnp.ones((), dvec.dtype), dvec).astype(A.dtype)
    if side == LEFT:
        return _like(A, A.data / safe[: A.data.shape[0], None])
    return _like(A, A.data / safe[None, : A.data.shape[1]])


# ---------------------------------------------------------------------------
# submatrix access (reference: GetSubmatrix.hpp / SetSubmatrix.hpp; views
# include/El/core/View/decl.hpp — functional here)
# ---------------------------------------------------------------------------


def GetSubmatrix(A: DistMatrix, I: slice, J: slice) -> DistMatrix:
    """B = A(I, J) for contiguous index ranges (the IR(a,b) idiom)."""
    i0, i1 = I.indices(A.m)[:2]
    j0, j1 = J.indices(A.n)[:2]
    sub = A.data[i0:i1, j0:j1]
    return DistMatrix.from_padded(pad_array(sub, A.grid), i1 - i0, j1 - j0,
                                  A.col_dist, A.row_dist, A.grid, A.wrap)


def SetSubmatrix(A: DistMatrix, i0: int, j0: int, B: DistMatrix) -> DistMatrix:
    """A(i0:i0+mb, j0:j0+nb) = B."""
    Bd = B.redistribute(*A.dist).data[: B.m, : B.n]
    out = jax.lax.dynamic_update_slice(A.data, Bd.astype(A.dtype), (i0, j0))
    return _like(A, A.mask_padding(out))


def UpdateSubmatrix(A: DistMatrix, i0: int, j0: int, alpha: Scalar,
                    B: DistMatrix) -> DistMatrix:
    Bd = B.redistribute(*A.dist).data[: B.m, : B.n]
    cur = jax.lax.dynamic_slice(A.data, (i0, j0), Bd.shape)
    out = jax.lax.dynamic_update_slice(
        A.data, cur + jnp.asarray(alpha, A.dtype) * Bd.astype(A.dtype), (i0, j0))
    return _like(A, A.mask_padding(out))


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


def Dot(A: DistMatrix, B: DistMatrix) -> jax.Array:
    """<A, B> = sum conj(A) * B (reference: Dot.hpp)."""
    check_same_grid(A, B)
    Bd = B.redistribute(*A.dist).data
    return jnp.sum(jnp.conj(A.data) * Bd)


def Dotu(A: DistMatrix, B: DistMatrix) -> jax.Array:
    """Unconjugated dot (reference: Dotu.hpp)."""
    check_same_grid(A, B)
    Bd = B.redistribute(*A.dist).data
    return jnp.sum(A.data * Bd)


def Nrm2(A: DistMatrix) -> jax.Array:
    """Frobenius/2-norm via scaled squares for overflow safety
    (reference: Nrm2.hpp, NormsFromScaledSquares.hpp)."""
    absa = jnp.abs(A.data)
    scale = jnp.max(absa)
    safe = jnp.where(scale == 0, jnp.ones((), scale.dtype), scale)
    ss = jnp.sum((absa / safe) ** 2)
    return jnp.where(scale == 0, jnp.zeros((), scale.dtype), safe * jnp.sqrt(ss))


def MaxAbs(A: DistMatrix) -> jax.Array:
    return jnp.max(jnp.abs(A.data))


def MinAbs(A: DistMatrix) -> jax.Array:
    big = jnp.asarray(jnp.inf, jnp.abs(A.data).dtype)
    return jnp.min(jnp.where(A.pad_mask(), jnp.abs(A.data), big))


def MaxAbsLoc(A: DistMatrix) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(value, i, j) of the max-|.| entry — the MaxLocOp AllReduce analogue
    (reference: MaxAbsLoc.hpp, mpi MaxLocOp src/core/mpi_register.cpp).
    On TPU this is argmax + integer decode; XLA reduces over the mesh."""
    absa = jnp.where(A.pad_mask(), jnp.abs(A.data),
                     jnp.full((), -1, jnp.abs(A.data).dtype))
    flat = absa.ravel()
    k = jnp.argmax(flat)
    Q = A.data.shape[1]
    return flat[k], k // Q, k % Q


def VectorMaxAbsLoc(x: DistMatrix) -> Tuple[jax.Array, jax.Array]:
    v, i, j = MaxAbsLoc(x)
    return v, i if x.n == 1 else j


def Max(A: DistMatrix) -> jax.Array:
    small = jnp.asarray(-jnp.inf, A.dtype)
    return jnp.max(jnp.where(A.pad_mask(), A.data, small))


def Min(A: DistMatrix) -> jax.Array:
    big = jnp.asarray(jnp.inf, A.dtype)
    return jnp.min(jnp.where(A.pad_mask(), A.data, big))


def EntrywiseNorm(A: DistMatrix, p: float = 1.0) -> jax.Array:
    """(sum |a_ij|^p)^(1/p) (reference: props/Norm/Entrywise)."""
    return jnp.sum(jnp.abs(A.data) ** p) ** (1.0 / p)


def ColumnNorms(A: DistMatrix) -> jax.Array:
    """2-norms of each column, scaled-squares style
    (reference: ColumnNorms via NormsFromScaledSquares.hpp). Returns a
    padded (Q,) vector; entries >= n are zero."""
    absa = jnp.abs(A.data)
    scales = jnp.max(absa, axis=0)
    safe = jnp.where(scales == 0, jnp.ones((), scales.dtype), scales)
    ss = jnp.sum((absa / safe[None, :]) ** 2, axis=0)
    return jnp.where(scales == 0, scales, safe * jnp.sqrt(ss))


def RowNorms(A: DistMatrix) -> jax.Array:
    return ColumnNorms(Transpose(A))


def ColumnMaxNorms(A: DistMatrix) -> jax.Array:
    return jnp.max(jnp.abs(A.data), axis=0)


def Trace(A: DistMatrix) -> jax.Array:
    """Reference: props/Trace.cpp (sum of the diagonal; padding diag is 0)."""
    return jnp.trace(A.data)
