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
    LEFT,
    LOWER,
    MC,
    MD,
    MR,
    RIGHT,
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


# -- remaining level-1 surface (completing the reference header census) -----


def AxpyTrapezoid(uplo: UpperOrLower, alpha: Scalar, X: DistMatrix,
                  Y: DistMatrix, offset: int = 0) -> DistMatrix:
    """Y += alpha * trapezoid(X) (reference: level1/AxpyTrapezoid.hpp)."""
    check_same_grid(X, Y)
    Xt = MakeTrapezoidal(uplo, X, offset)
    return _like(Y, Y.data + jnp.asarray(alpha, Y.dtype) *
                 Xt.data.astype(Y.dtype))


def TransposeAxpy(alpha: Scalar, X: DistMatrix, Y: DistMatrix,
                  conjugate: bool = False) -> DistMatrix:
    """Y += alpha X^T (or X^H) (reference: level1/TransposeAxpy.hpp)."""
    return Axpy(alpha, Transpose(X, conjugate=conjugate), Y)


def Concatenate(A: DistMatrix, B: DistMatrix, axis: int = 1) -> DistMatrix:
    """[A, B] (axis=1) or [A; B] (axis=0) (reference:
    level1/Concatenate.hpp HCat/VCat)."""
    g = check_same_grid(A, B)
    if axis == 1:
        if A.m != B.m:
            raise ValueError("HCat requires equal heights")
        glob = jnp.concatenate(
            [A.data[:, :A.n], B.data[:, :B.n]], axis=1)
        m, n = A.m, A.n + B.n
        glob = glob[:A.m]
    else:
        if A.n != B.n:
            raise ValueError("VCat requires equal widths")
        glob = jnp.concatenate([A.data[:A.m], B.data[:B.m]], axis=0)
        m, n = A.m + B.m, A.n
        glob = glob[:, :A.n]
    return DistMatrix.from_global(glob, A.col_dist, A.row_dist, g)


def Reshape(m: int, n: int, A: DistMatrix) -> DistMatrix:
    """Column-major reshape to m x n (reference: level1/Reshape.hpp —
    El matrices are column-major, so reshape runs down columns first)."""
    if m * n != A.m * A.n:
        raise ValueError("Reshape size mismatch")
    flat = A.data[:A.m, :A.n].T.reshape(-1)  # column-major order
    glob = flat.reshape(n, m).T
    return DistMatrix.from_global(glob, A.col_dist, A.row_dist, A.grid)


def ConjugateDiagonal(A: DistMatrix, offset: int = 0) -> DistMatrix:
    """Conjugate the offset diagonal in place (reference:
    level1/ConjugateDiagonal.hpp)."""
    i, j = _iota_masks(A)
    on = (j - i) == offset
    return _like(A, jnp.where(on, jnp.conj(A.data), A.data))


def MakeDiagonalReal(A: DistMatrix, offset: int = 0) -> DistMatrix:
    """Zero the imaginary part of the offset diagonal (reference:
    level1/MakeDiagonalReal.hpp)."""
    if not jnp.iscomplexobj(A.data):
        return A
    i, j = _iota_masks(A)
    on = (j - i) == offset
    return _like(A, jnp.where(on, jnp.real(A.data).astype(A.dtype), A.data))


def ConjugateSubmatrix(A: DistMatrix, I: slice, J: slice) -> DistMatrix:
    """Conjugate A[I, J] in place (reference:
    level1/ConjugateSubmatrix.hpp)."""
    i, j = _iota_masks(A)
    inI = (i >= (I.start or 0)) & (i < I.stop)
    inJ = (j >= (J.start or 0)) & (j < J.stop)
    return _like(A, jnp.where(inI & inJ, jnp.conj(A.data), A.data))


def MakeSubmatrixReal(A: DistMatrix, I: slice, J: slice) -> DistMatrix:
    """Drop the imaginary part of A[I, J] (reference:
    level1/MakeSubmatrixReal.hpp)."""
    if not jnp.iscomplexobj(A.data):
        return A
    i, j = _iota_masks(A)
    inI = (i >= (I.start or 0)) & (i < I.stop)
    inJ = (j >= (J.start or 0)) & (j < J.stop)
    return _like(A, jnp.where(inI & inJ,
                              jnp.real(A.data).astype(A.dtype), A.data))


def DiagonalScaleTrapezoid(side, orientation, uplo: UpperOrLower,
                           d: DistMatrix, A: DistMatrix,
                           offset: int = 0) -> DistMatrix:
    """Scale the uplo trapezoid of A by diag(d) from `side`, leaving the
    rest of A untouched (reference: level1/DiagonalScaleTrapezoid.hpp)."""
    scaled = DiagonalScale(side, orientation, d, A)
    i, j = _iota_masks(A)
    keep = (j - i) >= offset if uplo == UPPER else (j - i) <= offset
    return _like(A, jnp.where(keep, scaled.data, A.data))


def GetMappedDiagonal(A: DistMatrix, f, offset: int = 0) -> DistMatrix:
    """d_k = f(A_{k,k+offset}) (reference:
    level1/GetMappedDiagonal.hpp)."""
    d = GetDiagonal(A, offset)
    return _like(d, f(d.data))


def UpdateMappedDiagonal(A: DistMatrix, d: DistMatrix, f,
                         offset: int = 0) -> DistMatrix:
    """A_{k,k+offset} = f(A_{k,k+offset}, d_k) (reference:
    level1/UpdateMappedDiagonal.hpp). ``d`` is a (padded) column
    vector aligned with the diagonal."""
    i, j = _iota_masks(A)
    on = (j - i) == offset
    dv = d.data[:, 0]
    # embed d along the diagonal (row index selects the entry)
    row0 = jnp.maximum(-offset, 0)
    k = jnp.clip(i - row0, 0, dv.shape[0] - 1)
    upd = f(A.data, dv[k])
    return _like(A, jnp.where(on, upd, A.data))


def Kronecker(A: DistMatrix, B: DistMatrix) -> DistMatrix:
    """A (x) B (reference: level1/Kronecker.hpp)."""
    g = check_same_grid(A, B)
    out = jnp.kron(A.data[:A.m, :A.n], B.data[:B.m, :B.n])
    return DistMatrix.from_global(out, A.col_dist, A.row_dist, g)


def Givens(phi, gamma):
    """(c, s, rho) with [c, s; -conj(s), c] [phi; gamma] = [rho; 0]
    (reference: level1/Givens.hpp, the lartg kernel)."""
    phi = jnp.asarray(phi)
    gamma = jnp.asarray(gamma)
    phi_a = jnp.abs(phi)
    gam_a = jnp.abs(gamma)
    norm = jnp.sqrt(phi_a ** 2 + gam_a ** 2)
    safe = jnp.where(norm == 0, jnp.ones_like(norm), norm)
    sign = jnp.where(phi_a == 0, jnp.ones_like(phi),
                     phi / jnp.where(phi_a == 0, 1, phi_a))
    c = jnp.where(norm == 0, jnp.ones_like(norm), phi_a / safe)
    s = jnp.where(norm == 0, jnp.zeros_like(phi),
                  sign * jnp.conj(gamma) / safe)
    rho = sign * norm
    return c, s, rho


def Rotate(c, s, a: DistMatrix, b: DistMatrix
           ) -> Tuple[DistMatrix, DistMatrix]:
    """Apply the Givens rotation [c, s; -conj(s), c] to the row pair
    (a, b) (reference: level1/Rotate.hpp)."""
    check_same_grid(a, b)
    c = jnp.asarray(c, jnp.real(a.data).dtype)
    anew = c * a.data + s * b.data
    bnew = -jnp.conj(s) * a.data + c * b.data
    return _like(a, anew), _like(b, bnew)


def _quasi_blocks(d: jax.Array, dSub: jax.Array):
    """Masks for the 1x1/2x2 quasi-diagonal D = diag(d) +/- dSub pairs:
    start[k] marks the first row of a 2x2 block."""
    n = d.shape[0]
    sub = jnp.zeros((n,), dSub.dtype).at[:dSub.shape[0]].set(dSub)
    nz = sub != 0
    # a start cannot immediately follow another start
    def step(carry, z):
        prev = carry
        start = z & ~prev
        return start, start
    _, start = jax.lax.scan(step, jnp.zeros((), bool), nz)
    end = jnp.concatenate([jnp.zeros((1,), bool), start[:-1]])
    return sub, start, end


def QuasiDiagonalScale(side, uplo: UpperOrLower, d: jax.Array,
                       dSub: jax.Array, X: DistMatrix,
                       conjugated: bool = False) -> DistMatrix:
    """X := D X (LEFT) / X D (RIGHT) for the symmetric/Hermitian
    quasi-diagonal D built from d (diagonal) and dSub (couplings whose
    nonzeros mark 2x2 blocks) — the Bunch-Kaufman D factor
    (reference: level1/QuasiDiagonalScale.hpp). For uplo=LOWER dSub is
    the subdiagonal (mirror conjugated when ``conjugated``); UPPER is
    the transposed convention."""
    d = jnp.asarray(d)
    sub, start, end = _quasi_blocks(d, jnp.asarray(dSub))
    if side != LEFT:
        # X D = (D^T X^T)^T; for Hermitian D (conjugated), D^T = conj(D)
        # = the quasi-diagonal built from conj(dSub), so conjugate the
        # couplings before reducing to the LEFT case.
        dSub_t = jnp.conj(jnp.asarray(dSub)) if conjugated else dSub
        return Transpose(QuasiDiagonalScale(
            LEFT, uplo, d, dSub_t, Transpose(X), conjugated))
    x = X.data
    P = x.shape[0]
    n = d.shape[0]
    dv = jnp.ones((P,), d.dtype).at[:n].set(d[:n])
    subv = jnp.zeros((P,), d.dtype).at[:n].set(jnp.where(start, sub, 0)[:n])
    startv = jnp.zeros((P,), bool).at[:n].set(start[:n])
    endv = jnp.zeros((P,), bool).at[:n].set(end[:n])
    subc = jnp.conj(subv) if conjugated else subv
    lower = uplo == LOWER
    # D[k, k+1] (couples x_{k+1} into start row k) and D[k+1, k]
    coef_up = jnp.where(startv, subc if lower else subv, 0)
    dn_coef_at_start = jnp.where(startv, subv if lower else subc, 0)
    coef_dn = jnp.concatenate([jnp.zeros((1,), d.dtype),
                               dn_coef_at_start[:-1]])
    up = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    dn = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    y = dv[:, None] * x + coef_up[:, None] * up + coef_dn[:, None] * dn
    return _like(X, y)


def QuasiDiagonalSolve(side, uplo: UpperOrLower, d: jax.Array,
                       dSub: jax.Array, X: DistMatrix,
                       conjugated: bool = False) -> DistMatrix:
    """X := D^{-1} X for the quasi-diagonal D (reference:
    level1/QuasiDiagonalSolve.hpp): 1x1 blocks divide; 2x2 blocks invert
    in closed form."""
    d = jnp.asarray(d)
    sub, start, end = _quasi_blocks(d, jnp.asarray(dSub))
    if side != LEFT:
        # X D^{-1} = (D^{-T} X^T)^T; D^{-T} = conj(D)^{-1} for Hermitian
        # D, so conjugate the couplings (see QuasiDiagonalScale).
        dSub_t = jnp.conj(jnp.asarray(dSub)) if conjugated else dSub
        return Transpose(QuasiDiagonalSolve(
            LEFT, uplo, d, dSub_t, Transpose(X), conjugated))
    x = X.data
    P = x.shape[0]
    n = d.shape[0]
    dv = jnp.ones((P,), d.dtype).at[:n].set(d[:n])
    subv = jnp.zeros((P,), d.dtype).at[:n].set(jnp.where(start, sub, 0)[:n])
    startv = jnp.zeros((P,), bool).at[:n].set(start[:n])
    endv = jnp.zeros((P,), bool).at[:n].set(end[:n])
    lower = uplo == LOWER
    subc = jnp.conj(subv) if conjugated else subv
    b_up = subc if lower else subv      # D[k, k+1]
    b_dn = subv if lower else subc      # D[k+1, k]
    c_next = jnp.concatenate([dv[1:], jnp.ones((1,), d.dtype)])
    det = jnp.where(startv, dv * c_next - b_up * b_dn,
                    jnp.ones((P,), d.dtype))
    up = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    dn = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    shift1 = lambda v, fill: jnp.concatenate(
        [jnp.full((1,), fill, v.dtype), v[:-1]])
    y_start = (c_next[:, None] * x - b_up[:, None] * up) / det[:, None]
    a_prev = shift1(dv, 1)
    bdn_prev = shift1(b_dn, 0)
    det_prev = shift1(det, 1)
    y_end = (a_prev[:, None] * x - bdn_prev[:, None] * dn) / \
        det_prev[:, None]
    y_single = x / dv[:, None]
    y = jnp.where(startv[:, None], y_start,
                  jnp.where(endv[:, None], y_end, y_single))
    return _like(X, y)


# -- swaps / 2x2 transforms / min-abs reductions (level1 census tail) -------


def RowSwap(A: DistMatrix, to: int, frm: int) -> DistMatrix:
    """Swap rows `to` and `frm` (reference: Swap.cpp RowSwap)."""
    Am = A.redistribute(MC, MR)
    d = Am.data
    ri = d[to, :]
    rj = d[frm, :]
    return Am.with_data(d.at[to, :].set(rj).at[frm, :].set(ri))


def ColSwap(A: DistMatrix, to: int, frm: int) -> DistMatrix:
    """Swap columns `to` and `frm` (reference: Swap.cpp ColSwap)."""
    Am = A.redistribute(MC, MR)
    d = Am.data
    ci = d[:, to]
    cj = d[:, frm]
    return Am.with_data(d.at[:, to].set(cj).at[:, frm].set(ci))


def SymmetricSwap(uplo: UpperOrLower, A: DistMatrix, to: int, frm: int,
                  conjugate: bool = False) -> DistMatrix:
    """Symmetric swap of index pair (to, frm) on a triangle-stored
    matrix (reference: Swap.cpp SymmetricSwap): symmetrize, swap the
    row AND column, re-trapezoidalize."""
    full = MakeHermitian(uplo, A) if conjugate else MakeSymmetric(uplo, A)
    out = ColSwap(RowSwap(full, to, frm), to, frm)
    return MakeTrapezoidal(uplo, out)


def HermitianSwap(uplo: UpperOrLower, A: DistMatrix, to: int, frm: int
                  ) -> DistMatrix:
    """Reference: Swap.cpp HermitianSwap."""
    return SymmetricSwap(uplo, A, to, frm, conjugate=True)


def Transform2x2(G, a1: DistMatrix, a2: DistMatrix
                 ) -> Tuple[DistMatrix, DistMatrix]:
    """[a1, a2] := [a1, a2] G^T for column vectors — equivalently
    [a1; a2] := G [a1; a2] for row vectors (reference:
    Transform2x2.cpp:14-60). Returns the transformed pair."""
    G = jnp.asarray(G)
    g11, g12, g21, g22 = G[0, 0], G[0, 1], G[1, 0], G[1, 1]
    x1 = a1.redistribute(MC, MR)
    x2 = a2.redistribute(MC, MR)
    dt = jnp.result_type(G.dtype, x1.dtype)  # complex G promotes real a
    n1 = g11 * x1.data + g12 * x2.data
    n2 = g21 * x1.data + g22 * x2.data
    return x1.with_data(n1.astype(dt), x1.m, x1.n), \
        x2.with_data(n2.astype(dt), x2.m, x2.n)


def Transform2x2Rows(G, A: DistMatrix, i1: int, i2: int) -> DistMatrix:
    """[A(i1,:); A(i2,:)] := G [A(i1,:); A(i2,:)] (reference:
    Transform2x2.cpp Transform2x2Rows)."""
    G = jnp.asarray(G)
    Am = A.redistribute(MC, MR)
    d = Am.data.astype(jnp.result_type(G.dtype, A.dtype))
    r1, r2 = d[i1, :], d[i2, :]
    n1 = G[0, 0] * r1 + G[0, 1] * r2
    n2 = G[1, 0] * r1 + G[1, 1] * r2
    return Am.with_data(d.at[i1, :].set(n1).at[i2, :].set(n2))


def Transform2x2Cols(G, A: DistMatrix, j1: int, j2: int) -> DistMatrix:
    """[A(:,j1), A(:,j2)] := [A(:,j1), A(:,j2)] G^T (reference:
    Transform2x2.cpp Transform2x2Cols)."""
    G = jnp.asarray(G)
    Am = A.redistribute(MC, MR)
    d = Am.data.astype(jnp.result_type(G.dtype, A.dtype))
    c1, c2 = d[:, j1], d[:, j2]
    n1 = G[0, 0] * c1 + G[0, 1] * c2
    n2 = G[1, 0] * c1 + G[1, 1] * c2
    return Am.with_data(d.at[:, j1].set(n1).at[:, j2].set(n2))


def RowMaxNorms(A: DistMatrix) -> jax.Array:
    """max_j |a_ij| per row (reference: RowNorms.cpp RowMaxNorms).
    Padded (P,) output; rows >= m are zero."""
    return jnp.max(jnp.abs(A.data), axis=1)


def ColumnMinAbs(A: DistMatrix) -> jax.Array:
    """min_i |a_ij| per column over the live m rows (reference:
    ColumnMinAbs.cpp). Padded output; columns >= n are zero."""
    absa = jnp.abs(A.data)
    P, Q = absa.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, Q), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (P, Q), 1)
    big = jnp.asarray(jnp.inf, absa.dtype)
    mins = jnp.min(jnp.where(rows < A.m, absa, big), axis=0)
    return jnp.where(jnp.arange(Q) < A.n, mins, jnp.zeros((), absa.dtype))


def RowMinAbs(A: DistMatrix) -> jax.Array:
    """Reference: RowMinAbs.cpp."""
    return ColumnMinAbs(Transpose(A))


def ColumnMinAbsNonzero(A: DistMatrix) -> jax.Array:
    """Per-column min |a_ij| over the NONZERO live entries, 0 if the
    column is all zero (reference: ColumnMinAbs.cpp nonzero variant)."""
    absa = jnp.abs(A.data)
    P, Q = absa.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, Q), 0)
    big = jnp.asarray(jnp.inf, absa.dtype)
    live = (rows < A.m) & (absa > 0)
    mins = jnp.min(jnp.where(live, absa, big), axis=0)
    mins = jnp.where(jnp.isinf(mins), jnp.zeros((), absa.dtype), mins)
    return jnp.where(jnp.arange(Q) < A.n, mins, jnp.zeros((), absa.dtype))


def RowMinAbsNonzero(A: DistMatrix) -> jax.Array:
    return ColumnMinAbsNonzero(Transpose(A))


def ColumnTwoNorms(A: DistMatrix) -> jax.Array:
    """Alias of ColumnNorms (reference: ColumnNorms.cpp exports both)."""
    return ColumnNorms(A)


def RowTwoNorms(A: DistMatrix) -> jax.Array:
    return RowNorms(A)


def RealToComplex(A: DistMatrix) -> DistMatrix:
    """Widen a real matrix to the matching complex dtype (reference:
    Copy.hpp's mixed-type copies)."""
    Am = A.redistribute(MC, MR)
    cdt = jnp.complex64 if Am.dtype == jnp.float32 else jnp.complex128
    return Am.with_data(Am.data.astype(cdt))


def GetRealPartOfDiagonal(A: DistMatrix, offset: int = 0) -> DistMatrix:
    """Reference: GetDiagonal.hpp real-part accessor."""
    d = GetDiagonal(A, offset)
    return d.with_data(jnp.real(d.data))


def GetImagPartOfDiagonal(A: DistMatrix, offset: int = 0) -> DistMatrix:
    d = GetDiagonal(A, offset)
    return d.with_data(jnp.imag(d.data))


def _set_part_of_diagonal(A: DistMatrix, d: DistMatrix, offset: int,
                          imag: bool, update_alpha=None) -> DistMatrix:
    dvec = d.replicated()[:, 0]
    i, j = _iota_masks(A)
    on_diag = (j - i == offset) & A.pad_mask()
    idx = jnp.where(offset >= 0, i, j)
    vals = jnp.real(dvec)[jnp.clip(idx, 0, dvec.shape[0] - 1)]
    cur_re = jnp.real(A.data)
    cur_im = jnp.imag(A.data) if jnp.iscomplexobj(A.data) else None
    if update_alpha is not None:
        base = cur_im if imag else cur_re
        vals = base + jnp.real(jnp.asarray(update_alpha)) * vals
    if imag:
        if cur_im is None:
            raise ValueError("imaginary diagonal part of a real matrix")
        new = cur_re + 1j * jnp.where(on_diag, vals, cur_im)
    else:
        new = jnp.where(on_diag, vals, cur_re)
        if cur_im is not None:
            new = new + 1j * cur_im
    return _like(A, new.astype(A.dtype))


def SetRealPartOfDiagonal(A: DistMatrix, d: DistMatrix,
                          offset: int = 0) -> DistMatrix:
    """Reference: SetDiagonal.hpp SetRealPartOfDiagonal."""
    return _set_part_of_diagonal(A, d, offset, imag=False)


def SetImagPartOfDiagonal(A: DistMatrix, d: DistMatrix,
                          offset: int = 0) -> DistMatrix:
    return _set_part_of_diagonal(A, d, offset, imag=True)


def UpdateRealPartOfDiagonal(A: DistMatrix, alpha, d: DistMatrix,
                             offset: int = 0) -> DistMatrix:
    return _set_part_of_diagonal(A, d, offset, imag=False,
                                 update_alpha=alpha)


def UpdateImagPartOfDiagonal(A: DistMatrix, alpha, d: DistMatrix,
                             offset: int = 0) -> DistMatrix:
    return _set_part_of_diagonal(A, d, offset, imag=True,
                                 update_alpha=alpha)


# ---------------------------------------------------------------------------
# value-and-location reductions (the MPI MaxLocOp/MinLocOp family)
# ---------------------------------------------------------------------------


def _loc_reduce(A: DistMatrix, vals: jax.Array, valid: jax.Array,
                maximize: bool) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(value, i, j) of the extremal entry of ``vals`` over ``valid``.

    On TPU this is a masked argmax/argmin + integer decode; XLA emits the
    cross-mesh reduction (the analogue of the reference's MaxLocOp /
    MinLocOp AllReduce, src/core/mpi_register.cpp). Ties resolve to the
    first entry in row-major order, matching the lowest-rank MPI tie
    rule for the element-cyclic layout's owner ordering."""
    if jnp.issubdtype(vals.dtype, jnp.complexfloating):
        raise TypeError("Loc reductions are defined for real values "
                        "(use the Abs variants for complex matrices)")
    sentinel = jnp.asarray(-jnp.inf if maximize else jnp.inf, vals.dtype)
    masked = jnp.where(valid, vals, sentinel)
    flat = masked.ravel()
    k = jnp.argmax(flat) if maximize else jnp.argmin(flat)
    Q = vals.shape[1]
    return flat[k], k // Q, k % Q


def MaxLoc(A: DistMatrix) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(value, i, j) of the maximum entry (reference: MaxLoc.cpp MaxLoc)."""
    return _loc_reduce(A, A.data, A.pad_mask(), maximize=True)


def MinLoc(A: DistMatrix) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reference: MaxLoc.cpp MinLoc (decl.hpp:1183)."""
    return _loc_reduce(A, A.data, A.pad_mask(), maximize=False)


def MinAbsLoc(A: DistMatrix) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(|value|, i, j) of the min-|.| entry (reference: MinAbsLoc.hpp)."""
    return _loc_reduce(A, jnp.abs(A.data), A.pad_mask(), maximize=False)


def _sym_mask(A: DistMatrix, uplo: UpperOrLower) -> jax.Array:
    i, j = _iota_masks(A)
    tri = (i >= j) if uplo == LOWER else (i <= j)
    return A.pad_mask() & tri


def SymmetricMaxLoc(uplo: UpperOrLower, A: DistMatrix):
    """MaxLoc restricted to the stored triangle (reference: MaxLoc.cpp
    SymmetricMaxLoc)."""
    return _loc_reduce(A, A.data, _sym_mask(A, uplo), maximize=True)


def SymmetricMinLoc(uplo: UpperOrLower, A: DistMatrix):
    return _loc_reduce(A, A.data, _sym_mask(A, uplo), maximize=False)


def SymmetricMaxAbsLoc(uplo: UpperOrLower, A: DistMatrix):
    """Reference: MaxAbsLoc.hpp SymmetricMaxAbsLoc."""
    return _loc_reduce(A, jnp.abs(A.data), _sym_mask(A, uplo),
                       maximize=True)


def SymmetricMinAbsLoc(uplo: UpperOrLower, A: DistMatrix):
    return _loc_reduce(A, jnp.abs(A.data), _sym_mask(A, uplo),
                       maximize=False)


def VectorMaxLoc(x: DistMatrix) -> Tuple[jax.Array, jax.Array]:
    """(value, index) over a column/row vector (reference: MaxLoc.cpp
    VectorMaxLoc)."""
    v, i, j = MaxLoc(x)
    return v, i if x.n == 1 else j


def VectorMinLoc(x: DistMatrix) -> Tuple[jax.Array, jax.Array]:
    v, i, j = MinLoc(x)
    return v, i if x.n == 1 else j


def VectorMinAbsLoc(x: DistMatrix) -> Tuple[jax.Array, jax.Array]:
    v, i, j = MinAbsLoc(x)
    return v, i if x.n == 1 else j


# ---------------------------------------------------------------------------
# census tail: HilbertSchmidt, Symmetric2x2Inv, AdjointAxpy
# ---------------------------------------------------------------------------


def HilbertSchmidt(A: DistMatrix, B: DistMatrix) -> jax.Array:
    """The Hilbert-Schmidt inner product <A, B> = sum conj(a_ij) b_ij
    (reference: src/blas_like/level1/HilbertSchmidt.cpp). Identical to
    Dot on matrices; kept as the named entry point."""
    if A.shape != B.shape:
        raise ValueError("Matrices must be the same size")
    return Dot(A, B)


def Symmetric2x2Inv(uplo: UpperOrLower, D, conjugate: bool = False
                    ) -> jax.Array:
    """Invert a symmetric (or Hermitian, ``conjugate``) 2x2 matrix given
    by its lower triangle, returning the packed lower triangle of the
    inverse (reference: src/blas_like/level1/Symmetric2x2Inv.cpp:14-53;
    like the reference, only uplo=LOWER is supported). Used by the
    Bunch-Kaufman D-block solves; fully vectorizable under vmap for the
    batched pivoted-LDL solve path."""
    if uplo != LOWER:
        raise NotImplementedError("This option not yet supported")
    D = jnp.asarray(D.data if isinstance(D, DistMatrix) else D)
    d11, d21, d22 = D[0, 0], D[1, 0], D[1, 1]
    if conjugate:
        d11 = jnp.real(d11)
        d22 = jnp.real(d22)
        d21abs = jnp.abs(d21)
        phi21to11 = d22 / d21abs
        phi21to22 = d11 / d21abs
        phi21 = d21 / d21abs
        xi = (1.0 / (phi21to11 * phi21to22 - 1.0)) / d21abs
        n11 = (xi * phi21to11).astype(D.dtype)
        n21 = (-xi * phi21).astype(D.dtype)
        n22 = (xi * phi21to22).astype(D.dtype)
        if jnp.issubdtype(D.dtype, jnp.complexfloating):
            n11 = n11.real + 0j
            n22 = n22.real + 0j
    else:
        chi21to11 = -d22 / d21
        chi21to22 = -d11 / d21
        chi21 = (1.0 / (1.0 - chi21to11 * chi21to22)) / d21
        n11, n21, n22 = chi21 * chi21to11, chi21, chi21 * chi21to22
    out = jnp.zeros((2, 2), D.dtype)
    out = out.at[0, 0].set(n11).at[1, 0].set(n21).at[1, 1].set(n22)
    return out


def AdjointAxpy(alpha: Scalar, X: DistMatrix, Y: DistMatrix) -> DistMatrix:
    """Y += alpha X^H (reference: TransposeAxpy.hpp AdjointAxpy)."""
    return TransposeAxpy(alpha, X, Y, conjugate=True)
