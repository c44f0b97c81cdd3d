"""Dense LDL factorizations (unpivoted).

Reference: src/lapack_like/factor/LDL/dense/ — unpivoted LDL^T/LDL^H
(Var3.hpp) plus Bunch-Kaufman pivoted variants. The unpivoted recursion
here mirrors the Cholesky recursion: each level is one triangular solve,
one diagonal scaling, and one MXU rank-k update. Bunch-Kaufman's
data-dependent 1x1/2x2 pivot interleaving is hostile to static shapes;
for indefinite systems the library routes through pivoted LU instead
(documented deviation), with regularized LDL (RegularizedLDL) provided
for the IPM-style use the reference puts it to."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.environment import Blocksize
from ..core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    MC,
    MR,
    NON_UNIT,
    NORMAL,
    TRANSPOSE,
    UNIT,
)
from ..blas.gemm import local_gemm
from ..blas.level1 import GetDiagonal, MakeHermitian, MakeTrapezoidal
from ..blas.trsm import Trsm


def _ldl_rec(a: jax.Array, nb: int, conjugate: bool) -> jax.Array:
    """Recursive LDL of padded matrix (padding diagonal pre-set to 1).
    Returns packed: unit-L strictly below diagonal, D on the diagonal."""
    n = a.shape[0]
    tr = (lambda x: jnp.conj(x.T)) if conjugate else (lambda x: x.T)
    if n <= nb:
        rows = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)

        def col(j, a):
            d = a[j, j]
            safe = jnp.where(d == 0, jnp.ones((), a.dtype), d)
            colv = jax.lax.dynamic_index_in_dim(a, j, axis=1, keepdims=False)
            l = jnp.where(rows > j, colv / safe, jnp.zeros_like(colv))
            a = jax.lax.dynamic_update_index_in_dim(
                a, jnp.where(rows > j, l, colv)[:, None], j, axis=1)
            lc = jnp.conj(l) if conjugate else l
            return a - d * jnp.outer(l, lc)

        return jax.lax.fori_loop(0, n, col, a)
    h = n // 2
    a11, a21, a22 = a[:h, :h], a[h:, :h], a[h:, h:]
    f11 = _ldl_rec(a11, nb, conjugate)
    d1 = jnp.diagonal(f11)
    # L21 = A21 L11^{-H} D1^{-1} — partitioned-inverse blocked solve
    # (pure MXU; XLA's TriangularSolve lowers to slow substitution).
    # _right_solve_adjoint_lower solves X T^H = B; for the symmetric
    # (non-conjugated) case pass conj(T) so that conj(T)^H = T^T.
    from ..blas.trsm import _right_solve_adjoint_lower

    l1 = jnp.tril(f11, -1) + jnp.eye(h, dtype=a.dtype)
    x = _right_solve_adjoint_lower(
        l1 if conjugate else jnp.conj(l1), a21, nb)
    safe_d = jnp.where(d1 == 0, jnp.ones((), d1.dtype), d1)
    l21 = x / safe_d[None, :]
    a22u = a22 - local_gemm(l21 * d1[None, :], tr(l21))
    f22 = _ldl_rec(a22u, nb, conjugate)
    top = jnp.concatenate([f11, jnp.zeros((h, n - h), a.dtype)], axis=1)
    bot = jnp.concatenate([l21, f22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def LDL(A: DistMatrix, conjugate: bool = True,
        blocksize: Optional[int] = None) -> DistMatrix:
    """Unpivoted A = L D L^H (conjugate) or L D L^T: returns packed factor
    with unit-L strictly below the diagonal and D on it
    (reference: factor/LDL/dense/Var3.hpp)."""
    if A.m != A.n:
        raise ValueError("LDL requires square A")
    nb = blocksize or Blocksize()
    Af = MakeHermitian(LOWER, A.redistribute(MC, MR)) if conjugate else \
        _symmetrize(A)
    d = Af.data
    M = d.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    pad_diag = (i == j) & (i >= A.m)
    d = jnp.where(pad_diag, jnp.ones((), d.dtype), d)
    f = _ldl_rec(d, nb, conjugate)
    f = jnp.where(pad_diag, jnp.zeros((), f.dtype), f)
    out = Af.with_data(Af.mask_padding(jnp.tril(f)))
    return out


def _symmetrize(A: DistMatrix) -> DistMatrix:
    from ..blas.level1 import MakeSymmetric

    return MakeSymmetric(LOWER, A.redistribute(MC, MR), conjugate=False)


def SolveAfter(F: DistMatrix, B: DistMatrix, conjugate: bool = True
               ) -> DistMatrix:
    """Solve A X = B given packed LDL (reference: LDL/dense/SolveAfter.hpp)."""
    from ..blas.level1 import DiagonalSolve

    Y = Trsm(LEFT, LOWER, NORMAL, UNIT, 1.0, F, B)
    dvec = GetDiagonal(F)
    Y = DiagonalSolve(LEFT, NORMAL, dvec, Y.redistribute(MC, MR))
    orient = ADJOINT if conjugate else TRANSPOSE
    return Trsm(LEFT, LOWER, orient, UNIT, 1.0, F, Y)


def RegularizedLDL(A: DistMatrix, reg: jax.Array, conjugate: bool = True,
                   blocksize: Optional[int] = None) -> DistMatrix:
    """LDL of A + diag(reg) (reference: factor/RegularizedLDL.cpp, the IPM
    workhorse)."""
    from ..blas.level1 import UpdateDiagonal
    from ..core.dmatrix import pad_array

    Am = A.redistribute(MC, MR)
    r = jnp.zeros((Am.data.shape[0],), Am.dtype).at[: reg.shape[0]].set(
        reg.astype(Am.dtype))
    d = Am.data + jnp.diag(r)
    return LDL(Am.with_data(d), conjugate, blocksize)


def Inertia(A: DistMatrix, blocksize: Optional[int] = None):
    """(num positive, num negative, num zero) eigenvalue counts via the
    diagonal of an LDL factorization (reference: props/Inertia.cpp via
    Bunch-Kaufman; here unpivoted LDL — valid for the quasi-definite
    matrices the IPM layer produces)."""
    F = LDL(A, conjugate=True, blocksize=blocksize)
    d = jnp.real(jnp.diagonal(F.data))
    idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    live = idx < A.m
    eps = jnp.finfo(d.dtype).eps
    tol = eps * A.m * jnp.max(jnp.abs(d))
    pos = jnp.sum(jnp.where(live & (d > tol), 1, 0))
    neg = jnp.sum(jnp.where(live & (d < -tol), 1, 0))
    zero = A.m - pos - neg
    return pos, neg, zero
