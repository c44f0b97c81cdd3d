"""Linear solve drivers (reference: src/lapack_like/solve/)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import LOWER, MC, MR, NORMAL, Orientation, UpperOrLower
from .lu import LinearSolve  # noqa: F401  (reference: solve/Linear.cpp)
from .cholesky import HPDSolve  # noqa: F401  (reference: solve/HPD.cpp)


def SymmetricSolve(uplo: UpperOrLower, orientation: Orientation,
                   A: DistMatrix, B: DistMatrix, conjugate: bool = False
                   ) -> DistMatrix:
    """Reference: solve/Symmetric.cpp (LDL-based). Falls back to pivoted
    LU when the unpivoted LDL would be unstable is the caller's call; the
    reference uses Bunch-Kaufman (see ldl.py docstring for the
    deviation)."""
    from ..blas.level1 import MakeSymmetric
    from .ldl import LDL, SolveAfter

    Af = MakeSymmetric(uplo, A.redistribute(MC, MR), conjugate=conjugate)
    F = LDL(Af, conjugate=conjugate)
    return SolveAfter(F, B, conjugate=conjugate)


def HermitianSolve(uplo: UpperOrLower, orientation: Orientation,
                   A: DistMatrix, B: DistMatrix) -> DistMatrix:
    """Reference: solve/Hermitian.cpp."""
    return SymmetricSolve(uplo, orientation, A, B, conjugate=True)


def SQSDSolve(uplo: UpperOrLower, n0: int, A: DistMatrix, B: DistMatrix
              ) -> DistMatrix:
    """Symmetric quasi-semidefinite solve (reference: solve/SQSD.cpp):
    [[F, G^H], [G, -H]] with F, H PSD — the IPM KKT structure; solved via
    the unpivoted LDL which is provably stable for quasi-definite
    matrices (Vanderbei)."""
    from .ldl import LDL, SolveAfter

    F = LDL(A.redistribute(MC, MR), conjugate=True)
    return SolveAfter(F, B, conjugate=True)


def MultiShiftHessSolve(uplo: UpperOrLower, orientation: Orientation,
                        alpha, H: DistMatrix, shifts: jax.Array,
                        X: DistMatrix) -> DistMatrix:
    """Solve (H - shifts[j] I) x_j = alpha b_j for upper-Hessenberg H
    (reference: solve/MultiShiftHess.cpp). Batched over shifts: each
    column's Hessenberg solve is a vmapped dense solve on the MXU (the
    Hessenberg structure saves O(n) Givens work the TPU would not
    exploit anyway)."""
    Hd = H.replicated()
    m = H.m
    Bd = X.replicated() * jnp.asarray(alpha, X.dtype)
    MM = Hd.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (MM, MM), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (MM, MM), 1)
    diag = i == j
    pad_one = diag & (i >= m)
    sh = jnp.asarray(shifts).astype(Hd.dtype)
    ns = sh.shape[0]

    def solve_col(shift, b):
        Hs = jnp.where(diag, Hd - shift, Hd)
        Hs = jnp.where(pad_one, jnp.ones((), Hd.dtype), Hs)
        return jnp.linalg.solve(Hs, b)

    cols = jax.vmap(solve_col, in_axes=(0, 1), out_axes=1)(sh, Bd[:, :ns])
    out = Bd.at[:, :ns].set(cols)
    return DistMatrix.from_padded(out, X.m, X.n, MC, MR, X.grid, X.wrap)
