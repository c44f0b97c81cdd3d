"""Mixed-precision iterative refinement: LAPACK-grade f64 solves on the
f32/bf16 MXU.

SURVEY §7 hard-part #1 asks for 'LAPACK-grade residuals in
f64-emulation'. The classic route (Wilkinson; modern mixed-precision
LU-IR): factor once in working precision (f32 — fast), then iterate
    r_k = b - A x_k   computed in EXTENDED precision,
    solve A d_k = r_k with the low-precision factors,
    x_{k+1} = x_k + d_k,
which converges to the extended-precision solution as long as
cond(A) < 1/eps_work. Here the extended-precision residual is the
Ozaki-split matmul (kernels/ozaki.py, ~2^-48), and the iterate is
carried as an f32 high/low pair — everything stays on the MXU."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.dmatrix import DistMatrix
from ..core.grid import Grid
from ..core.types import MC, MR, NORMAL
from ..kernels.ozaki import matmul_f64_emulated


def RefinedLinearSolve(A: DistMatrix, b: np.ndarray, iters: int = 5
                       ) -> Tuple[np.ndarray, float]:
    """Solve A x = b to ~f64 accuracy using the f32 LU factors plus
    Ozaki-precision residuals. Returns (x as float64 on the host, final
    scaled residual). A is factored in its stored precision."""
    from .lu import LU, SolveAfter

    n = A.m
    bcol = np.asarray(b, np.float64).reshape(n, -1)
    nrhs = bcol.shape[1]
    F, P = LU(A)
    a64 = np.asarray(A.global_array(), np.float64)

    def lowprec_solve(r64: np.ndarray) -> np.ndarray:
        R = DistMatrix.from_global(r64.astype(np.float32), MC, MR, A.grid)
        return np.asarray(SolveAfter(NORMAL, F, P, R).global_array(),
                          np.float64)

    x = lowprec_solve(bcol)
    resid = np.inf
    for _ in range(iters):
        ax = matmul_f64_emulated(a64, x)
        r = bcol - ax
        new_resid = float(np.max(np.abs(r)) /
                          (np.finfo(np.float64).eps * n
                           * max(np.max(np.abs(bcol)), 1e-300)))
        if not np.isfinite(new_resid) or new_resid >= resid:
            break
        resid = new_resid
        x = x + lowprec_solve(r)
    ax = matmul_f64_emulated(a64, x)
    r = bcol - ax
    resid = float(np.max(np.abs(r)) /
                  (np.finfo(np.float64).eps * n
                   * max(np.max(np.abs(bcol)), 1e-300)))
    return (x if b.ndim > 1 else x[:, 0]), resid


def RefinedHPDSolve(uplo, A: DistMatrix, b: np.ndarray, iters: int = 5
                    ) -> Tuple[np.ndarray, float]:
    """Cholesky-based variant (reference contract:
    tests/lapack_like/Cholesky.cpp's scaled residual, met in f64 terms
    with f32 factors)."""
    from .cholesky import Cholesky, SolveAfter

    n = A.m
    bcol = np.asarray(b, np.float64).reshape(n, -1)
    L = Cholesky(uplo, A)
    a64 = np.asarray(A.global_array(), np.float64)
    a64 = np.tril(a64) + np.tril(a64, -1).T if uplo == 0 else \
        np.triu(a64) + np.triu(a64, 1).T

    def lowprec_solve(r64: np.ndarray) -> np.ndarray:
        R = DistMatrix.from_global(r64.astype(np.float32), MC, MR, A.grid)
        return np.asarray(SolveAfter(uplo, NORMAL, L, R).global_array(),
                          np.float64)

    x = lowprec_solve(bcol)
    for _ in range(iters):
        r = bcol - matmul_f64_emulated(a64, x)
        x = x + lowprec_solve(r)
    r = bcol - matmul_f64_emulated(a64, x)
    resid = float(np.max(np.abs(r)) /
                  (np.finfo(np.float64).eps * n
                   * max(np.max(np.abs(bcol)), 1e-300)))
    return (x if b.ndim > 1 else x[:, 0]), resid
