"""Linear programming: Mehrotra predictor-corrector IPM.

min c^T x  s.t.  A x = b, x >= 0   (standard form; upstream Elemental's
lp::direct::Mehrotra spec)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..core.dmatrix import DistMatrix
from ..core.grid import Grid
from ..core.types import MC, MR


class LPSolution(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    z: np.ndarray
    iterations: int
    primal_obj: float
    dual_obj: float
    converged: bool


def _newton_solve(A, x, z, rb, rc, rxz, use_sparse: bool, grid,
                  solver: str = "direct"):
    """Solve the full LP Newton system
        [ 0   A^T  I ] [dx]   [-rc]
        [ A   0    0 ] [dy] = [-rb]
        [ Z   0    X ] [dz]   [-rxz]
    """
    m, n = A.shape
    if use_sparse:
        from ..sparse import SparseLDL, SolveAfter, SparseMatrix

        # quasi-definite reduction: eliminate dz = X^{-1}(-rxz - Z dx):
        # [ -X^{-1}Z  A^T ] [dx]   [-rc + X^{-1} rxz]
        # [ A         0   ] [dy] = [-rb]
        dxz = z / x
        K = np.zeros((n + m, n + m))
        K[:n, :n] = -np.diag(dxz)
        K[:n, n:] = A.T
        K[n:, :n] = A
        # regularize the (2,2) block for quasi-definiteness
        K[n:, n:] = -1e-10 * np.eye(m)
        S = SparseMatrix.from_dense(K)
        rhs = np.concatenate([-rc + rxz / x, -rb])
        sol = SolveAfter(SparseLDL(S), rhs)
        dx = sol[:n]
        dy = sol[n:]
        dz = (-rxz - z * dx) / x
        return dx, dy, dz
    # dense path: same reduced KKT. Small systems stay on the host
    # (dispatch-bound regime); large ones go through the distributed LU.
    dxz = z / x
    K = np.zeros((n + m, n + m))
    K[:n, :n] = -np.diag(dxz)
    K[:n, n:] = A.T
    K[n:, :n] = A
    rhs = np.concatenate([-rc + rxz / x, -rb])
    if solver == "reg":
        # the reference's IPM solve architecture (factor.hpp
        # RegSolveCtrl): LDL of the REGULARIZED quasi-definite KKT
        # matrix preconditions FGMRES on the true system
        import jax.numpy as jnp

        from ..lapack.ldl import RegularizedLDL, RegularizedSolveAfter

        delta = 1e-8 * max(1.0, float(np.abs(K).max()))
        reg = jnp.concatenate([jnp.zeros((n,)),
                               -delta * jnp.ones((m,))])
        Kdm = DistMatrix.from_global(K, MC, MR, grid)
        F = RegularizedLDL(Kdm, reg, conjugate=False)
        Rdm = DistMatrix.from_global(rhs[:, None], MC, MR, grid)
        X = RegularizedSolveAfter(Kdm, reg, F, Rdm, conjugate=False,
                                  rel_tol=1e-12, restart=8, max_its=32)
        sol = np.asarray(X.global_array())[:, 0]
    elif n + m < 512:
        sol = np.linalg.solve(K, rhs)
    else:
        from ..lapack.lu import LinearSolve

        Kdm = DistMatrix.from_global(K, MC, MR, grid)
        Rdm = DistMatrix.from_global(rhs[:, None], MC, MR, grid)
        sol = LinearSolve(Kdm, Rdm).global_array()[:, 0]
    dx = sol[:n]
    dy = sol[n:]
    dz = (-rxz - z * dx) / x
    return dx, dy, dz


def LinearProgram(A, b, c, max_its: int = 100, tol: float = 1e-8,
                  use_sparse: bool = False,
                  grid: Optional[Grid] = None,
                  solver: str = "direct") -> LPSolution:
    """Mehrotra predictor-corrector (upstream spec: lp/direct/IPM).
    ``solver='reg'`` routes the KKT solves through RegularizedLDL +
    FGMRES (the reference's REG_SOLVE_FGMRES architecture)."""
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64).ravel()
    c = np.asarray(c, np.float64).ravel()
    m, n = A.shape
    # starting point (Mehrotra's heuristic, simplified)
    AAT = A @ A.T + 1e-12 * np.eye(m)
    y = np.linalg.solve(AAT, A @ c)
    x = A.T @ np.linalg.solve(AAT, b)
    z = c - A.T @ y
    dx = max(-1.5 * x.min(), 0.0) + 0.1
    dz = max(-1.5 * z.min(), 0.0) + 0.1
    x = x + dx
    z = z + dz
    xs = x @ z
    x += 0.5 * xs / max(z.sum(), 1e-12)
    z += 0.5 * xs / max(x.sum(), 1e-12)
    x = np.maximum(x, 1e-2)
    z = np.maximum(z, 1e-2)

    bnorm = 1.0 + np.linalg.norm(b)
    cnorm = 1.0 + np.linalg.norm(c)
    converged = False
    it = 0
    for it in range(1, max_its + 1):
        rb = A @ x - b
        rc = A.T @ y + z - c
        mu = (x @ z) / n
        if (np.linalg.norm(rb) / bnorm < tol
                and np.linalg.norm(rc) / cnorm < tol and mu < tol):
            converged = True
            break
        # predictor
        dxa, dya, dza = _newton_solve(A, x, z, rb, rc, x * z, use_sparse,
                                      grid, solver=solver)
        ap = _max_step(x, dxa)
        ad = _max_step(z, dza)
        mu_aff = ((x + ap * dxa) @ (z + ad * dza)) / n
        sigma = (mu_aff / mu) ** 3 if mu > 0 else 0.1
        # corrector
        rxz = x * z + dxa * dza - sigma * mu
        dx_, dy_, dz_ = _newton_solve(A, x, z, rb, rc, rxz, use_sparse,
                                      grid, solver=solver)
        ap = min(0.99 * _max_step(x, dx_), 1.0)
        ad = min(0.99 * _max_step(z, dz_), 1.0)
        x = x + ap * dx_
        y = y + ad * dy_
        z = z + ad * dz_
    return LPSolution(x, y, z, it, float(c @ x), float(b @ y), converged)


def _max_step(v: np.ndarray, dv: np.ndarray) -> float:
    neg = dv < 0
    if not neg.any():
        return 1.0
    return float(min(1.0, np.min(-v[neg] / dv[neg])))


LP = LinearProgram
