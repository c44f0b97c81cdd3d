"""Quadratic programming: Mehrotra predictor-corrector IPM.

min (1/2) x^T Q x + c^T x  s.t.  A x = b, x >= 0
(upstream Elemental's qp::direct spec)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.grid import Grid
from .lp import LPSolution, _max_step


def _qp_newton(Q, A, x, z, rb, rc, rxz):
    m, n = A.shape
    dxz = z / x
    K = np.zeros((n + m, n + m))
    K[:n, :n] = -(Q + np.diag(dxz))
    K[:n, n:] = A.T
    K[n:, :n] = A
    # from Q dx - A^T dy - dz = -rc with dz eliminated:
    # -(Q + X^{-1}Z) dx + A^T dy = rc + rxz/x
    rhs = np.concatenate([rc + rxz / x, -rb])
    sol = np.linalg.solve(K + 1e-14 * np.eye(n + m), rhs)
    dx = sol[:n]
    dy = sol[n:]
    dz = (-rxz - z * dx) / x
    return dx, dy, dz


def QuadraticProgram(Q, A, b, c, max_its: int = 100, tol: float = 1e-8,
                     grid: Optional[Grid] = None) -> LPSolution:
    Q = np.asarray(Q, np.float64)
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64).ravel()
    c = np.asarray(c, np.float64).ravel()
    m, n = A.shape
    x = np.ones(n)
    z = np.ones(n)
    y = np.zeros(m)
    bnorm = 1.0 + np.linalg.norm(b)
    cnorm = 1.0 + np.linalg.norm(c)
    converged = False
    it = 0
    for it in range(1, max_its + 1):
        rb = A @ x - b
        rc = Q @ x + c - A.T @ y - z
        mu = (x @ z) / n
        if (np.linalg.norm(rb) / bnorm < tol
                and np.linalg.norm(rc) / cnorm < tol and mu < tol):
            converged = True
            break
        dxa, dya, dza = _qp_newton(Q, A, x, z, rb, rc, x * z)
        ap = _max_step(x, dxa)
        ad = _max_step(z, dza)
        mu_aff = ((x + ap * dxa) @ (z + ad * dza)) / n
        sigma = (mu_aff / mu) ** 3 if mu > 0 else 0.1
        rxz = x * z + dxa * dza - sigma * mu
        dx_, dy_, dz_ = _qp_newton(Q, A, x, z, rb, rc, rxz)
        ap = min(0.99 * _max_step(x, dx_), 1.0)
        ad = min(0.99 * _max_step(z, dz_), 1.0)
        x = x + ap * dx_
        y = y + ad * dy_
        z = z + ad * dz_
    obj = float(0.5 * x @ Q @ x + c @ x)
    return LPSolution(x, y, z, it, obj, float(b @ y), converged)


QP = QuadraticProgram
