"""Second-order cone programming: primal-dual interior-point method.

min c^T x  s.t.  A x = b,  x in K = Q_{n_1} x ... x Q_{n_k},
Q_n = {(x0, xb) : x0 >= ||xb||_2}  (upstream Elemental's socp::direct
spec; the layer the Hydrogen fork removed).

Implementation: Mehrotra predictor-corrector with the Jordan-algebra
(AHO/XZ) Newton direction — Arw(z) dx + Arw(x) dz = sigma mu e - x o z —
solved as one dense KKT system per step, with fraction-to-boundary step
lengths computed from the cone quadratic det(x + alpha dx) = 0. The
arrowhead/Jordan operators are the SOC analogues of the LP diagonal
scalings."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .lp import LPSolution


def _blocks(dims: Sequence[int]) -> List[slice]:
    out = []
    o = 0
    for d in dims:
        out.append(slice(o, o + d))
        o += d
    return out


def _jprod(x: np.ndarray, y: np.ndarray, blocks) -> np.ndarray:
    """Jordan product x o y per cone block."""
    out = np.zeros_like(x)
    for sl in blocks:
        xb, yb = x[sl], y[sl]
        out[sl] = np.concatenate(
            [[xb @ yb], xb[0] * yb[1:] + yb[0] * xb[1:]])
    return out


def _arrow(x: np.ndarray, blocks) -> np.ndarray:
    """Block-diagonal arrowhead matrix Arw(x)."""
    n = x.shape[0]
    M = np.zeros((n, n))
    for sl in blocks:
        xb = x[sl]
        d = xb.shape[0]
        M[sl, sl] = xb[0] * np.eye(d)
        M[sl.start, sl] = xb
        M[sl, sl.start] = xb
        M[sl.start, sl.start] = xb[0]
    return M


def _unit(n: int, blocks) -> np.ndarray:
    e = np.zeros(n)
    for sl in blocks:
        e[sl.start] = 1.0
    return e


def _in_cone_margin(x: np.ndarray, blocks) -> float:
    """min over blocks of (x0 - ||xb||)."""
    m = np.inf
    for sl in blocks:
        xb = x[sl]
        m = min(m, xb[0] - np.linalg.norm(xb[1:]))
    return m


def _max_step(x: np.ndarray, dx: np.ndarray, blocks) -> float:
    """Largest alpha <= 1 with x + alpha dx in the cone interior:
    per block the boundary is the smaller positive root of
    det(x + alpha d) = 0 (a quadratic), plus x0 + alpha d0 > 0."""
    alpha = 1.0
    for sl in blocks:
        xb, db = x[sl], dx[sl]
        # quadratic: det(x + a d) = (x0+a d0)^2 - ||xb_+a db_||^2
        a2 = db[0] ** 2 - db[1:] @ db[1:]
        a1 = 2 * (xb[0] * db[0] - xb[1:] @ db[1:])
        a0 = xb[0] ** 2 - xb[1:] @ xb[1:]
        roots = []
        if abs(a2) > 1e-300:
            disc = a1 * a1 - 4 * a2 * a0
            if disc >= 0:
                sq = np.sqrt(disc)
                roots += [(-a1 - sq) / (2 * a2), (-a1 + sq) / (2 * a2)]
        elif abs(a1) > 1e-300:
            roots += [-a0 / a1]
        if db[0] < 0:
            roots += [-xb[0] / db[0]]
        pos = [r for r in roots if r > 1e-14]
        if pos:
            alpha = min(alpha, min(pos))
    return alpha


def SOCP(A, b, c, dims: Sequence[int], max_its: int = 100,
         tol: float = 1e-8) -> LPSolution:
    """Solve the standard-form SOCP; dims lists each cone's dimension
    (sum(dims) == n)."""
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64).ravel()
    c = np.asarray(c, np.float64).ravel()
    m, n = A.shape
    if sum(dims) != n:
        raise ValueError("sum(dims) must equal the variable dimension")
    blocks = _blocks(dims)
    e = _unit(n, blocks)
    x = e.copy()
    z = e.copy()
    y = np.zeros(m)
    nk = len(dims)
    bnorm = 1.0 + np.linalg.norm(b)
    cnorm = 1.0 + np.linalg.norm(c)
    converged = False
    it = 0

    def newton(rb, rc, rxz):
        # [ 0      A^T    I   ] [dx]   [-rc ]
        # [ A      0      0   ] [dy] = [-rb ]
        # [Arw(z)  0   Arw(x) ] [dz]   [-rxz]
        Az = _arrow(z, blocks)
        Ax = _arrow(x, blocks)
        K = np.zeros((2 * n + m, 2 * n + m))
        K[:n, n:n + m] = A.T
        K[:n, n + m:] = np.eye(n)
        K[n:n + m, :n] = A
        K[n + m:, :n] = Az
        K[n + m:, n + m:] = Ax
        rhs = np.concatenate([-rc, -rb, -rxz])
        sol = np.linalg.solve(K + 1e-13 * np.eye(2 * n + m), rhs)
        return sol[:n], sol[n:n + m], sol[n + m:]

    for it in range(1, max_its + 1):
        rb = A @ x - b
        rc = A.T @ y + z - c
        mu = (x @ z) / nk
        if (np.linalg.norm(rb) / bnorm < tol
                and np.linalg.norm(rc) / cnorm < tol and mu < tol):
            converged = True
            break
        # predictor
        dxa, dya, dza = newton(rb, rc, _jprod(x, z, blocks))
        ap = _max_step(x, dxa, blocks)
        ad = _max_step(z, dza, blocks)
        a = min(ap, ad)
        mu_aff = ((x + a * dxa) @ (z + a * dza)) / nk
        sigma = max(min((mu_aff / mu) ** 3, 1.0), 1e-8) if mu > 0 else 0.1
        # corrector
        rxz = _jprod(x, z, blocks) + _jprod(dxa, dza, blocks) - sigma * mu * e
        dx_, dy_, dz_ = newton(rb, rc, rxz)
        ap = min(0.98 * _max_step(x, dx_, blocks), 1.0)
        ad = min(0.98 * _max_step(z, dz_, blocks), 1.0)
        a = min(ap, ad)
        x = x + a * dx_
        y = y + a * dy_
        z = z + a * dz_
    return LPSolution(x, y, z, it, float(c @ x), float(b @ y), converged)


SecondOrderConeProgram = SOCP
