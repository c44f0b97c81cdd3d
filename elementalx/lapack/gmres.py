"""Restarted GMRES solvers (flexible and left-preconditioned).

Reference: include/El/lapack_like/solve/FGMRES.hpp (Saad's flexible
inner-outer GMRES, Algorithm 2.2) and solve/LGMRES.hpp — the iterative
solvers behind the reference's regularized solves
(factor.hpp REG_SOLVE_FGMRES / REG_SOLVE_LGMRES).

TPU-native design: each restart cycle is a STATIC python loop of
`restart` Arnoldi steps (classical Gram-Schmidt with one
reorthogonalization — two n x restart MXU matvecs per step instead of
the reference's sequential MGS column loop), and the small projected
least-squares problem min ||beta e1 - Hbar y|| is solved once per cycle
with a dense lstsq instead of the reference's running Givens rotations
(the O(restart^2) scalar rotation chain is latency-bound on an
accelerator; one (restart+1) x restart solve is not). Convergence is a
masked flag — iterations after convergence are no-ops, keeping the
whole solver jittable with static shapes.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix


def _as_apply(A) -> Callable[[jax.Array], jax.Array]:
    if callable(A):
        return A
    if isinstance(A, DistMatrix):
        n = A.m
        Ad = A.replicated()[:n, :n]
        return lambda x: Ad @ x
    Aj = jnp.asarray(A)
    return lambda x: Aj @ x


def _gmres_single(applyA, precond, b, rel_tol, restart, max_restarts,
                  flexible: bool) -> Tuple[jax.Array, jax.Array]:
    n = b.shape[0]
    dt = b.dtype
    rdt = jnp.abs(b).dtype
    x = jnp.zeros((n,), dt)
    # left preconditioning solves inv(M) A x = inv(M) b: the residual,
    # the Krylov space, and the convergence metric are all inv(M)-sided
    r = precond(b) if (not flexible and precond is not None) else b
    bnorm = jnp.sqrt(jnp.sum(jnp.abs(r) ** 2))
    tiny = jnp.asarray(jnp.finfo(rdt).tiny, rdt)
    its = jnp.zeros((), jnp.int32)
    done = bnorm == 0

    e1 = jnp.zeros((restart + 1,), dt).at[0].set(1.0)

    for _ in range(max_restarts):
        beta = jnp.sqrt(jnp.sum(jnp.abs(r) ** 2))
        V = jnp.zeros((n, restart + 1), dt)
        V = V.at[:, 0].set(r / jnp.maximum(beta, tiny))
        Z = jnp.zeros((n, restart), dt)
        Hb = jnp.zeros((restart + 1, restart), dt)
        for j in range(restart):
            vj = V[:, j]
            if flexible:
                # right (flexible): Arnoldi on A M^{-1}, store z_j
                z = precond(vj) if precond is not None else vj
                Z = Z.at[:, j].set(z)
                u = applyA(z)
            else:
                # left: Arnoldi on M^{-1} A
                u = applyA(vj)
                if precond is not None:
                    u = precond(u)
            # classical Gram-Schmidt + one reorthogonalization: columns
            # past j are zero, so the full-V products are the masked MGS
            h = jnp.conj(V.T) @ u
            u = u - V @ h
            h2 = jnp.conj(V.T) @ u
            u = u - V @ h2
            h = h + h2
            hj1 = jnp.sqrt(jnp.sum(jnp.abs(u) ** 2))
            V = V.at[:, j + 1].set(u / jnp.maximum(hj1, tiny))
            col = h[:restart + 1].at[j + 1].set(hj1.astype(dt))
            # zero any spurious components below j+1
            mask = jnp.arange(restart + 1) <= j + 1
            Hb = Hb.at[:, j].set(jnp.where(mask, col, 0))
        y = jnp.linalg.lstsq(Hb, beta.astype(dt) * e1)[0]
        dx = (Z if flexible else V[:, :restart]) @ y
        x_new = x + dx
        r_new = b - applyA(x_new) if (flexible or precond is None) \
            else precond(b - applyA(x_new))
        # for left preconditioning the convergence metric is the
        # preconditioned residual, as in the reference's LGMRES
        x = jnp.where(done, x, x_new)
        r = jnp.where(done, r, r_new)
        rnorm = jnp.sqrt(jnp.sum(jnp.abs(r) ** 2))
        its = its + jnp.where(done, 0, restart)
        done = done | (rnorm <= rel_tol * jnp.maximum(bnorm, tiny))
    return x, its


def _driver(A, precond, B, rel_tol, restart, max_its, flexible):
    applyA = _as_apply(A)
    restart = int(restart)
    max_restarts = max(1, -(-int(max_its) // restart))
    is_dm = isinstance(B, DistMatrix)
    if is_dm:
        Bd = B.replicated()[:B.m, :B.n]
    else:
        Bd = jnp.asarray(B)
    squeeze = Bd.ndim == 1
    if squeeze:
        Bd = Bd[:, None]
    cols = []
    its = jnp.zeros((), jnp.int32)
    for k in range(Bd.shape[1]):
        xk, itk = _gmres_single(applyA, precond, Bd[:, k], rel_tol,
                                restart, max_restarts, flexible)
        cols.append(xk)
        its = jnp.maximum(its, itk)
    X = jnp.stack(cols, axis=1)
    if squeeze:
        X = X[:, 0]
    if is_dm:
        from ..core.dmatrix import DistMatrix as DM

        X2 = X if X.ndim == 2 else X[:, None]
        return DM.from_global(X2, grid=B.grid), its
    return X, its


def FGMRES(A, precond: Optional[Callable], B,
           rel_tol: float = 1e-8, restart: int = 20,
           max_its: int = 100):
    """Flexible (right-preconditioned) restarted GMRES
    (reference: solve/FGMRES.hpp). ``A`` is a callable x -> A x, a
    DistMatrix, or an array; ``precond`` is a callable b -> approx
    inv(A) b (may vary between applications — that is the 'flexible'
    part) or None. Returns (X, iterations)."""
    return _driver(A, precond, B, rel_tol, restart, max_its,
                   flexible=True)


def LGMRES(A, precond: Optional[Callable], B,
           rel_tol: float = 1e-8, restart: int = 20,
           max_its: int = 100):
    """Left-preconditioned restarted GMRES (reference: solve/LGMRES.hpp):
    Arnoldi on v -> inv(M) A v with the inv(M)-residual as the
    convergence metric. Returns (X, iterations)."""
    return _driver(A, precond, B, rel_tol, restart, max_its,
                   flexible=False)
