"""Bunch-Kaufman pivoted LDL tests (reference:
factor/LDL/dense/Pivoted.hpp, SolveAfter.hpp, props/Inertia.cpp).

These cover the indefinite cases where routing through pivoted LU is not
a valid substitute: a saddle-point KKT matrix, a Wilkinson-type
indefinite matrix, and matrices whose unpivoted LDL breaks down on a
zero leading pivot.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.lapack.ldl import (
    InertiaAfterLDL,
    Inertia,
    LDLPivoted,
    SolveAfterPivoted,
)


def _check_factorization(a, F, dSub, perm, conjugate=True, tol=5e-11):
    n = a.shape[0]
    Fg = F.global_array()
    L = np.tril(Fg, -1) + np.eye(n)
    d = np.diag(Fg)
    sub = np.asarray(dSub)[: n - 1]
    D = np.diag(d) + np.diag(sub, -1) + np.diag(
        np.conj(sub) if conjugate else sub, 1)
    P = np.asarray(perm)[:n]
    recon = L @ D @ (np.conj(L.T) if conjugate else L.T)
    pap = a[np.ix_(P, P)]
    scale = max(np.abs(a).max(), 1.0)
    err = np.abs(recon - pap).max() / scale
    assert err < tol, f"factorization residual {err}"
    # unit-L magnitudes bounded (Bunch-Kaufman growth guarantee)
    assert np.abs(L).max() < 1.0 / 0.3
    return d, sub


def test_bk_wilkinson_indefinite(grid, rng):
    """Wilkinson-type tridiagonal with zero leading diagonal — the
    canonical case where unpivoted LDL dies on a zero pivot."""
    n = 16  # even: the zero-diagonal chain is nonsingular (odd is not)
    a = np.zeros((n, n))
    a += np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
    a[0, 0] = 0.0  # explicit: leading pivot is exactly zero
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    F, dSub, perm = LDLPivoted(A)
    _check_factorization(a, F, dSub, perm)
    # solve
    b = rng.standard_normal((n, 3))
    X = SolveAfterPivoted(F, dSub, perm,
                          DistMatrix.from_global(jnp.asarray(b), grid=grid)
                          ).global_array()
    resid = np.abs(a @ X - b).max() / (np.finfo(np.float64).eps * n
                                       * np.abs(b).max())
    assert resid < 100, f"scaled solve residual {resid}"


def test_bk_saddle_point_kkt(grid, rng):
    """Quasi-definite KKT saddle-point system [[H, J^T], [J, -delta I]]."""
    m, p = 14, 6
    H0 = rng.standard_normal((m, m))
    H = H0 @ H0.T + 0.5 * np.eye(m)
    J = rng.standard_normal((p, m))
    a = np.zeros((m + p, m + p))
    a[:m, :m] = H
    a[m:, :m] = J
    a[:m, m:] = J.T
    a[m:, m:] = -1e-6 * np.eye(p)
    n = m + p
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    F, dSub, perm = LDLPivoted(A)
    d, sub = _check_factorization(a, F, dSub, perm)
    pos, neg, zero = InertiaAfterLDL(jnp.asarray(d), jnp.asarray(sub))
    assert int(pos) == m and int(neg) == p and int(zero) == 0
    b = rng.standard_normal((n, 2))
    X = SolveAfterPivoted(F, dSub, perm,
                          DistMatrix.from_global(jnp.asarray(b), grid=grid)
                          ).global_array()
    resid = np.abs(a @ X - b).max() / (np.finfo(np.float64).eps * n
                                       * np.abs(b).max())
    assert resid < 100, f"scaled solve residual {resid}"


def test_bk_random_indefinite_inertia(grid, rng):
    """Random symmetric indefinite: inertia must match the eigenvalue
    signs (pivoted path — unpivoted LDL inertia is not valid here)."""
    n = 24
    a = rng.standard_normal((n, n))
    a = 0.5 * (a + a.T)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    F, dSub, perm = LDLPivoted(A)
    _check_factorization(a, F, dSub, perm)
    w = np.linalg.eigvalsh(a)
    pos, neg, zero = Inertia(A, pivoted=True)
    assert int(pos) == int((w > 0).sum())
    assert int(neg) == int((w < 0).sum())


def test_bk_complex_hermitian(grid, rng):
    n = 15
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = 0.5 * (a + np.conj(a.T))
    a -= 2.0 * np.eye(n)  # push indefinite
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    F, dSub, perm = LDLPivoted(A, conjugate=True)
    _check_factorization(a, F, dSub, perm, conjugate=True)
    b = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    X = SolveAfterPivoted(F, dSub, perm,
                          DistMatrix.from_global(jnp.asarray(b), grid=grid)
                          ).global_array()
    resid = np.abs(a @ X - b).max() / (np.finfo(np.float64).eps * n
                                       * np.abs(b).max())
    assert resid < 100, f"scaled solve residual {resid}"


def test_bk_symmetric_complex_nonconj(grid, rng):
    """Complex SYMMETRIC (non-conjugated) variant."""
    n = 12
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = 0.5 * (a + a.T)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    F, dSub, perm = LDLPivoted(A, conjugate=False)
    _check_factorization(a, F, dSub, perm, conjugate=False)
