"""Cholesky tests.

Mirrors tests/lapack_like/Cholesky.cpp: factor a random HPD matrix,
solve against random RHS, require the scaled residual
||A X - Y|| / (eps * n * ||Y||) < 100."""

import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER, NORMAL, UPPER
from elementalx.lapack import Cholesky, CholeskyMod, HPDSolve, ReverseCholesky
from elementalx.lapack.cholesky import SolveAfter


def _hpd(rng, n, complex_=False):
    a = rng.standard_normal((n, n))
    if complex_:
        a = a + 1j * rng.standard_normal((n, n))
    return a @ a.conj().T + n * np.eye(n)


@pytest.mark.parametrize("uplo", [LOWER, UPPER], ids=["lo", "up"])
@pytest.mark.parametrize("complex_", [False, True], ids=["real", "cplx"])
def test_cholesky_factor(grid, rng, uplo, complex_):
    n = 40
    a = _hpd(rng, n, complex_)
    A = DistMatrix.from_global(a, grid=grid)
    F = Cholesky(uplo, A, blocksize=8)
    f = F.global_array()
    if uplo == LOWER:
        assert np.allclose(f, np.tril(f))
        rec = f @ f.conj().T
    else:
        assert np.allclose(f, np.triu(f))
        rec = f.conj().T @ f
    res = np.linalg.norm(rec - a) / np.linalg.norm(a)
    assert res < 1e-13


@pytest.mark.parametrize("uplo", [LOWER, UPPER], ids=["lo", "up"])
def test_cholesky_solve_residual(grid, rng, uplo):
    """The reference's acceptance bound (Cholesky.cpp:41-45)."""
    n, nrhs = 56, 7
    a = _hpd(rng, n)
    y = rng.standard_normal((n, nrhs))
    A = DistMatrix.from_global(a, grid=grid)
    Y = DistMatrix.from_global(y, grid=grid)
    F = Cholesky(uplo, A, blocksize=16)
    X = SolveAfter(uplo, NORMAL, F, Y)
    x = X.global_array()
    eps = np.finfo(np.float64).eps
    resid = np.max(np.abs(a @ x - y)) / (eps * n * np.max(np.abs(y)))
    assert resid < 100, f"scaled residual {resid}"


def test_hpd_solve(grid, rng):
    n = 32
    a = _hpd(rng, n)
    y = rng.standard_normal((n, 3))
    X = HPDSolve(LOWER, NORMAL, DistMatrix.from_global(a, grid=grid),
                 DistMatrix.from_global(y, grid=grid))
    assert np.linalg.norm(a @ X.global_array() - y) / np.linalg.norm(y) < 1e-11


def test_reverse_cholesky(grid, rng):
    n = 24
    a = _hpd(rng, n)
    A = DistMatrix.from_global(a, grid=grid)
    R = ReverseCholesky(LOWER, A)  # A = L^H L with L lower
    f = R.global_array()
    assert np.allclose(f, np.tril(f))
    assert np.linalg.norm(f.conj().T @ f - a) / np.linalg.norm(a) < 1e-13


def test_cholesky_mod(grid, rng):
    n, k = 20, 3
    a = _hpd(rng, n)
    v = rng.standard_normal((n, k))
    L = Cholesky(LOWER, DistMatrix.from_global(a, grid=grid))
    L2 = CholeskyMod(LOWER, L, 0.5, DistMatrix.from_global(v, grid=grid))
    f = L2.global_array()
    target = a + 0.5 * v @ v.T
    assert np.allclose(f, np.tril(f))
    assert np.linalg.norm(f @ f.T - target) / np.linalg.norm(target) < 1e-12


def test_cholesky_mod_downdate_and_upper(grid, rng):
    """Hyperbolic (downdate) sweep + UPPER routing
    (reference: factor/Cholesky/Mod.hpp's alpha<0 hyperbolic path)."""
    from elementalx.core.types import UPPER

    n, k = 24, 2
    a = _hpd(rng, n)
    v = rng.standard_normal((n, k))
    # keep A - 0.25 v v^T comfortably positive definite
    target = a - 0.25 * v @ v.T
    assert np.min(np.linalg.eigvalsh(target)) > 0
    L = Cholesky(LOWER, DistMatrix.from_global(a, grid=grid))
    L2 = CholeskyMod(LOWER, L, -0.25, DistMatrix.from_global(v, grid=grid))
    f = L2.global_array()
    assert np.linalg.norm(f @ f.T - target) / np.linalg.norm(target) < 1e-11

    R = Cholesky(UPPER, DistMatrix.from_global(a, grid=grid))
    R2 = CholeskyMod(UPPER, R, -0.25, DistMatrix.from_global(v, grid=grid))
    g = R2.global_array()
    assert np.allclose(g, np.triu(g))
    assert np.linalg.norm(g.conj().T @ g - target) / np.linalg.norm(target) < 1e-11


def test_cholesky_under_jit(grid, rng):
    import jax

    n = 16
    a = _hpd(rng, n)
    A = DistMatrix.from_global(a, grid=grid)

    @jax.jit
    def f(A):
        return Cholesky(LOWER, A)

    L = f(A).global_array()
    assert np.linalg.norm(L @ L.T - a) / np.linalg.norm(a) < 1e-13
