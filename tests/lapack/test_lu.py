"""LU tests (reference: tests/lapack_like/LU.cpp residual pattern)."""

import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import ADJOINT, NORMAL, TRANSPOSE
from elementalx.lapack.lu import LU, LUFullPiv, LinearSolve, SolveAfter


def _split_lu(f, m):
    ell = np.tril(f, -1) + np.eye(m)
    u = np.triu(f)
    return ell, u


@pytest.mark.parametrize("n", [24, 40])
def test_lu_factorization(grid, rng, n):
    a = rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)
    F, P = LU(A, blocksize=8)
    f = F.global_array()
    ell, u = _split_lu(f, n)
    pa = a[np.asarray(P.perm)[:n], :]
    res = np.linalg.norm(pa - ell @ u) / np.linalg.norm(a)
    assert res < 1e-13
    # growth sanity: |L| <= 1 under partial pivoting
    assert np.max(np.abs(ell)) <= 1.0 + 1e-12


def test_lu_complex(grid, rng):
    n = 20
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    F, P = LU(DistMatrix.from_global(a, grid=grid), blocksize=4)
    f = F.global_array()
    ell, u = _split_lu(f, n)
    pa = a[np.asarray(P.perm)[:n], :]
    assert np.linalg.norm(pa - ell @ u) / np.linalg.norm(a) < 1e-13


@pytest.mark.parametrize("orient", [NORMAL, TRANSPOSE, ADJOINT],
                         ids=["N", "T", "A"])
def test_lu_solve(grid, rng, orient):
    n, nrhs = 32, 5
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    b = rng.standard_normal((n, nrhs)) + 1j * rng.standard_normal((n, nrhs))
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    F, P = LU(A, blocksize=8)
    X = SolveAfter(orient, F, P, B).global_array()
    op = {NORMAL: a, TRANSPOSE: a.T, ADJOINT: a.conj().T}[orient]
    eps = np.finfo(np.float64).eps
    resid = np.max(np.abs(op @ X - b)) / (eps * n * np.max(np.abs(b)))
    assert resid < 100, f"scaled residual {resid}"


def test_linear_solve(grid, rng):
    n = 28
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, 3))
    X = LinearSolve(DistMatrix.from_global(a, grid=grid),
                    DistMatrix.from_global(b, grid=grid))
    assert np.linalg.norm(a @ X.global_array() - b) / np.linalg.norm(b) < 1e-11


def test_lu_full_pivoting(grid, rng):
    n = 16
    a = rng.standard_normal((n, n))
    F, P, Q = LUFullPiv(DistMatrix.from_global(a, grid=grid))
    f = F.global_array()
    ell, u = _split_lu(f, n)
    paq = a[np.asarray(P.perm)[:n], :][:, np.asarray(Q.perm)[:n]]
    assert np.linalg.norm(paq - ell @ u) / np.linalg.norm(a) < 1e-13


def test_permutation_roundtrip(grid, rng):
    from elementalx.lapack.perm import Permutation
    import jax.numpy as jnp

    n = 12
    a = rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)
    p = np.concatenate([rng.permutation(n), np.arange(n, A.data.shape[0])])
    P = Permutation(jnp.asarray(p, jnp.int32), n)
    B = P.apply_rows(A)
    C = P.apply_rows(B, inverse=True)
    np.testing.assert_allclose(C.global_array(), a)
    np.testing.assert_allclose(B.global_array(), a[p[:n], :])


@pytest.mark.parametrize("tau", [0.0, 0.5])
def test_lu_mod(grid, rng, tau):
    """Rank-one LU update (reference: LU/Mod.hpp): P'(A + u v^H) = L' U'."""
    from elementalx.lapack.lu import LUMod

    n = 24
    a = rng.standard_normal((n, n))
    u = rng.standard_normal(n)
    v = rng.standard_normal(n)
    A = DistMatrix.from_global(a, grid=grid)
    F, P = LU(A, blocksize=8)
    F2, P2 = LUMod(F, P, u, v, conjugate=True, tau=tau)
    f = F2.global_array()
    ell = np.tril(f, -1) + np.eye(n)
    uu = np.triu(f)
    target = a + np.outer(u, v)
    pa = target[np.asarray(P2.perm)[:n], :]
    rel = np.linalg.norm(pa - ell @ uu) / np.linalg.norm(target)
    assert rel < 1e-11, f"LUMod residual {rel}"


def test_lu_mod_solve(grid, rng):
    from elementalx.lapack.lu import LUMod, SolveAfter

    n = 16
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    u = rng.standard_normal(n)
    v = rng.standard_normal(n)
    b = rng.standard_normal((n, 2))
    A = DistMatrix.from_global(a, grid=grid)
    F, P = LU(A)
    F2, P2 = LUMod(F, P, u, v, tau=0.5)
    X = SolveAfter(NORMAL, F2, P2,
                   DistMatrix.from_global(b, grid=grid)).global_array()
    target = a + np.outer(u, v)
    assert np.linalg.norm(target @ X - b) / np.linalg.norm(b) < 1e-10


def test_getrf_tournament_matches_lu(rng, monkeypatch):
    """CALU tournament panel (used when XLA's getrf custom-call would
    overflow scoped VMEM on very tall panels): P A = L U with bounded
    |L| and a valid composed permutation."""
    import jax.numpy as jnp

    import elementalx.lapack.lu as lumod

    monkeypatch.setattr(lumod, "_GETRF_CHUNK", 64)
    for (M, w) in ((300, 32), (384, 128)):
        a = jnp.asarray(rng.standard_normal((M, w)))
        packed, lperm = lumod._getrf(a)
        L = np.tril(np.asarray(packed), -1)[:, :w] + np.eye(M, w)
        U = np.triu(np.asarray(packed)[:w, :])
        PA = np.asarray(a)[np.asarray(lperm)]
        assert np.abs(PA - L @ U).max() < 1e-12
        assert len(set(np.asarray(lperm).tolist())) == M
        assert np.abs(np.tril(L, -1)).max() < 3.0  # threshold-pivot growth
