"""Randomized cross-check fuzz: random shapes/dtypes/grids against numpy
oracles for the core op families (the 13x13-sweep philosophy extended to
the compute layers)."""

import numpy as np
import pytest

import jax

import elementalx as El
from elementalx import ALL_DISTS, DistMatrix, Grid
from elementalx.core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    NON_UNIT,
    NORMAL,
    RIGHT,
    TRANSPOSE,
    UPPER,
)

RNG = np.random.default_rng(2024)


@pytest.fixture(autouse=True)
def _no_compile_cache():
    """XLA:CPU segfaults while SERIALIZING the giant fuzz-eig executable
    for the persistent compilation cache on some hosts (crash inside
    put_executable_and_time). These randomized programs retrace every
    run anyway — skip the cache for this module."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)


def _rand(shape, dtype):
    a = RNG.standard_normal(shape)
    if np.issubdtype(dtype, np.complexfloating):
        a = a + 1j * RNG.standard_normal(shape)
    return a.astype(dtype)


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_gemm(grid, square_grid, trial):
    r = np.random.default_rng(100 + trial)
    g = grid if trial % 2 else square_grid
    m, k, n = (int(r.integers(1, 40)) for _ in range(3))
    dtype = [np.float64, np.complex128][trial % 2]
    oa = [NORMAL, TRANSPOSE, ADJOINT][trial % 3]
    ob = [NORMAL, TRANSPOSE, ADJOINT][(trial + 1) % 3]
    a = _rand((m, k) if oa == NORMAL else (k, m), dtype)
    b = _rand((k, n) if ob == NORMAL else (n, k), dtype)
    c = _rand((m, n), dtype)
    alpha, beta = 1.7, -0.3

    def op(x, o):
        return x if o == NORMAL else (x.T if o == TRANSPOSE else x.conj().T)

    A = DistMatrix.from_global(a, grid=g)
    B = DistMatrix.from_global(b, grid=g)
    C = DistMatrix.from_global(c, grid=g)
    out = El.Gemm(oa, ob, alpha, A, B, beta=beta, C=C).global_array()
    ref = alpha * op(a, oa) @ op(b, ob) + beta * c
    assert np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-300) < 1e-11


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_solves(grid, trial):
    r = np.random.default_rng(300 + trial)
    n = int(r.integers(2, 48))
    nrhs = int(r.integers(1, 6))
    dtype = [np.float64, np.complex128][trial % 2]
    a = _rand((n, n), dtype) + 2 * n * np.eye(n)
    b = _rand((n, nrhs), dtype)
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    X = El.LinearSolve(A, B).global_array()
    assert np.linalg.norm(a @ X - b) / np.linalg.norm(b) < 1e-9
    spd = a @ a.conj().T / n + n * np.eye(n)
    S = DistMatrix.from_global(spd, grid=grid)
    Xh = El.HPDSolve(LOWER, NORMAL, S, B).global_array()
    assert np.linalg.norm(spd @ Xh - b) / np.linalg.norm(b) < 1e-9


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_factorizations(grid, trial):
    r = np.random.default_rng(500 + trial)
    m = int(r.integers(3, 40))
    n = int(r.integers(3, 40))
    dtype = [np.float64, np.complex128][trial % 2]
    a = _rand((m, n), dtype)
    A = DistMatrix.from_global(a, grid=grid)
    # QR
    Q, R = El.lapack.ExplicitQR(A, blocksize=int(r.integers(2, 9)))
    q, rr = Q.global_array(), R.global_array()
    k = min(m, n)
    assert np.linalg.norm(q @ rr - a) / np.linalg.norm(a) < 1e-11
    assert np.linalg.norm(np.eye(k) - q.conj().T @ q) < 1e-11
    # LU (square only)
    if m == n:
        F, P = El.LU(A, blocksize=int(r.integers(2, 9)))
        f = F.global_array()
        ell = np.tril(f, -1) + np.eye(n)
        u = np.triu(f)
        pa = a[np.asarray(P.perm)[:n], :]
        assert np.linalg.norm(pa - ell @ u) / np.linalg.norm(a) < 1e-11


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_redistribution_chain(grid, trial):
    r = np.random.default_rng(700 + trial)
    m = int(r.integers(1, 50))
    n = int(r.integers(1, 50))
    a = _rand((m, n), np.float64)
    A = DistMatrix.from_global(a, grid=grid)
    dists = list(ALL_DISTS)
    for _ in range(4):
        d = dists[int(r.integers(0, len(dists)))]
        A = A.redistribute(*d)
    np.testing.assert_array_equal(A.global_array(), a)


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_trsm(grid, trial):
    r = np.random.default_rng(1100 + trial)
    n = int(r.integers(2, 40))
    nrhs = int(r.integers(1, 12))
    dtype = [np.float64, np.complex128][trial % 2]
    side = [LEFT, RIGHT][trial % 2]
    uplo = [LOWER, UPPER][(trial // 2) % 2]
    orient = [NORMAL, TRANSPOSE, ADJOINT][trial % 3]
    t = _rand((n, n), dtype)
    t = (np.tril(t) if uplo == LOWER else np.triu(t)) + 2 * n * np.eye(n)
    b = _rand((n, nrhs) if side == LEFT else (nrhs, n), dtype)
    T = DistMatrix.from_global(t, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    alpha = 1.3
    X = El.Trsm(side, uplo, orient, NON_UNIT, alpha, T, B).global_array()
    top = t if orient == NORMAL else (
        t.T if orient == TRANSPOSE else t.conj().T)
    res = top @ X - alpha * b if side == LEFT else X @ top - alpha * b
    assert np.linalg.norm(res) / np.linalg.norm(b) < 1e-10


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_ldl_pivoted(grid, trial):
    """Indefinite symmetric/Hermitian systems through the Bunch-Kaufman
    factorization (pivoted-LU routing is not a valid oracle here)."""
    r = np.random.default_rng(1300 + trial)
    n = int(r.integers(4, 36))
    dtype = [np.float64, np.complex128][trial % 2]
    a = _rand((n, n), dtype)
    a = a + a.conj().T  # indefinite Hermitian
    b = _rand((n, 3), dtype)
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    from elementalx.lapack.ldl import (InertiaAfterLDL, LDLPivoted,
                                       SolveAfterPivoted)

    F, dSub, perm = LDLPivoted(A, conjugate=True)
    X = SolveAfterPivoted(F, dSub, perm, B).global_array()
    assert np.linalg.norm(a @ X - b) / np.linalg.norm(b) < 1e-9
    # inertia cross-check against the spectrum
    w = np.linalg.eigvalsh(a)
    d = np.diagonal(np.asarray(F.global_array()))[:n]
    import jax.numpy as jnp

    pos, neg, zero = InertiaAfterLDL(jnp.asarray(d),
                                     jnp.asarray(dSub)[:max(n - 1, 0)])
    assert int(pos) == int((w > 0).sum())
    assert int(neg) == int((w < 0).sum())


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_least_squares(grid, trial):
    r = np.random.default_rng(1500 + trial)
    m = int(r.integers(8, 48))
    n = int(r.integers(2, min(m, 20)))
    dtype = [np.float64, np.complex128][trial % 2]
    a = _rand((m, n), dtype)
    b = _rand((m, 2), dtype)
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    X = El.lapack.LeastSquares(NORMAL, A, B).global_array()
    ref, *_ = np.linalg.lstsq(a, b, rcond=None)
    assert np.linalg.norm(X - ref) / max(np.linalg.norm(ref), 1e-300) < 1e-8


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_svd(grid, trial):
    r = np.random.default_rng(1700 + trial)
    m = int(r.integers(4, 40))
    n = int(r.integers(4, 40))
    dtype = [np.float64, np.complex128][trial % 2]
    a = _rand((m, n), dtype)
    A = DistMatrix.from_global(a, grid=grid)
    U, s, V = El.SVD(A)
    s = np.asarray(s)
    k = min(m, n)
    ref = np.linalg.svd(a, compute_uv=False)
    assert np.max(np.abs(np.sort(s)[::-1][:k] - ref)) < 1e-9 * max(
        ref[0], 1)
    rec = (U.global_array() * s[None, :]) @ V.global_array().conj().T
    assert np.linalg.norm(rec - a) / max(np.linalg.norm(a), 1e-300) < 1e-9


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_eig(grid, trial):
    r = np.random.default_rng(900 + trial)
    n = int(r.integers(4, 40))
    dtype = [np.float64, np.complex128][trial % 2]
    a = _rand((n, n), dtype)
    a = a + a.conj().T
    A = DistMatrix.from_global(a, grid=grid)
    w, Q = El.HermitianEig(LOWER, A)
    w, q = np.asarray(w), Q.global_array()
    assert np.max(np.abs(w - np.linalg.eigvalsh(a))) < 1e-11 * max(
        np.max(np.abs(w)), 1)
    assert np.linalg.norm(a @ q - q * w[None, :]) / max(
        np.linalg.norm(a), 1e-300) < 1e-11
    assert np.linalg.norm(np.eye(n) - q.conj().T @ q) < 1e-11
