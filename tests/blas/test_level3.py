"""Trsm / Trmm / Herk / Symm / two-sided tests (numpy cross-checks +
residual bounds in the reference's style)."""

import numpy as np
import pytest
import scipy.linalg as sla

import elementalx as El
from elementalx import DistMatrix
from elementalx.blas import (
    Gemm,
    Gemv,
    Her,
    Her2k,
    Herk,
    HermitianFromEVD,
    MultiShiftTrsm,
    Symm,
    Symv,
    Syr2k,
    Syrk,
    Trmm,
    Trrk,
    Trsm,
    Trsv,
    Trtrmm,
    TwoSidedTrmm,
    TwoSidedTrsm,
)
from elementalx.core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    NON_UNIT,
    NORMAL,
    RIGHT,
    TRANSPOSE,
    UNIT,
    UPPER,
)


def _rel(x, y):
    return np.linalg.norm(x - y) / max(np.linalg.norm(y), 1e-300)


def _rand_tri(rng, n, lower=True, unit=False):
    a = rng.standard_normal((n, n))
    t = np.tril(a) if lower else np.triu(a)
    np.fill_diagonal(t, np.abs(t.diagonal()) + n)  # well conditioned
    if unit:
        np.fill_diagonal(t, 1.0)
    return t


@pytest.mark.parametrize("side", [LEFT, RIGHT], ids=["L", "R"])
@pytest.mark.parametrize("uplo", [LOWER, UPPER], ids=["lo", "up"])
@pytest.mark.parametrize("orient", [NORMAL, TRANSPOSE, ADJOINT],
                         ids=["N", "T", "A"])
def test_trsm_cases(grid, rng, side, uplo, orient):
    n, nrhs = 24, 10
    t = _rand_tri(rng, n, lower=(uplo == LOWER))
    b = rng.standard_normal((n, nrhs) if side == LEFT else (nrhs, n))
    A = DistMatrix.from_global(t, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    X = Trsm(side, uplo, orient, NON_UNIT, 2.0, A, B, blocksize=8)
    topn = t if orient == NORMAL else t.T
    if side == LEFT:
        ref = np.linalg.solve(topn, 2.0 * b)
    else:
        ref = (2.0 * b) @ np.linalg.inv(topn)
    assert _rel(X.global_array(), ref) < 1e-10


def test_trsm_unit_diag(grid, rng):
    n = 16
    t = _rand_tri(rng, n, lower=True, unit=False)
    b = rng.standard_normal((n, 4))
    tu = t.copy()
    np.fill_diagonal(tu, 1.0)
    A = DistMatrix.from_global(t, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    X = Trsm(LEFT, LOWER, NORMAL, UNIT, 1.0, A, B)
    assert _rel(X.global_array(), np.linalg.solve(tu, b)) < 1e-11


def test_trsv(grid, rng):
    n = 20
    t = _rand_tri(rng, n, lower=False)
    b = rng.standard_normal((n, 1))
    X = Trsv(UPPER, NORMAL, NON_UNIT,
             DistMatrix.from_global(t, grid=grid),
             DistMatrix.from_global(b, grid=grid))
    assert _rel(X.global_array(), np.linalg.solve(t, b)) < 1e-11


def test_herk_syrk(grid, rng):
    m, k = 14, 9
    a = rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k))
    c = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    A = DistMatrix.from_global(a, grid=grid)
    C = DistMatrix.from_global(c, grid=grid)
    out = Herk(LOWER, NORMAL, 2.0, A, beta=0.5, C=C).global_array()
    ref_full = 2.0 * a @ a.conj().T + 0.5 * c
    ref = np.tril(ref_full) + np.triu(c, 1)
    assert _rel(out, ref) < 1e-12
    out2 = Syrk(UPPER, TRANSPOSE, 1.0, A).global_array()
    assert _rel(out2, np.triu(a.T @ a)) < 1e-12


def test_her2k_syr2k(grid, rng):
    m, k = 12, 7
    a = rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k))
    b = rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k))
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    out = Her2k(LOWER, NORMAL, 1.5, A, B).global_array()
    ref = np.tril(1.5 * a @ b.conj().T + 1.5 * b @ a.conj().T)
    assert _rel(out, ref) < 1e-12
    out2 = Syr2k(UPPER, NORMAL, 2.0, A, B).global_array()
    ref2 = np.triu(2.0 * (a @ b.T + b @ a.T))
    assert _rel(out2, ref2) < 1e-12


def test_symm_symv(grid, rng):
    n, k = 15, 6
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, k))
    asym = np.tril(a) + np.tril(a, -1).T
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    out = Symm(LEFT, LOWER, 1.0, A, B).global_array()
    assert _rel(out, asym @ b) < 1e-12
    x = rng.standard_normal((n, 1))
    out2 = Symv(LOWER, 1.0, A, DistMatrix.from_global(x, grid=grid))
    assert _rel(out2.global_array(), asym @ x) < 1e-12


def test_trmm(grid, rng):
    n, k = 13, 8
    t = _rand_tri(rng, n, lower=True)
    b = rng.standard_normal((n, k))
    A = DistMatrix.from_global(t, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    out = Trmm(LEFT, LOWER, NORMAL, NON_UNIT, 1.0, A, B).global_array()
    assert _rel(out, t @ b) < 1e-12
    b2 = rng.standard_normal((k, n))
    B2 = DistMatrix.from_global(b2, grid=grid)
    out2 = Trmm(RIGHT, LOWER, TRANSPOSE, NON_UNIT, 2.0, A, B2).global_array()
    assert _rel(out2, 2.0 * b2 @ t.T) < 1e-12


def test_trrk(grid, rng):
    n, k = 12, 5
    a = rng.standard_normal((n, k))
    b = rng.standard_normal((k, n))
    c = rng.standard_normal((n, n))
    A, B, C = (DistMatrix.from_global(z, grid=grid) for z in (a, b, c))
    out = Trrk(LOWER, NORMAL, NORMAL, -1.0, A, B, 1.0, C).global_array()
    ref = np.tril(c - a @ b) + np.triu(c, 1)
    assert _rel(out, ref) < 1e-12


def test_trtrmm(grid, rng):
    n = 10
    t = _rand_tri(rng, n, lower=True)
    A = DistMatrix.from_global(t, grid=grid)
    out = Trtrmm(LOWER, A).global_array()
    ref = np.tril(t.T @ t) + np.triu(t, 1)
    assert _rel(out, ref) < 1e-12


def test_two_sided_trsm_trmm(grid, rng):
    n = 12
    a = rng.standard_normal((n, n))
    a = a + a.T + 2 * n * np.eye(n)
    ell = np.linalg.cholesky(a)
    s = rng.standard_normal((n, n))
    s = s + s.T
    A = DistMatrix.from_global(s, grid=grid)
    L = DistMatrix.from_global(ell, grid=grid)
    out = TwoSidedTrsm(LOWER, NON_UNIT, A, L).global_array()
    ref = np.linalg.solve(ell, np.linalg.solve(ell, s.T).T)
    assert _rel(out, ref) < 1e-10
    out2 = TwoSidedTrmm(LOWER, NON_UNIT, A, L).global_array()
    assert _rel(out2, ell.T @ s @ ell) < 1e-11


def test_multishift_trsm(grid, rng):
    n, ns = 12, 5
    t = _rand_tri(rng, n, lower=False)
    b = rng.standard_normal((n, ns))
    shifts = rng.standard_normal(ns) * 0.1
    T = DistMatrix.from_global(t, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    X = MultiShiftTrsm(LEFT, UPPER, NORMAL, 1.0, T, shifts, B).global_array()
    for j in range(ns):
        ref = np.linalg.solve(t - shifts[j] * np.eye(n), b[:, j])
        assert _rel(X[:, j], ref) < 1e-10


def test_level2_rank_updates(grid, rng):
    n = 11
    x = rng.standard_normal((n, 1)) + 1j * rng.standard_normal((n, 1))
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)
    X = DistMatrix.from_global(x, grid=grid)
    out = Her(LOWER, 1.0, X, A).global_array()
    ref = np.tril(a + x @ x.conj().T) + np.triu(a, 1)
    assert _rel(out, ref) < 1e-12


def test_gemv(grid, rng):
    m, n = 17, 9
    a = rng.standard_normal((m, n))
    x = rng.standard_normal((n, 1))
    y = rng.standard_normal((m, 1))
    out = Gemv(NORMAL, 2.0, DistMatrix.from_global(a, grid=grid),
               DistMatrix.from_global(x, grid=grid), beta=-1.0,
               y=DistMatrix.from_global(y, grid=grid))
    assert _rel(out.global_array(), 2.0 * a @ x - y) < 1e-12


def test_hermitian_from_evd(grid, rng):
    n = 10
    a = rng.standard_normal((n, n))
    a = a + a.T
    w, q = np.linalg.eigh(a)
    Q = DistMatrix.from_global(q, grid=grid)
    out = HermitianFromEVD(LOWER, Q, El.SampleUniform((n,)) * 0 + w)
    assert _rel(out.global_array(), a) < 1e-11
