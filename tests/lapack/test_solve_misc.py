"""euclidean_min / solve / equilibrate / util / ID tests."""

import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import (
    ASCENDING,
    DESCENDING,
    LOWER,
    NORMAL,
    TRANSPOSE,
    UPPER,
)
from elementalx.lapack.euclidean_min import GLM, LSE, LeastSquares, Ridge, Tikhonov
from elementalx.lapack.solve import (
    HermitianSolve,
    MultiShiftHessSolve,
    SymmetricSolve,
)
from elementalx.lapack.equilibrate import GeomEquil, RuizEquil, SymmetricRuizEquil
from elementalx.lapack.util import Median, Sort, SortColumns, TaggedSort
from elementalx.lapack.id_skeleton import ID, Skeleton


def test_least_squares_overdetermined(grid, rng):
    m, n, k = 30, 10, 3
    a = rng.standard_normal((m, n))
    b = rng.standard_normal((m, k))
    X = LeastSquares(NORMAL, DistMatrix.from_global(a, grid=grid),
                     DistMatrix.from_global(b, grid=grid)).global_array()
    ref, *_ = np.linalg.lstsq(a, b, rcond=None)
    np.testing.assert_allclose(X, ref, atol=1e-10)


def test_least_squares_underdetermined(grid, rng):
    m, n = 8, 20
    a = rng.standard_normal((m, n))
    b = rng.standard_normal((m, 2))
    X = LeastSquares(NORMAL, DistMatrix.from_global(a, grid=grid),
                     DistMatrix.from_global(b, grid=grid)).global_array()
    ref, *_ = np.linalg.lstsq(a, b, rcond=None)  # min-norm solution
    np.testing.assert_allclose(a @ X, b, atol=1e-10)
    np.testing.assert_allclose(X, ref, atol=1e-9)


def test_ridge_tikhonov(grid, rng):
    m, n = 20, 8
    a = rng.standard_normal((m, n))
    b = rng.standard_normal((m, 1))
    gamma = 0.7
    X = Ridge(NORMAL, DistMatrix.from_global(a, grid=grid),
              DistMatrix.from_global(b, grid=grid), gamma).global_array()
    ref = np.linalg.solve(a.T @ a + gamma ** 2 * np.eye(n), a.T @ b)
    np.testing.assert_allclose(X, ref, atol=1e-10)
    g = rng.standard_normal((n, n))
    Xt = Tikhonov(NORMAL, DistMatrix.from_global(a, grid=grid),
                  DistMatrix.from_global(b, grid=grid),
                  DistMatrix.from_global(g, grid=grid)).global_array()
    reft = np.linalg.solve(a.T @ a + g.T @ g, a.T @ b)
    np.testing.assert_allclose(Xt, reft, atol=1e-9)


def test_lse(grid, rng):
    m, n, p = 16, 8, 3
    a = rng.standard_normal((m, n))
    b = rng.standard_normal((p, n))
    c = rng.standard_normal((m, 1))
    d = rng.standard_normal((p, 1))
    X = LSE(DistMatrix.from_global(a, grid=grid),
            DistMatrix.from_global(b, grid=grid),
            DistMatrix.from_global(c, grid=grid),
            DistMatrix.from_global(d, grid=grid)).global_array()
    # constraint satisfied
    np.testing.assert_allclose(b @ X, d, atol=1e-9)
    # KKT optimality: A^H (A x - c) in range(B^H)
    r = a.T @ (a @ X - c)
    lam, *_ = np.linalg.lstsq(b.T, r, rcond=None)
    np.testing.assert_allclose(b.T @ lam, r, atol=1e-8)


def test_glm(grid, rng):
    m, n, p = 12, 5, 12
    a = rng.standard_normal((m, n))
    b = rng.standard_normal((m, p))
    d = rng.standard_normal((m, 1))
    X, Y = GLM(DistMatrix.from_global(a, grid=grid),
               DistMatrix.from_global(b, grid=grid),
               DistMatrix.from_global(d, grid=grid))
    np.testing.assert_allclose(a @ X.global_array() + b @ Y.global_array(),
                               d, atol=1e-8)


def test_symmetric_hermitian_solve(grid, rng):
    n = 12
    a = rng.standard_normal((n, n))
    sym = a + a.T + 2 * n * np.eye(n)
    b = rng.standard_normal((n, 2))
    X = SymmetricSolve(LOWER, NORMAL, DistMatrix.from_global(sym, grid=grid),
                       DistMatrix.from_global(b, grid=grid)).global_array()
    np.testing.assert_allclose(sym @ X, b, atol=1e-9)
    h = a + 1j * rng.standard_normal((n, n))
    h = h + h.conj().T + 2 * n * np.eye(n)
    Xh = HermitianSolve(LOWER, NORMAL, DistMatrix.from_global(h, grid=grid),
                        DistMatrix.from_global(b.astype(complex), grid=grid)
                        ).global_array()
    np.testing.assert_allclose(h @ Xh, b, atol=1e-9)


def test_multishift_hess_solve(grid, rng):
    n, ns = 10, 4
    a = rng.standard_normal((n, n))
    h = np.triu(a, -1)  # upper Hessenberg
    b = rng.standard_normal((n, ns))
    shifts = rng.standard_normal(ns) * 0.1
    X = MultiShiftHessSolve(UPPER, NORMAL, 1.0,
                            DistMatrix.from_global(h, grid=grid), shifts,
                            DistMatrix.from_global(b, grid=grid)
                            ).global_array()
    for j in range(ns):
        ref = np.linalg.solve(h - shifts[j] * np.eye(n), b[:, j])
        np.testing.assert_allclose(X[:, j], ref, atol=1e-9)


def test_equilibrate(grid, rng):
    n = 12
    a = rng.standard_normal((n, n)) * np.logspace(0, 6, n)[None, :]
    A = DistMatrix.from_global(a, grid=grid)
    S, dr, dc = RuizEquil(A, max_iter=10)
    s = S.global_array()
    # scaled matrix has row/col max-norms ~1
    assert np.abs(np.abs(s).max(axis=0) - 1).max() < 0.1
    recon = np.asarray(dr)[:n, None] * s * np.asarray(dc)[None, :n]
    np.testing.assert_allclose(recon, a, rtol=1e-12)
    S2, r, c = GeomEquil(A)
    assert np.isfinite(S2.global_array()).all()
    sym = a + a.T
    S3, d3 = SymmetricRuizEquil(DistMatrix.from_global(sym, grid=grid))
    s3 = S3.global_array()
    assert np.allclose(s3, s3.T)


def test_sort_median(rng):
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal(31))
    s = np.asarray(Sort(x))
    np.testing.assert_allclose(s, np.sort(np.asarray(x)))
    sd = np.asarray(Sort(x, DESCENDING))
    np.testing.assert_allclose(sd, np.sort(np.asarray(x))[::-1])
    vals, idx = TaggedSort(x)
    np.testing.assert_allclose(np.asarray(vals),
                               np.asarray(x)[np.asarray(idx)])
    assert abs(float(Median(x)) - np.median(np.asarray(x))) < 1e-12


def test_id_skeleton(grid, rng):
    m, n, r = 20, 14, 6
    # rank-r matrix
    a = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    A = DistMatrix.from_global(a, grid=grid)
    P, Z = ID(A, r)
    perm = np.asarray(P.perm)[:n]
    cols = a[:, perm[:r]]
    z = Z.global_array()
    approx = np.concatenate([cols, cols @ z], axis=1)
    np.testing.assert_allclose(approx, a[:, perm], atol=1e-8)
    PC, PR, G = Skeleton(A, r)
    C = a[:, np.asarray(PC.perm)[:r]]
    R = a[np.asarray(PR.perm)[:r], :]
    np.testing.assert_allclose(C @ G.global_array() @ R, a, atol=1e-7)


def test_symmetric_equilibration_variants(grid, rng):
    """equilibrate/SymmetricGeomEquil.cpp + SymmetricDiagonalEquil.cpp:
    symmetric reconstruction identity and conditioning improvement."""
    from elementalx.lapack import (SymmetricDiagonalEquil,
                                   SymmetricGeomEquil)

    n = 24
    s = rng.standard_normal((n, n))
    s = s + s.T
    sc = np.exp(rng.standard_normal((n, 1)) * 3)
    s = s * sc * sc.T  # symmetric ill-scaling
    S = DistMatrix.from_global(s, grid=grid)
    out, d = SymmetricGeomEquil(S)
    o = np.asarray(out.global_array())
    dn = np.asarray(d)[:n]
    np.testing.assert_allclose(dn[:, None] * o * dn[None, :], s,
                               rtol=1e-10)
    r0 = np.abs(s).max() / np.abs(s[s != 0]).min()
    r1 = np.abs(o).max() / np.abs(o[np.abs(o) > 0]).min()
    assert r1 < r0
    A2, d2 = SymmetricDiagonalEquil(S)
    np.testing.assert_allclose(np.asarray(d2)[:n], 1.0)
