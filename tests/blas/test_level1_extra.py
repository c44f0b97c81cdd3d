"""Tests for the long-tail level-1 surface (reference header census:
AxpyTrapezoid, TransposeAxpy, Concatenate, Reshape, diagonal/submatrix
conjugation, mapped diagonals, Kronecker, Givens/Rotate, quasi-diagonal
scale/solve)."""

import numpy as np
import jax.numpy as jnp
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.blas import level1 as L1
from elementalx.core.types import LEFT, LOWER, RIGHT, UPPER


@pytest.fixture
def g(grid):
    return grid


def _mk(rng, g, m, n, dtype=np.float64):
    a = rng.standard_normal((m, n)).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        a = a + 1j * rng.standard_normal((m, n))
    return a, DistMatrix.from_global(jnp.asarray(a), grid=g)


def test_axpy_trapezoid(rng, g):
    x, X = _mk(rng, g, 6, 6)
    y, Y = _mk(rng, g, 6, 6)
    out = L1.AxpyTrapezoid(UPPER, 2.0, X, Y, offset=1)
    ref = y + 2.0 * np.triu(x, 1)
    np.testing.assert_allclose(np.asarray(out.global_array()), ref)


def test_transpose_axpy(rng, g):
    x, X = _mk(rng, g, 5, 3)
    y, Y = _mk(rng, g, 3, 5)
    out = L1.TransposeAxpy(0.5, X, Y)
    np.testing.assert_allclose(np.asarray(out.global_array()),
                               y + 0.5 * x.T)


def test_concatenate(rng, g):
    a, A = _mk(rng, g, 5, 3)
    b, B = _mk(rng, g, 5, 2)
    C = L1.Concatenate(A, B, axis=1)
    assert (C.m, C.n) == (5, 5)
    np.testing.assert_allclose(np.asarray(C.global_array()),
                               np.concatenate([a, b], axis=1))
    c, Cv = _mk(rng, g, 2, 3)
    D = L1.Concatenate(A, Cv, axis=0)
    assert (D.m, D.n) == (7, 3)
    np.testing.assert_allclose(np.asarray(D.global_array()),
                               np.concatenate([a, c], axis=0))


def test_reshape_column_major(rng, g):
    a, A = _mk(rng, g, 4, 6)
    R = L1.Reshape(8, 3, A)
    ref = a.reshape(-1, order="F").reshape((8, 3), order="F")
    np.testing.assert_allclose(np.asarray(R.global_array()), ref)


def test_conjugate_and_real_diagonal(rng, g):
    a, A = _mk(rng, g, 5, 5, np.complex128)
    out = L1.ConjugateDiagonal(A)
    ref = a.copy()
    np.fill_diagonal(ref, np.conj(np.diag(a)))
    np.testing.assert_allclose(np.asarray(out.global_array()), ref)
    out2 = L1.MakeDiagonalReal(A)
    ref2 = a.copy()
    np.fill_diagonal(ref2, np.real(np.diag(a)))
    np.testing.assert_allclose(np.asarray(out2.global_array()), ref2)


def test_conjugate_submatrix(rng, g):
    a, A = _mk(rng, g, 6, 6, np.complex128)
    out = L1.ConjugateSubmatrix(A, slice(1, 3), slice(2, 5))
    ref = a.copy()
    ref[1:3, 2:5] = np.conj(ref[1:3, 2:5])
    np.testing.assert_allclose(np.asarray(out.global_array()), ref)


def test_diagonal_scale_trapezoid(rng, g):
    a, A = _mk(rng, g, 5, 5)
    d = rng.standard_normal(5) + 2
    D = DistMatrix.from_global(jnp.asarray(d[:, None]), grid=A.grid)
    from elementalx.core.types import NORMAL

    out = L1.DiagonalScaleTrapezoid(LEFT, NORMAL, UPPER, D, A)
    ref = np.where(np.triu(np.ones((5, 5), bool)), d[:, None] * a, a)
    np.testing.assert_allclose(np.asarray(out.global_array()), ref)


def test_mapped_diagonal(rng, g):
    a, A = _mk(rng, g, 5, 5)
    got = L1.GetMappedDiagonal(A, lambda x: x ** 2)
    np.testing.assert_allclose(
        np.asarray(got.global_array()).ravel()[:5], np.diag(a) ** 2)
    d = DistMatrix.from_global(jnp.asarray(np.ones((5, 1))), grid=A.grid)
    upd = L1.UpdateMappedDiagonal(A, d, lambda aa, dd: aa + 10 * dd)
    ref = a + 10 * np.eye(5)
    np.testing.assert_allclose(np.asarray(upd.global_array()), ref)


def test_kronecker(rng, g):
    a, A = _mk(rng, g, 2, 3)
    b, B = _mk(rng, g, 3, 2)
    K = L1.Kronecker(A, B)
    assert (K.m, K.n) == (6, 6)
    np.testing.assert_allclose(np.asarray(K.global_array()), np.kron(a, b))


def test_givens_rotate(rng, g):
    c, s, rho = L1.Givens(3.0, 4.0)
    assert abs(float(c) - 0.6) < 1e-14 and abs(float(rho) - 5.0) < 1e-14
    assert abs(float(-np.conj(s) * 3.0 + c * 4.0)) < 1e-14
    # complex
    c2, s2, r2 = L1.Givens(1 + 1j, 2 - 1j)
    assert abs(complex(-np.conj(s2) * (1 + 1j) + c2 * (2 - 1j))) < 1e-14
    assert abs(complex(c2 * (1 + 1j) + s2 * (2 - 1j)) - complex(r2)) < 1e-14


def test_quasi_diagonal(rng, g):
    n = 9
    d = rng.standard_normal(n) + 3
    dSub = np.zeros(n - 1)
    dSub[0] = 0.5
    dSub[3] = -0.8
    dSub[6] = 0.2
    D = np.diag(d) + np.diag(dSub, -1) + np.diag(dSub, 1)
    x, X = _mk(rng, g, n, 4)
    Y = L1.QuasiDiagonalScale(LEFT, LOWER, jnp.asarray(d),
                              jnp.asarray(dSub), X)
    np.testing.assert_allclose(np.asarray(Y.global_array()), D @ x,
                               atol=1e-12)
    Z = L1.QuasiDiagonalSolve(LEFT, LOWER, jnp.asarray(d),
                              jnp.asarray(dSub), X)
    np.testing.assert_allclose(np.asarray(Z.global_array()),
                               np.linalg.solve(D, x), atol=1e-12)
    # Hermitian 2x2 blocks + RIGHT side
    dc = d.astype(complex)
    sc = dSub.astype(complex)
    sc[0] = 0.4 + 0.3j
    Dh = np.diag(dc) + np.diag(sc, -1) + np.diag(np.conj(sc), 1)
    xc, Xc = _mk(rng, g, 3, n, np.complex128)
    Yr = L1.QuasiDiagonalScale(RIGHT, LOWER, jnp.asarray(dc),
                               jnp.asarray(sc), Xc, conjugated=True)
    np.testing.assert_allclose(np.asarray(Yr.global_array()), xc @ Dh,
                               atol=1e-12)
    Zr = L1.QuasiDiagonalSolve(RIGHT, LOWER, jnp.asarray(dc),
                               jnp.asarray(sc), Xc, conjugated=True)
    np.testing.assert_allclose(np.asarray(Zr.global_array()),
                               xc @ np.linalg.inv(Dh), atol=1e-12)


def test_new_generators(rng, g):
    import elementalx.matrices as M

    F = M.Fiedler(jnp.asarray([1.0, 2.0, 4.0]), grid=g)
    np.testing.assert_allclose(np.asarray(F.global_array()),
                               [[0, 1, 3], [1, 0, 2], [3, 2, 0]])
    Fo = M.Forsythe(4, 0.25, 2.0, grid=g)
    fo = np.asarray(Fo.global_array())
    assert fo[3, 0] == 0.25 and fo[0, 0] == 2.0 and fo[0, 1] == 1.0
    G = np.asarray(M.GKS(4, grid=g).global_array())
    assert abs(G[1, 1] - 1 / np.sqrt(2)) < 1e-14
    assert abs(G[0, 2] + 1 / np.sqrt(3)) < 1e-14
    J = np.asarray(M.JordanCholesky(4, grid=g).global_array())
    B = np.diag(np.ones(4)) + np.diag(2 * np.ones(3), 1)
    ref = B.T @ B
    ref[0, 0] = 1  # reference pins A00 = 1
    np.testing.assert_allclose(J, np.where(np.eye(4, dtype=bool) |
                                           (np.abs(ref) > 0), ref, 0))
    T = np.asarray(M.Triangle(5, grid=g).global_array())
    assert T[0, 1] == 1.0 and T[2, 0] == 0.25
    TE = np.asarray(M.TrefethenEmbree(6, grid=g).global_array())
    assert TE[0, 3] == 2 and TE[0, 1] == 2j and TE[3, 0] == -2j
    DR = np.asarray(M.DynamicRegCounter(3, grid=g).global_array())
    assert DR.shape == (6, 6) and DR[3, 0] == 1 and DR[3, 3] == -1
    H = M.HelmholtzPML(12, 6.0, grid=g)
    h = np.asarray(H.global_array())
    assert np.iscomplexobj(h) and abs(h[0, 2]) == 0 and h[0, 1] != 0
    # PML rows are complex, interior rows are real
    assert abs(np.imag(h[5, 5])) < 1e-12 and abs(np.imag(h[0, 0])) > 0
    U = np.asarray(M.UniformHelmholtzGreens(8, 0.5, grid=g).global_array())
    assert np.allclose(np.diag(U), 0) and np.allclose(U, U.T)
    E = np.asarray(M.Egorov(lambda i, j: (i * j).astype(jnp.float64),
                            5, grid=g).global_array())
    np.testing.assert_allclose(np.abs(E), np.ones((5, 5)), atol=1e-12)


def test_swaps_and_transform2x2(grid):
    """Swap.cpp RowSwap/ColSwap/SymmetricSwap/HermitianSwap and
    Transform2x2.cpp Rows/Cols/vector-pair forms."""
    rng = np.random.default_rng(21)
    a = rng.standard_normal((9, 7))
    A = DistMatrix.from_global(a, grid=grid)
    exp = a.copy()
    exp[[1, 4]] = exp[[4, 1]]
    np.testing.assert_allclose(
        np.asarray(L1.RowSwap(A, 1, 4).global_array()), exp)
    exp = a.copy()
    exp[:, [0, 3]] = exp[:, [3, 0]]
    np.testing.assert_allclose(
        np.asarray(L1.ColSwap(A, 0, 3).global_array()), exp)
    s = a[:7, :7] + a[:7, :7].T
    S = DistMatrix.from_global(np.tril(s), grid=grid)
    exp = s.copy()
    exp[[1, 5], :] = exp[[5, 1], :]
    exp[:, [1, 5]] = exp[:, [5, 1]]
    np.testing.assert_allclose(
        np.asarray(L1.SymmetricSwap(LOWER, S, 1, 5).global_array()),
        np.tril(exp), atol=1e-12)
    G = np.asarray([[2.0, 1.0], [0.5, -1.0]])
    out = np.asarray(L1.Transform2x2Rows(G, A, 0, 2).global_array())
    exp = a.copy()
    exp[0] = G[0, 0] * a[0] + G[0, 1] * a[2]
    exp[2] = G[1, 0] * a[0] + G[1, 1] * a[2]
    np.testing.assert_allclose(out, exp)
    out = np.asarray(L1.Transform2x2Cols(G, A, 1, 3).global_array())
    exp = a.copy()
    exp[:, 1] = G[0, 0] * a[:, 1] + G[0, 1] * a[:, 3]
    exp[:, 3] = G[1, 0] * a[:, 1] + G[1, 1] * a[:, 3]
    np.testing.assert_allclose(out, exp)
    v1 = DistMatrix.from_global(a[:, :1], grid=grid)
    v2 = DistMatrix.from_global(a[:, 1:2], grid=grid)
    n1, n2 = L1.Transform2x2(G, v1, v2)
    np.testing.assert_allclose(
        np.asarray(n1.global_array())[:, 0],
        G[0, 0] * a[:, 0] + G[0, 1] * a[:, 1])
    np.testing.assert_allclose(
        np.asarray(n2.global_array())[:, 0],
        G[1, 0] * a[:, 0] + G[1, 1] * a[:, 1])


def test_minabs_and_norm_vectors(grid):
    """ColumnMinAbs(.Nonzero)/RowMinAbs/RowMaxNorms/TwoNorms aliases +
    RealToComplex."""
    rng = np.random.default_rng(22)
    a = rng.standard_normal((9, 7))
    a[:, 2] = 0.0
    A = DistMatrix.from_global(a, grid=grid)
    np.testing.assert_allclose(np.asarray(L1.ColumnMinAbs(A))[:7],
                               np.abs(a).min(axis=0))
    expn = [np.min(np.abs(a[:, j])[a[:, j] != 0])
            if np.any(a[:, j] != 0) else 0.0 for j in range(7)]
    np.testing.assert_allclose(np.asarray(L1.ColumnMinAbsNonzero(A))[:7],
                               expn)
    np.testing.assert_allclose(np.asarray(L1.RowMinAbs(A))[:9],
                               np.abs(a).min(axis=1))
    np.testing.assert_allclose(np.asarray(L1.RowMaxNorms(A))[:9],
                               np.abs(a).max(axis=1))
    np.testing.assert_allclose(np.asarray(L1.ColumnTwoNorms(A))[:7],
                               np.linalg.norm(a, axis=0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(L1.RowTwoNorms(A))[:9],
                               np.linalg.norm(a, axis=1), rtol=1e-12)
    assert L1.RealToComplex(A).dtype == jnp.complex128


def test_loc_reduction_family(rng, g):
    """MaxLoc/MinLoc/MinAbsLoc + Symmetric/Vector variants against numpy
    (reference: MaxLoc.cpp / MinAbsLoc.hpp semantics)."""
    a, A = _mk(rng, g, 7, 5)
    for fn, red in [(L1.MaxLoc, np.argmax), (L1.MinLoc, np.argmin)]:
        v, i, j = fn(A)
        k = red(a)
        assert (int(i), int(j)) == (k // 5, k % 5)
        np.testing.assert_allclose(float(v), a[k // 5, k % 5])
    v, i, j = L1.MinAbsLoc(A)
    k = np.argmin(np.abs(a))
    assert (int(i), int(j)) == (k // 5, k % 5)
    np.testing.assert_allclose(float(v), abs(a[k // 5, k % 5]))

    s, S = _mk(rng, g, 6, 6)
    for uplo, tri in [(LOWER, np.tril), (UPPER, np.triu)]:
        masked = np.where(tri(np.ones_like(s)) > 0, s, -np.inf)
        v, i, j = L1.SymmetricMaxLoc(uplo, S)
        k = np.argmax(masked)
        assert (int(i), int(j)) == (k // 6, k % 6)
        masked = np.where(tri(np.ones_like(s)) > 0, s, np.inf)
        v, i, j = L1.SymmetricMinLoc(uplo, S)
        k = np.argmin(masked)
        assert (int(i), int(j)) == (k // 6, k % 6)
        am = np.where(tri(np.ones_like(s)) > 0, np.abs(s), -np.inf)
        v, i, j = L1.SymmetricMaxAbsLoc(uplo, S)
        k = np.argmax(am)
        np.testing.assert_allclose(float(v), am[k // 6, k % 6])
        am = np.where(tri(np.ones_like(s)) > 0, np.abs(s), np.inf)
        v, i, j = L1.SymmetricMinAbsLoc(uplo, S)
        k = np.argmin(am)
        assert (int(i), int(j)) == (k // 6, k % 6)

    x, X = _mk(rng, g, 9, 1)
    v, i = L1.VectorMaxLoc(X)
    assert int(i) == int(np.argmax(x))
    v, i = L1.VectorMinLoc(X)
    assert int(i) == int(np.argmin(x))
    v, i = L1.VectorMinAbsLoc(X)
    assert int(i) == int(np.argmin(np.abs(x)))
    # row-vector form indexes along the width
    xr, XR = _mk(rng, g, 1, 9)
    v, i = L1.VectorMaxLoc(XR)
    assert int(i) == int(np.argmax(xr))
    # complex rejects the signed reductions
    c, C = _mk(rng, g, 4, 4, np.complex128)
    with pytest.raises(TypeError):
        L1.MaxLoc(C)
    v, i, j = L1.MinAbsLoc(C)
    k = np.argmin(np.abs(c))
    assert (int(i), int(j)) == (k // 4, k % 4)


def test_hilbert_schmidt(rng, g):
    a, A = _mk(rng, g, 6, 4, np.complex128)
    b, B = _mk(rng, g, 6, 4, np.complex128)
    np.testing.assert_allclose(complex(L1.HilbertSchmidt(A, B)),
                               np.vdot(a, b), rtol=1e-12)


def test_symmetric_2x2_inv(rng, g):
    # symmetric (non-conjugated) complex
    d = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    d[1, 1] += 3.0
    d[0, 1] = d[1, 0]
    inv = np.array(L1.Symmetric2x2Inv(LOWER, jnp.asarray(d)))
    inv[0, 1] = inv[1, 0]
    np.testing.assert_allclose(inv @ d, np.eye(2), atol=1e-12)
    # Hermitian (conjugated): build an indefinite Hermitian 2x2
    h = np.array([[0.5, 0], [0, -1.5]], np.complex128)
    h[1, 0] = 2.0 + 1.0j
    h[0, 1] = np.conj(h[1, 0])
    invh = np.array(L1.Symmetric2x2Inv(LOWER, jnp.asarray(h),
                                        conjugate=True))
    invh[0, 1] = np.conj(invh[1, 0])
    np.testing.assert_allclose(invh @ h, np.eye(2), atol=1e-12)


def test_adjoint_axpy_and_contract_variants(rng, g):
    a, A = _mk(rng, g, 5, 7, np.complex128)
    y, Y = _mk(rng, g, 7, 5, np.complex128)
    out = L1.AdjointAxpy(2.0, A, Y)
    np.testing.assert_allclose(out.replicated()[:7, :5],
                               y + 2.0 * np.conj(a.T), rtol=1e-12)

    from elementalx.blas.contract import (AdjointContract,
                                          TransposeAxpyContract,
                                          TransposeContract)
    from elementalx.core.types import MC, MR, STAR

    b, B = _mk(rng, g, 6, 8)
    Bmc = B.redistribute(MC, STAR)
    T = TransposeContract(Bmc, MC, MR)
    np.testing.assert_allclose(T.replicated()[:8, :6], b.T, rtol=1e-12)
    c, C = _mk(rng, g, 6, 8, np.complex128)
    Cmc = C.redistribute(MC, STAR)
    Ad = AdjointContract(Cmc, MC, MR)
    np.testing.assert_allclose(Ad.replicated()[:8, :6], np.conj(c.T),
                               rtol=1e-12)
    t, Tgt = _mk(rng, g, 8, 6)
    upd = TransposeAxpyContract(0.5, Bmc, Tgt)
    np.testing.assert_allclose(upd.replicated()[:8, :6], t + 0.5 * b.T,
                               rtol=1e-12)
