"""props / funcs / ldl / lq tests."""

import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER, NON_UNIT, UPPER
from elementalx.lapack import (
    Condition,
    Determinant,
    FrobeniusNorm,
    HPDDeterminant,
    HPDInverse,
    InfinityNorm,
    Inverse,
    LDL,
    MaxNorm,
    OneNorm,
    Sign,
    SquareRoot,
    SymmetricInverse,
    TriangularInverse,
    TwoNorm,
    TwoNormEstimate,
    ZeroNorm,
)
from elementalx.lapack.ldl import Inertia, SolveAfter as LDLSolve
from elementalx.lapack.lq import LQ, ExplicitLQ, ExplicitRQ


def test_norms(grid, rng):
    a = rng.standard_normal((13, 9))
    A = DistMatrix.from_global(a, grid=grid)
    assert abs(float(FrobeniusNorm(A)) - np.linalg.norm(a)) < 1e-12
    assert abs(float(OneNorm(A)) - np.linalg.norm(a, 1)) < 1e-12
    assert abs(float(InfinityNorm(A)) - np.linalg.norm(a, np.inf)) < 1e-12
    assert abs(float(MaxNorm(A)) - np.max(np.abs(a))) < 1e-15
    assert int(ZeroNorm(A)) == np.count_nonzero(a)
    s2 = np.linalg.norm(a, 2)
    assert abs(float(TwoNorm(A)) - s2) / s2 < 1e-10
    assert abs(float(TwoNormEstimate(A)) - s2) / s2 < 1e-4


def test_determinant(grid, rng):
    n = 16
    a = rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)
    det = float(Determinant(A))
    ref = np.linalg.det(a)
    assert abs(det - ref) / abs(ref) < 1e-10
    spd = a @ a.T + n * np.eye(n)
    dd = float(HPDDeterminant(LOWER, DistMatrix.from_global(spd, grid=grid)))
    refd = np.linalg.det(spd)
    assert abs(dd - refd) / refd < 1e-10


def test_inverses(grid, rng):
    n = 16
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    Ai = Inverse(DistMatrix.from_global(a, grid=grid)).global_array()
    assert np.linalg.norm(a @ Ai - np.eye(n)) < 1e-11
    spd = a @ a.T
    Hi = HPDInverse(LOWER, DistMatrix.from_global(spd, grid=grid)).global_array()
    assert np.linalg.norm(spd @ Hi - np.eye(n)) < 1e-9
    t = np.tril(a)
    Ti = TriangularInverse(LOWER, NON_UNIT,
                           DistMatrix.from_global(t, grid=grid)).global_array()
    assert np.linalg.norm(t @ Ti - np.eye(n)) < 1e-10
    sym = a + a.T + 2 * n * np.eye(n)
    Si = SymmetricInverse(LOWER, DistMatrix.from_global(sym, grid=grid)
                          ).global_array()
    assert np.linalg.norm(sym @ Si - np.eye(n)) < 1e-9


def test_condition(grid, rng):
    n = 12
    u, _ = np.linalg.qr(rng.standard_normal((n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -4, n)
    a = (u * s) @ v.T
    A = DistMatrix.from_global(a, grid=grid)
    k2 = float(Condition(A, "two"))
    assert abs(k2 - 1e4) / 1e4 < 1e-6


def test_sign(grid, rng):
    n = 10
    # matrix with eigenvalues on both sides of the imaginary axis
    a = rng.standard_normal((n, n)) + np.diag(
        np.concatenate([np.full(5, 4.0), np.full(5, -4.0)]))
    S = Sign(DistMatrix.from_global(a, grid=grid)).global_array()
    assert np.linalg.norm(S @ S - np.eye(n)) < 1e-8
    assert np.linalg.norm(a @ S - S @ a) / np.linalg.norm(a) < 1e-8


def test_square_root(grid, rng):
    n = 12
    a = rng.standard_normal((n, n))
    spd = a @ a.T + n * np.eye(n)
    R = SquareRoot(DistMatrix.from_global(spd, grid=grid)).global_array()
    assert np.linalg.norm(R @ R - spd) / np.linalg.norm(spd) < 1e-9


def test_ldl(grid, rng):
    n = 14
    a = rng.standard_normal((n, n))
    sym = a + a.T + 2 * n * np.eye(n)  # strongly diagonally dominant
    A = DistMatrix.from_global(sym, grid=grid)
    F = LDL(A, conjugate=True, blocksize=4)
    f = F.global_array()
    ell = np.tril(f, -1) + np.eye(n)
    d = np.diag(f).real
    assert np.linalg.norm(ell @ np.diag(d) @ ell.T - sym) / \
        np.linalg.norm(sym) < 1e-12
    b = rng.standard_normal((n, 3))
    X = LDLSolve(F, DistMatrix.from_global(b, grid=grid)).global_array()
    assert np.linalg.norm(sym @ X - b) / np.linalg.norm(b) < 1e-11
    pos, neg, zero = Inertia(A)
    assert (int(pos), int(neg), int(zero)) == (n, 0, 0)


def test_inertia_indefinite(grid, rng):
    n = 8
    d = np.array([3.0, 2.0, 1.0, 0.5, -1.0, -2.0, -0.5, 4.0])
    u, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = (u * d) @ u.T
    pos, neg, zero = Inertia(DistMatrix.from_global(a, grid=grid))
    # unpivoted LDL on an indefinite (but factorable) matrix
    assert int(pos) + int(neg) + int(zero) == n


def test_lq_rq(grid, rng):
    m, n = 10, 16
    a = rng.standard_normal((m, n))
    L, Q = ExplicitLQ(DistMatrix.from_global(a, grid=grid), blocksize=4)
    ell, q = L.global_array(), Q.global_array()
    k = min(m, n)
    assert np.linalg.norm(np.eye(k) - q @ q.T) < 1e-12  # orthonormal rows
    assert np.linalg.norm(ell @ q - a) / np.linalg.norm(a) < 1e-12
    assert np.allclose(ell[:, :k], np.tril(ell[:, :k]))
    R, Q2 = ExplicitRQ(DistMatrix.from_global(a, grid=grid), blocksize=4)
    r, q2 = R.global_array(), Q2.global_array()
    assert np.linalg.norm(r @ q2 - a) / np.linalg.norm(a) < 1e-12
    assert np.linalg.norm(np.eye(m) - q2 @ q2.T) < 1e-12
    assert np.allclose(r, np.triu(r))


def test_pseudoinverse(grid, rng):
    m, n = 14, 8
    a = rng.standard_normal((m, n))
    from elementalx.lapack import Pseudoinverse

    P = Pseudoinverse(DistMatrix.from_global(a, grid=grid)).global_array()
    ref = np.linalg.pinv(a)
    assert np.linalg.norm(P - ref) / np.linalg.norm(ref) < 1e-10


def test_norm_dispatcher(grid):
    """reference: props.hpp:128-146 Norm/SymmetricNorm/HermitianNorm
    with a NormType argument."""
    import numpy.linalg as la
    from elementalx.lapack import HermitianNorm, Norm, SymmetricNorm

    rng = np.random.default_rng(11)
    a = rng.standard_normal((9, 7))
    A = DistMatrix.from_global(a, grid=grid)
    for k, ref in [("one", la.norm(a, 1)), ("infinity", la.norm(a, np.inf)),
                   ("max", np.abs(a).max()), ("frobenius", la.norm(a)),
                   ("two", la.norm(a, 2)), ("nuclear", la.norm(a, "nuc")),
                   ("entrywise_one", np.abs(a).sum())]:
        assert abs(float(Norm(A, k)) - ref) < 1e-10 * max(ref, 1), k
    s = a[:7, :7] + a[:7, :7].T
    S = DistMatrix.from_global(np.tril(s), grid=grid)
    assert abs(float(SymmetricNorm(LOWER, S, "frobenius"))
               - la.norm(s)) < 1e-10 * la.norm(s)
    assert abs(float(HermitianNorm(LOWER, S, "max"))
               - np.abs(s).max()) < 1e-10
    with pytest.raises(ValueError):
        Norm(A, "bogus")


def test_hermitian_norm_variants(grid):
    """props.hpp named Hermitian/Symmetric norm family."""
    import numpy.linalg as la
    L = El.lapack
    rng = np.random.default_rng(31)
    n = 16
    a = rng.standard_normal((n, n))
    s = a + a.T
    S = DistMatrix.from_global(np.tril(s), grid=grid)
    w = la.eigvalsh(s)
    assert abs(float(L.HermitianFrobeniusNorm(LOWER, S))
               - la.norm(s)) < 1e-10
    assert abs(float(L.HermitianMaxNorm(LOWER, S))
               - np.abs(s).max()) < 1e-12
    assert abs(float(L.HermitianTwoNorm(LOWER, S)) - la.norm(s, 2)) < 1e-8
    assert abs(float(L.HermitianNuclearNorm(LOWER, S))
               - np.abs(w).sum()) < 1e-7
    assert abs(float(L.SymmetricKyFanNorm(LOWER, S, 3))
               - np.sort(np.abs(w))[::-1][:3].sum()) < 1e-8
    assert abs(float(L.SymmetricFrobeniusNorm(LOWER, S))
               - la.norm(s)) < 1e-10


def test_hermitian_sign_pinv_hpsd_cholesky(grid):
    """funcs.cpp HermitianSign / HermitianPseudoinverse and
    factor/Cholesky.cpp HPSDCholesky on a rank-deficient PSD matrix."""
    import numpy.linalg as la
    L = El.lapack
    rng = np.random.default_rng(33)
    n = 16
    a = rng.standard_normal((n, n))
    s = a + a.T
    S = DistMatrix.from_global(np.tril(s), grid=grid)
    V, W = la.eigh(s)
    sg = np.asarray(L.HermitianSign(LOWER, S).global_array())
    assert la.norm(np.tril(sg) - np.tril((W * np.sign(V)) @ W.T)) < 1e-9
    _, N = L.HermitianSign(LOWER, S, want_n=True)
    assert la.norm(np.tril(np.asarray(N.global_array()))
                   - np.tril((W * np.abs(V)) @ W.T)) < 1e-9
    b = rng.standard_normal((n, 5))
    psd = b @ b.T  # rank 5
    P = DistMatrix.from_global(np.tril(psd), grid=grid)
    pin = np.asarray(L.HermitianPseudoinverse(LOWER, P).global_array())
    assert la.norm(np.tril(pin) - np.tril(la.pinv(psd))) < 1e-8
    for uplo, make in [(UPPER, np.triu), (LOWER, np.tril)]:
        F = np.asarray(L.HPSDCholesky(
            uplo, DistMatrix.from_global(make(psd), grid=grid)
        ).global_array())
        rec = F.T @ F if uplo == UPPER else F @ F.T
        assert la.norm(rec - psd) / la.norm(psd) < 1e-10
