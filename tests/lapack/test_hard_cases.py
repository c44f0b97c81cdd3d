"""Stress tests on classically-hard matrices (built with our own
generators) — cluster handling, ill-conditioning, rank-revealing."""

import numpy as np
import scipy.linalg as sla

import elementalx as El
from elementalx import DistMatrix
from elementalx import matrices as M
from elementalx.core.types import LOWER


def test_wilkinson_clusters(grid):
    """W21: pairs of nearly-equal eigenvalues."""
    W = M.Wilkinson(10, grid)
    w, Q = El.HermitianEig(LOWER, W)
    a, q, ws = W.global_array(), Q.global_array(), np.asarray(w)
    n = a.shape[0]
    assert np.linalg.norm(a @ q - q * ws[None, :]) < 1e-12
    assert np.linalg.norm(np.eye(n) - q.T @ q) < 1e-12
    assert np.max(np.abs(ws - np.linalg.eigvalsh(a))) < 1e-12


def test_glued_wilkinson(grid):
    """Glued Wilkinson blocks: the classic MRRR torture test (clusters of
    4 eigenvalues agreeing to ~1e-8)."""
    blocks = [M.Wilkinson(5).global_array() for _ in range(4)]
    A = sla.block_diag(*blocks)
    for i in range(1, 4):
        A[i * 11 - 1, i * 11] = A[i * 11, i * 11 - 1] = 1e-8
    Ad = DistMatrix.from_global(A, grid=grid)
    w, Q = El.HermitianEig(LOWER, Ad)
    q, ws = Q.global_array(), np.asarray(w)
    n = A.shape[0]
    assert np.linalg.norm(A @ q - q * ws[None, :]) < 1e-12
    assert np.linalg.norm(np.eye(n) - q.T @ q) < 1e-12
    assert np.max(np.abs(ws - np.linalg.eigvalsh(A))) < 1e-12


def test_hilbert_ill_conditioned(grid):
    """Hilbert n=20 (cond ~ 1e28): residual must stay at machine scale."""
    H = M.Hilbert(20, grid)
    w, Q = El.HermitianEig(LOWER, H)
    h, q, ws = H.global_array(), Q.global_array(), np.asarray(w)
    assert np.linalg.norm(h @ q - q * ws[None, :]) < 1e-13
    assert np.linalg.norm(np.eye(20) - q.T @ q) < 1e-9
    # numerically non-HPD at this conditioning: the factorization must
    # raise like the reference (NonHPDMatrixException,
    # factor/Cholesky/UpperVariant3.hpp:28-30), not return NaNs silently
    import pytest

    with pytest.raises(El.NonHPDMatrixException):
        El.Cholesky(LOWER, H)


def test_kahan_rank_reveal(grid):
    """Kahan matrix: graded singular values across ~10 orders."""
    K = M.Kahan(24, 0.6, grid)
    s = np.asarray(El.SingularValues(K))
    sref = np.linalg.svd(K.global_array(), compute_uv=False)
    assert np.max(np.abs(s - sref) / np.maximum(sref, 1e-300)) < 1e-8
    # pivoted QR must reveal the grading (non-increasing |R_ii|)
    from elementalx.lapack.qr import ColPivQR

    fact, P = ColPivQR(K)
    d = np.abs(np.diag(fact.packed.global_array()))
    assert np.all(d[:-1] >= d[1:] - 1e-12)


def test_gepp_growth(grid):
    """Wilkinson's worst-case GEPP growth matrix: LU must still satisfy
    the factorization identity (growth is real but bounded at n=24)."""
    G = M.GEPPGrowth(24, grid)
    a = G.global_array()
    F, P = El.LU(G)
    f = F.global_array()
    ell = np.tril(f, -1) + np.eye(24)
    u = np.triu(f)
    pa = a[np.asarray(P.perm)[:24], :]
    assert np.linalg.norm(pa - ell @ u) / np.linalg.norm(a) < 1e-10


def _glued_wilkinson_tridiag(nblocks, glue):
    """Tridiagonal of glued W21 blocks (plarrv.c's torture family):
    eigenvalue clusters of `nblocks` values agreeing to ~glue."""
    m = 21
    dblk = np.abs(np.arange(m) - 10).astype(np.float64)
    d = np.tile(dblk, nblocks)
    e = np.concatenate([
        np.concatenate([np.ones(m - 1), [glue]])
        for _ in range(nblocks)])[:nblocks * m - 1]
    return d, e


def test_glued_wilkinson_large_clusters(grid):
    """VERDICT r3 item 6: glued-Wilkinson at n >= 4096 with 1e-14 glue —
    inverse iteration without cluster handling loses orthogonality
    exactly here. Pass bar: ortho <= ~n*eps and residual at machine
    scale."""
    from elementalx.lapack.tridiag_eig import tridiag_eig

    nblocks = 196                     # n = 4116
    d, e = _glued_wilkinson_tridiag(nblocks, 1e-14)
    n = d.shape[0]
    w, Z = tridiag_eig(d, e)
    w = np.asarray(w)
    Z = np.asarray(Z)
    eps = np.finfo(np.float64).eps
    # eigenvalues against LAPACK bisection
    import scipy.linalg as sla
    wref = sla.eigvalsh_tridiagonal(d, e)
    assert np.max(np.abs(np.sort(w) - wref)) < 1e3 * eps * np.abs(
        wref).max()
    # residual T Z - Z diag(w)
    TZ = d[:, None] * Z
    TZ[1:] += e[:, None] * Z[:-1]
    TZ[:-1] += e[:, None] * Z[1:]
    resid = np.abs(TZ - Z * w[None, :]).max() / (eps * n
                                                 * np.abs(w).max())
    assert resid < 100, f"scaled residual {resid}"
    ortho = np.abs(Z.T @ Z - np.eye(n)).max()
    assert ortho <= 32 * n * eps, f"ortho {ortho} vs bar {32 * n * eps}"


def test_tight_cluster_1e14_spacing(grid):
    """Eigenvalues spaced by ~1e-14 around 1.0 (a single giant cluster):
    the vectors must still come out orthogonal."""
    from elementalx.lapack.tridiag_eig import tridiag_eig

    n = 512
    rng = np.random.default_rng(3)
    d = 1.0 + np.arange(n) * 1e-14
    e = np.full(n - 1, 1e-15) * (1 + rng.random(n - 1))
    w, Z = tridiag_eig(d, e)
    w = np.asarray(w)
    Z = np.asarray(Z)
    eps = np.finfo(np.float64).eps
    TZ = d[:, None] * Z
    TZ[1:] += e[:, None] * Z[:-1]
    TZ[:-1] += e[:, None] * Z[1:]
    resid = np.abs(TZ - Z * w[None, :]).max() / (eps * n)
    assert resid < 100, f"scaled residual {resid}"
    ortho = np.abs(Z.T @ Z - np.eye(n)).max()
    assert ortho <= 32 * n * eps, f"ortho {ortho} vs bar {32 * n * eps}"
