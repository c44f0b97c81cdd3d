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
