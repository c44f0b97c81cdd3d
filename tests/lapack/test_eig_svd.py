"""HermitianEig / SVD tests (reference: tests/lapack_like/HermitianEig.cpp,
SVD.cpp: eigenvalue match, residual ||A Q - Q diag(w)||, orthogonality)."""

import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER, UPPER
from elementalx.lapack.hermitian_eig import (
    HermitianEig,
    HermitianGenDefEig,
    SkewHermitianEig,
)
from elementalx.lapack.svd import SVD, HermitianSVD, SingularValues


@pytest.mark.parametrize("n", [16, 32])
@pytest.mark.parametrize("complex_", [False, True], ids=["real", "cplx"])
def test_hermitian_eig(grid, rng, n, complex_):
    a = rng.standard_normal((n, n))
    if complex_:
        a = a + 1j * rng.standard_normal((n, n))
    a = a + a.conj().T
    A = DistMatrix.from_global(a, grid=grid)
    w, Q = HermitianEig(LOWER, A, ctrl=None)
    w = np.asarray(w)
    q = Q.global_array()
    wref = np.linalg.eigvalsh(a)
    assert np.max(np.abs(w - wref)) / np.max(np.abs(wref)) < 1e-12
    resid = np.linalg.norm(a @ q - q * w[None, :]) / np.linalg.norm(a)
    orth = np.linalg.norm(np.eye(n) - q.conj().T @ q)
    assert resid < 1e-12, f"eigpair residual {resid}"
    assert orth < 1e-12, f"orthogonality {orth}"


def test_hermitian_eig_values_only(grid, rng):
    n = 20
    a = rng.standard_normal((n, n))
    a = a + a.T
    w = HermitianEig(UPPER, DistMatrix.from_global(a, grid=grid),
                     vectors=False)
    wref = np.linalg.eigvalsh(a)
    assert np.max(np.abs(np.asarray(w) - wref)) < 1e-11


def test_skew_hermitian_eig(grid, rng):
    n = 12
    g = rng.standard_normal((n, n))
    g = g - g.T  # real skew-symmetric
    w, Q = SkewHermitianEig(LOWER, DistMatrix.from_global(g, grid=grid))
    # eigenvalues of i*G are real; eigenvalues of G are -i*w
    ev = np.sort_complex(-1j * np.asarray(w))
    evref = np.sort_complex(np.linalg.eigvals(g))
    assert np.max(np.abs(np.sort(ev.imag) - np.sort(evref.imag))) < 1e-11


def test_gen_def_eig(grid, rng):
    n = 14
    a = rng.standard_normal((n, n))
    a = a + a.T
    b = rng.standard_normal((n, n))
    b = b @ b.T + n * np.eye(n)
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    w, X = HermitianGenDefEig(LOWER, A, B)
    w, x = np.asarray(w), X.global_array()
    import scipy.linalg as sla

    wref = sla.eigh(a, b, eigvals_only=True)
    assert np.max(np.abs(w - wref)) / max(np.max(np.abs(wref)), 1) < 1e-11
    resid = np.linalg.norm(a @ x - b @ (x * w[None, :])) / np.linalg.norm(a)
    assert resid < 1e-10


@pytest.mark.parametrize("shape", [(20, 20), (36, 12)],
                         ids=["square", "tall"])
@pytest.mark.parametrize("complex_", [False, True], ids=["real", "cplx"])
def test_svd_qdwh(grid, rng, shape, complex_):
    m, n = shape
    a = rng.standard_normal((m, n))
    if complex_:
        a = a + 1j * rng.standard_normal((m, n))
    A = DistMatrix.from_global(a, grid=grid)
    U, s, V = SVD(A, nb=8)
    u, vv, s = U.global_array(), V.global_array(), np.asarray(s)
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.max(np.abs(s - sref)) / sref[0] < 1e-12
    k = min(m, n)
    recon = (u[:, :k] * s[None, :k]) @ vv[:, :k].conj().T
    assert np.linalg.norm(recon - a) / np.linalg.norm(a) < 1e-12
    assert np.linalg.norm(np.eye(k) - u[:, :k].conj().T @ u[:, :k]) < 1e-11
    assert np.linalg.norm(np.eye(k) - vv[:, :k].conj().T @ vv[:, :k]) < 1e-11


def test_svd_wide(grid, rng):
    m, n = 10, 26
    a = rng.standard_normal((m, n))
    U, s, V = SVD(DistMatrix.from_global(a, grid=grid), nb=8)
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.max(np.abs(np.asarray(s) - sref)) / sref[0] < 1e-12
    recon = (U.global_array() * np.asarray(s)[None, :]) @ \
        V.global_array().conj().T
    assert np.linalg.norm(recon - a) / np.linalg.norm(a) < 1e-11


def test_singular_values_rank_deficient(grid, rng):
    m, n = 18, 18
    u, _ = np.linalg.qr(rng.standard_normal((m, m)))
    s = np.zeros(n)
    s[: n // 2] = np.logspace(0, -6, n // 2)
    a = (u * s) @ u.T
    sv = np.asarray(SingularValues(DistMatrix.from_global(a, grid=grid)))
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.max(np.abs(sv - sref)) < 1e-10


def test_hermitian_svd(grid, rng):
    n = 16
    a = rng.standard_normal((n, n))
    a = a + a.T
    U, s, V = HermitianSVD(LOWER, DistMatrix.from_global(a, grid=grid))
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.max(np.abs(np.asarray(s) - sref)) / sref[0] < 1e-11
    recon = (U.global_array() * np.asarray(s)[None, :]) @ \
        V.global_array().conj().T
    assert np.linalg.norm(recon - a) / np.linalg.norm(a) < 1e-11


def test_svd_gkl(grid, rng):
    m, n = 24, 10
    a = rng.standard_normal((m, n))
    U, s, V = SVD(DistMatrix.from_global(a, grid=grid), alg="gkl")
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.max(np.abs(np.asarray(s) - sref)) / sref[0] < 1e-10
    recon = (U.global_array() * np.asarray(s)[None, :]) @ \
        V.global_array().conj().T
    assert np.linalg.norm(recon - a) / np.linalg.norm(a) < 1e-9


def test_hermitian_eig_sdc(grid, rng):
    """QDWH sign-based spectral divide-and-conquer path."""
    from elementalx.lapack.hermitian_eig import HermitianEigSDC

    n = 48
    a = rng.standard_normal((n, n))
    a = a + a.T
    w, Q = HermitianEigSDC(LOWER, DistMatrix.from_global(a, grid=grid),
                           cutoff=16)
    w, q = np.asarray(w), Q.global_array()
    wref = np.linalg.eigvalsh(a)
    assert np.max(np.abs(w - wref)) / np.max(np.abs(wref)) < 1e-11
    assert np.linalg.norm(a @ q - q * w[None, :]) / np.linalg.norm(a) < 1e-11


def test_hermitian_eig_subset(grid, rng):
    from elementalx.lapack.hermitian_eig import HermitianEigSubset

    n = 20
    a = rng.standard_normal((n, n))
    a = a + a.T
    w, Q = HermitianEigSubset(LOWER, DistMatrix.from_global(a, grid=grid),
                              5, 9)
    wref = np.linalg.eigvalsh(a)[5:10]
    assert np.max(np.abs(np.asarray(w) - wref)) < 1e-11
    q = Q.global_array()
    assert np.linalg.norm(a @ q - q * np.asarray(w)[None, :]) < 1e-10


def test_gqr_grq(grid, rng):
    from elementalx.lapack.gqr import GQR, GRQ

    A = DistMatrix.from_global(rng.standard_normal((12, 8)), grid=grid)
    B = DistMatrix.from_global(rng.standard_normal((12, 10)), grid=grid)
    Q, R, T, Z = GQR(A, B)
    assert np.linalg.norm(Q.global_array() @ R.global_array()
                          - A.global_array()) < 1e-11
    assert np.linalg.norm(Q.global_array() @ T.global_array()
                          @ Z.global_array() - B.global_array()) < 1e-11
    A2 = DistMatrix.from_global(rng.standard_normal((8, 12)), grid=grid)
    B2 = DistMatrix.from_global(rng.standard_normal((10, 12)), grid=grid)
    R2, Q2, Z2, T2 = GRQ(A2, B2)
    assert np.linalg.norm(R2.global_array() @ Q2.global_array()
                          - A2.global_array()) < 1e-11
    assert np.linalg.norm(Z2.global_array() @ T2.global_array()
                          @ Q2.global_array() - B2.global_array()) < 1e-11


def test_tridiag_dc(rng):
    """Cuppen D&C with pole-relative secular roots and Gu-Eisenstat
    reconstruction (the reference's DCCtrl/SecularEVD path)."""
    import jax.numpy as jnp

    from elementalx.lapack.tridiag_dc import tridiag_eig_dc

    for n, kind in ((150, "random"), (120, "clustered")):
        d = rng.standard_normal(n)
        e = rng.standard_normal(n - 1)
        if kind == "clustered":
            d = np.repeat(rng.standard_normal(n // 4), 4)[:n]
            e = np.full(n - 1, 1e-7)
            e[::5] = rng.standard_normal(len(e[::5]))
        T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
        w, Z = tridiag_eig_dc(d, e)
        wref = np.linalg.eigvalsh(T)
        assert np.max(np.abs(np.sort(w) - wref)) < 1e-12
        assert np.linalg.norm(np.eye(n) - Z.T @ Z) < 1e-12
        nrm = np.linalg.norm(T)
        assert np.linalg.norm(T @ Z - Z * w[None, :]) / nrm < 1e-7


def test_gen_def_eig_pencils(grid, rng):
    """ABX and BAX pencil types (reference: HermitianGenDefEig Pencil)."""
    import scipy.linalg as sla

    n = 12
    a = rng.standard_normal((n, n))
    a = a + a.T
    b = rng.standard_normal((n, n))
    b = b @ b.T + n * np.eye(n)
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    for pencil, stype in (("ABX", 2), ("BAX", 3)):
        w, X = HermitianGenDefEig(LOWER, A, B, pencil=pencil)
        w, x = np.asarray(w), X.global_array()
        wref = sla.eigh(a, b, type=stype, eigvals_only=True)
        assert np.max(np.abs(w - wref)) / max(np.max(np.abs(wref)), 1) < 1e-10
        if pencil == "ABX":
            res = np.linalg.norm(a @ (b @ x) - x * w[None, :])
        else:
            res = np.linalg.norm(b @ (a @ x) - x * w[None, :])
        assert res / np.linalg.norm(a) < 1e-9


def test_value_range_subset(grid, rng):
    from elementalx.lapack.hermitian_eig import HermitianEigValueSubset

    n = 16
    a = rng.standard_normal((n, n))
    a = a + a.T
    wall = np.linalg.eigvalsh(a)
    vl, vu = wall[4] - 1e-9, wall[9] + 1e-9
    w, Q = HermitianEigValueSubset(LOWER, DistMatrix.from_global(a, grid=grid),
                                   vl, vu)
    assert np.asarray(w).shape[0] == 6
    np.testing.assert_allclose(np.asarray(w), wall[4:10], atol=1e-11)
    q = Q.global_array()
    assert np.linalg.norm(a @ q - q * np.asarray(w)[None, :]) < 1e-10
