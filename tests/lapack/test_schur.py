"""Schur / Eig / TriangEig / Pseudospectra / secular tests."""

import numpy as np
import pytest

import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.lapack.schur import Eig, Schur, TriangEig
from elementalx.lapack.pseudospectra import Pseudospectra
from elementalx.lapack.secular import SecularEVD


def _greedy_eig_match(wref, w):
    used = np.zeros(len(wref), bool)
    worst = 0.0
    for wi in w:
        dist = np.abs(wref - wi)
        dist[used] = np.inf
        k = np.argmin(dist)
        used[k] = True
        worst = max(worst, dist[k])
    return worst


@pytest.mark.parametrize("complex_", [False, True], ids=["real", "cplx"])
def test_schur_qr(grid, rng, complex_):
    n = 24
    a = rng.standard_normal((n, n))
    if complex_:
        a = a + 1j * rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)
    dec = Schur(A, form="complex")
    T = dec.T.global_array()
    Z = dec.Z.global_array()
    assert np.allclose(T, np.triu(T))
    assert np.linalg.norm(np.eye(n) - Z.conj().T @ Z) < 1e-12
    recon = Z @ T @ Z.conj().T
    assert np.linalg.norm(recon - a) / np.linalg.norm(a) < 1e-12
    # greedy matching (sort_complex mispairs conjugate eigenvalues whose
    # real parts differ only in the last ulp)
    wref = np.linalg.eigvals(a)
    worst = _greedy_eig_match(wref, np.asarray(dec.w))
    assert worst / np.max(np.abs(wref)) < 1e-10


def test_schur_real_form(grid, rng):
    """Real input defaults to the REAL quasi-triangular Schur form
    (reference: spectral/HessenbergSchur/ real path): T real with
    standardized 1x1/2x2 blocks, Z real orthogonal, A = Z T Z^T."""
    from elementalx.lapack.schur import QuasiSchurDecomposition

    n = 48
    a = rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)
    dec = Schur(A)
    assert isinstance(dec, QuasiSchurDecomposition)
    T = dec.T.global_array()
    Z = dec.Z.global_array()
    assert not np.iscomplexobj(T) and not np.iscomplexobj(Z)
    # quasi-triangular: zero below the first subdiagonal; no two adjacent
    # subdiagonal nonzeros; 2x2 blocks standardized
    assert np.abs(np.tril(T, -2)).max() < 1e-12
    sub = np.abs(np.diag(T, -1)) > 0
    assert not np.any(sub[:-1] & sub[1:])
    k = 0
    while k < n - 1:
        if T[k + 1, k] != 0:
            assert abs(T[k, k] - T[k + 1, k + 1]) < 1e-5 * max(
                1, abs(T[k, k]))
            assert T[k, k + 1] * T[k + 1, k] < 0
            k += 2
        else:
            k += 1
    assert np.linalg.norm(np.eye(n) - Z.T @ Z) < 1e-12
    assert np.linalg.norm(Z @ T @ Z.T - a) / np.linalg.norm(a) < 1e-12
    wref = np.linalg.eigvals(a)
    worst = _greedy_eig_match(wref, dec.w)
    assert worst / np.max(np.abs(wref)) < 1e-8


def test_quasi_triang_eig(grid, rng):
    """Eigenvectors from the real quasi form (reference:
    spectral/QuasiTriangEig.cpp)."""
    from elementalx.lapack.schur import QuasiTriangEig

    n = 32
    a = rng.standard_normal((n, n))
    dec = Schur(DistMatrix.from_global(a, grid=grid))
    T = dec.T.global_array()
    X = QuasiTriangEig(dec.T).global_array()
    lam = dec.w
    for j in range(n):
        r = T @ X[:, j] - lam[j] * X[:, j]
        assert np.linalg.norm(r) < 1e-8, (j, np.linalg.norm(r))
    # split form returns real planes
    XR, XI = QuasiTriangEig(dec.T, split=True)
    np.testing.assert_allclose(XR.global_array() + 1j * XI.global_array(),
                               X, atol=1e-12)


def test_eig_real_via_quasi(grid, rng):
    n = 20
    a = rng.standard_normal((n, n))
    w, X = El.lapack.Eig(DistMatrix.from_global(a, grid=grid))
    w, x = np.asarray(w), X.global_array()
    res = np.linalg.norm(a @ x - x * w[None, :]) / np.linalg.norm(a)
    assert res < 1e-8, f"eigpair residual {res}"


def test_eig_general(grid, rng):
    n = 16
    a = rng.standard_normal((n, n))
    w, X = Eig(DistMatrix.from_global(a, grid=grid))
    w, x = np.asarray(w), X.global_array()
    res = np.linalg.norm(a @ x - x * w[None, :]) / np.linalg.norm(a)
    assert res < 1e-10, f"eigpair residual {res}"


def test_triang_eig(grid, rng):
    n = 12
    t = np.triu(rng.standard_normal((n, n)))
    np.fill_diagonal(t, np.arange(1, n + 1, dtype=float))  # separated eigs
    X = TriangEig(DistMatrix.from_global(t, grid=grid)).global_array()
    for j in range(n):
        r = t @ X[:, j] - t[j, j] * X[:, j]
        assert np.linalg.norm(r) < 1e-10


def test_pseudospectra(grid, rng):
    n = 12
    a = np.diag(np.arange(1.0, n + 1))  # eigenvalues 1..n
    port = Pseudospectra(DistMatrix.from_global(a, grid=grid),
                         (0.0, 4.0), (-1.0, 1.0), real_size=9, imag_size=5,
                         iters=30)
    smin = np.asarray(port.sigma_min_map)
    re = np.asarray(port.real_grid)
    im = np.asarray(port.imag_grid)
    # at z = 1.0 + 0i (an eigenvalue) sigma_min ~ 0; at z = 0, sigma_min ~ 1
    i0 = np.argmin(np.abs(im - 0.0))
    j1 = np.argmin(np.abs(re - 1.0))
    j0 = np.argmin(np.abs(re - 0.0))
    assert smin[i0, j1] < 1e-8
    assert abs(smin[i0, j0] - 1.0) < 1e-6


def test_secular_evd(rng):
    n = 10
    d = np.sort(rng.standard_normal(n))
    z = rng.standard_normal(n)
    z /= np.linalg.norm(z)
    rho = 0.8
    lam, V = SecularEVD(jnp.asarray(d), jnp.asarray(z), rho)
    lam, V = np.asarray(lam), np.asarray(V)
    A = np.diag(d) + rho * np.outer(z, z)
    wref = np.linalg.eigvalsh(A)
    assert np.max(np.abs(np.sort(lam) - wref)) < 1e-12
    res = np.linalg.norm(A @ V - V * lam[None, :])
    assert res < 1e-10


def test_schur_swap_and_reorder(grid, rng):
    from elementalx.lapack.schur import ReorderSchur, SchurSwap

    n = 10
    a = rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)
    dec = Schur(A, form="complex")
    w0 = np.asarray(dec.w).copy()
    # swap positions 2, 3
    dec2 = SchurSwap(dec, 2)
    T2, Z2 = dec2.T.global_array(), dec2.Z.global_array()
    assert np.allclose(T2, np.triu(T2))
    assert abs(T2[2, 2] - w0[3]) < 1e-10 and abs(T2[3, 3] - w0[2]) < 1e-10
    rec = Z2 @ T2 @ Z2.conj().T
    assert np.linalg.norm(rec - a) / np.linalg.norm(a) < 1e-11
    # reorder: bring the 3 largest-|.| eigenvalues to the top
    sel = np.abs(w0) >= np.sort(np.abs(w0))[-3]
    dec3 = ReorderSchur(dec, sel)
    T3, Z3 = dec3.T.global_array(), dec3.Z.global_array()
    picked = np.sort(np.abs(np.diag(T3)[:3]))
    want = np.sort(np.abs(w0[sel]))[:3]
    np.testing.assert_allclose(picked, want, atol=1e-9)
    rec3 = Z3 @ T3 @ Z3.conj().T
    assert np.linalg.norm(rec3 - a) / np.linalg.norm(a) < 1e-10
    assert np.linalg.norm(np.eye(n) - Z3.conj().T @ Z3) < 1e-11


def test_pseudospectra_lanczos(grid, rng):
    """Inverse-Lanczos kernel (reference: Pseudospectra/Lanczos.hpp)."""
    n = 12
    a = np.diag(np.arange(1.0, n + 1))
    port = Pseudospectra(DistMatrix.from_global(a, grid=grid),
                         (0.0, 4.0), (-1.0, 1.0), real_size=9, imag_size=5,
                         iters=12, alg="lanczos")
    smin = np.asarray(port.sigma_min_map)
    re = np.asarray(port.real_grid)
    im = np.asarray(port.imag_grid)
    i0 = np.argmin(np.abs(im - 0.0))
    j0 = np.argmin(np.abs(re - 0.0))
    # sigma_min(A - 0 I) = 1 exactly for this diagonal test matrix
    assert abs(smin[i0, j0] - 1.0) < 1e-6
    # near an eigenvalue the resolvent blows up
    j1 = np.argmin(np.abs(re - 1.0))
    assert smin[i0, j1] < 1e-6


def test_pseudospectra_ira(grid, rng):
    """Implicitly restarted Arnoldi kernel (reference:
    Pseudospectra/IRA.hpp)."""
    n = 12
    a = np.diag(np.arange(1.0, n + 1))
    port = Pseudospectra(DistMatrix.from_global(a, grid=grid),
                         (0.0, 4.0), (-1.0, 1.0), real_size=9, imag_size=5,
                         iters=12, alg="ira")
    smin = np.asarray(port.sigma_min_map)
    re = np.asarray(port.real_grid)
    im = np.asarray(port.imag_grid)
    i0 = np.argmin(np.abs(im - 0.0))
    j0 = np.argmin(np.abs(re - 0.0))
    j1 = np.argmin(np.abs(re - 1.0))
    assert abs(smin[i0, j0] - 1.0) < 1e-6
    assert smin[i0, j1] < 1e-6


def test_pseudospectra_one_norm(grid, rng):
    """Hager-Higham one-norm estimator (reference:
    Pseudospectra/HagerHigham.hpp): on an upper-triangular test matrix
    the estimate must match the exact one norm of the inverse."""
    from elementalx.lapack.pseudospectra import OneNormPseudospectra

    n = 10
    t = np.triu(rng.standard_normal((n, n)))
    np.fill_diagonal(t, np.arange(2.0, n + 2))
    port = OneNormPseudospectra(DistMatrix.from_global(t, grid=grid),
                                (-0.5, 0.5), (-0.5, 0.5),
                                real_size=3, imag_size=3, iters=10)
    est = np.asarray(port.inv_norm_map)
    re = np.asarray(port.real_grid)
    im = np.asarray(port.imag_grid)
    for ii, zi in enumerate(im):
        for jj, zr in enumerate(re):
            z = zr + 1j * zi
            exact = np.linalg.norm(
                np.linalg.inv(t - z * np.eye(n)), 1)
            # Hager's estimator is a lower bound, almost always tight
            assert est[ii, jj] <= exact * (1 + 1e-10)
            assert est[ii, jj] >= 0.3 * exact


def test_multibulge_sweep(rng):
    """Small-bulge multishift sweep with accumulated level-3 updates
    (reference: spectral/HessenbergSchur's multibulge tree): one sweep
    must be an exact unitary similarity that preserves Hessenberg form,
    for full windows, sub-windows, and split accumulation passes."""
    from elementalx.lapack.schur import _multibulge_sweep

    for n, ns, extra in [(40, 8, 8), (120, 16, 24)]:
        H0 = np.triu(rng.standard_normal((n, n))
                     + 1j * rng.standard_normal((n, n)), -1)
        T = H0.copy()
        Z = np.eye(n, dtype=complex)
        shifts = rng.standard_normal(ns) + 1j * rng.standard_normal(ns)
        _multibulge_sweep(T, Z, 0, n, shifts, True, accum_extra=extra)
        assert np.linalg.norm(Z @ T @ Z.conj().T - H0) \
            / np.linalg.norm(H0) < 1e-13
        assert np.linalg.norm(Z.conj().T @ Z - np.eye(n)) < 1e-13
        assert np.max(np.abs(np.tril(T, -2))) < 1e-10
    # sub-window with deflated boundaries
    n = 80
    H0 = np.triu(rng.standard_normal((n, n))
                 + 1j * rng.standard_normal((n, n)), -1)
    H0[15, 14] = 0.0
    H0[65, 64] = 0.0
    T = H0.copy()
    Z = np.eye(n, dtype=complex)
    shifts = rng.standard_normal(12) + 1j * rng.standard_normal(12)
    _multibulge_sweep(T, Z, 15, 65, shifts, True, accum_extra=12)
    assert np.linalg.norm(Z @ T @ Z.conj().T - H0) / np.linalg.norm(H0) < 1e-13
    assert np.max(np.abs(np.tril(T, -2))) < 1e-10


def test_native_hess_qr(rng):
    """Native serial Hessenberg QR kernel (zlahqr role) used for the
    Schur driver's AED window solves."""
    from elementalx import native as natmod

    if not natmod.available():
        import pytest

        pytest.skip("native library unavailable")
    n = 96
    H = np.triu(rng.standard_normal((n, n))
                + 1j * rng.standard_normal((n, n)), -1)
    T, Z = natmod.hess_qr_native(H, True)
    assert np.linalg.norm(Z @ T @ Z.conj().T - H) / np.linalg.norm(H) < 1e-12
    assert np.linalg.norm(Z.conj().T @ Z - np.eye(n)) < 1e-12
    assert np.allclose(T, np.triu(T))
    wref = np.sort(np.linalg.eigvals(H))
    wgot = np.sort(np.diag(T))
    assert np.max(np.abs(np.sort_complex(wref) - np.sort_complex(wgot))) \
        / np.max(np.abs(wref)) < 1e-8


def test_spectral_driver_family(grid, rng):
    """The reference's public portrait census (spectral.hpp:1530-1660):
    SpectralPortrait/Window/Cloud + Triangular/QuasiTriangular/
    Hessenberg forms, cross-checked against the SVD sigma_min oracle."""
    from elementalx.lapack import (HessenbergSpectralCloud,
                                   QuasiTriangularSpectralCloud,
                                   QuasiTriangularSpectralPortrait,
                                   SpectralCloud, SpectralPortrait,
                                   SpectralWindow)

    n = 18
    a = rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)
    shifts = np.asarray([0.4 + 0.3j, -0.9 + 0.1j])
    ref = np.asarray([np.linalg.svd(a - z * np.eye(n),
                                    compute_uv=False)[-1] for z in shifts])

    cloud = SpectralCloud(A, shifts, iters=60)
    assert np.allclose(np.asarray(cloud.sigma_min), ref, rtol=1e-8)

    dec = Schur(A)  # real quasi-triangular form
    qc = QuasiTriangularSpectralCloud(dec.T, shifts, iters=60)
    assert np.allclose(np.asarray(qc.sigma_min), ref, rtol=1e-8)

    # Hessenberg form of the same matrix has the same resolvent norms
    from elementalx.core.types import UPPER
    from elementalx.lapack import Hessenberg

    hf = Hessenberg(UPPER, A)
    h = np.triu(np.asarray(hf[0].global_array()
                           if isinstance(hf, tuple)
                           else hf.packed.global_array()), -1)
    hc = HessenbergSpectralCloud(DistMatrix.from_global(h, grid=grid),
                                 shifts, iters=60)
    assert np.allclose(np.asarray(hc.sigma_min), ref, rtol=1e-8)

    # auto-box portraits cover the spectrum
    w = np.linalg.eigvals(a)
    p = SpectralPortrait(A, real_size=6, imag_size=6, iters=10)
    assert float(p.real_grid[0]) <= w.real.min() <= w.real.max() \
        <= float(p.real_grid[-1])
    assert float(p.imag_grid[0]) <= w.imag.min() <= w.imag.max() \
        <= float(p.imag_grid[-1])
    pq = QuasiTriangularSpectralPortrait(dec.T, real_size=5, imag_size=5,
                                         iters=10)
    assert float(pq.real_grid[0]) <= w.real.min()
    pw = SpectralWindow(A, 0.5 + 0.0j, 2.0, 2.0, real_size=5, imag_size=5,
                        iters=10)
    assert np.asarray(pw.inv_norm_map).shape == (5, 5)


def test_check_real_schur_and_real_to_complex(grid, rng):
    """schur::CheckRealSchur + schur::RealToComplex (Schur/CheckReal.hpp
    + Schur/RealToComplex.hpp): standard-form validation passes on our
    real Schur output, and the analytic 2x2 unitaries produce a complex
    triangular factor preserving the similarity."""
    from elementalx.lapack.schur_real import (CheckRealSchur,
                                              SchurRealToComplex)

    n = 24
    a = rng.standard_normal((n, n))
    dec = Schur(DistMatrix.from_global(a, grid=grid))
    CheckRealSchur(dec.T, standard_form=True)  # must not raise
    T, Z = SchurRealToComplex(dec.T, dec.Z)
    Th = np.asarray(T.global_array())
    Zh = np.asarray(Z.global_array())
    assert np.abs(np.tril(Th, -1)).max() < 1e-10
    rec = Zh @ Th @ Zh.conj().T
    assert np.linalg.norm(rec - a) / np.linalg.norm(a) < 1e-10
    assert np.linalg.norm(Zh.conj().T @ Zh - np.eye(n)) < 1e-10
    w = np.sort_complex(np.linalg.eigvals(a))
    assert np.allclose(w, np.sort_complex(np.diagonal(Th)), atol=1e-7)
    bad = np.triu(np.ones((5, 5)))
    bad[1, 0] = bad[2, 1] = 1.0
    with pytest.raises(ValueError):
        CheckRealSchur(bad)


def test_hessenberg_schur_public_entry(grid, rng):
    """spectral/HessenbergSchur.hpp public entry: already-Hessenberg
    input, real quasi and complex forms."""
    from elementalx.lapack import HessenbergEig, HessenbergSchur

    n = 20
    h = np.triu(rng.standard_normal((n, n)), -1)
    H = DistMatrix.from_global(h, grid=grid)
    dec = HessenbergSchur(H)
    T = np.asarray(dec.T.global_array())
    Z = np.asarray(dec.Z.global_array())
    assert np.linalg.norm(Z @ T @ Z.T - h) / np.linalg.norm(h) < 1e-10
    w = np.sort_complex(np.asarray(HessenbergEig(H)))
    assert np.allclose(w, np.sort_complex(np.linalg.eigvals(h)),
                       atol=1e-8)
    decc = HessenbergSchur(H, form="complex")
    Tc = np.asarray(decc.T.global_array())
    Zc = np.asarray(decc.Z.global_array())
    assert np.linalg.norm(Zc @ Tc @ Zc.conj().T - h) \
        / np.linalg.norm(h) < 1e-10
