"""Device-side divide-and-conquer eigensolver / bidiagonal SVD tests
(reference: spectral/BidiagSVD DCCtrl path, SecularEVD.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.lapack.tridiag_dc_device import tridiag_eig_dc_device


def _check(d, e, w, Z, tol=5e-11):
    n = d.shape[0]
    T = np.diag(d)
    if n > 1:
        T += np.diag(e, 1) + np.diag(e, -1)
    w = np.asarray(w)
    Z = np.asarray(Z)
    scale = max(np.abs(T).max(), 1.0)
    resid = np.abs(T @ Z - Z * w[None, :]).max() / scale
    orth = np.abs(Z.T @ Z - np.eye(n)).max()
    wref = np.linalg.eigvalsh(T)
    werr = np.abs(np.sort(w) - wref).max() / scale
    assert resid < tol, f"residual {resid}"
    assert orth < tol, f"orthogonality {orth}"
    assert werr < tol, f"eigenvalue error {werr}"


@pytest.mark.parametrize("n", [5, 16, 33, 100, 257])
def test_dc_device_random(n, rng):
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1) if n > 1 else np.zeros(0)
    w, Z = tridiag_eig_dc_device(jnp.asarray(d), jnp.asarray(e))
    _check(d, e, w, Z)


def test_dc_device_deflation_heavy(rng):
    """Many zero couplings and repeated diagonal values: exercises the
    masked deflation path."""
    n = 64
    d = np.repeat(np.arange(8.0), 8)
    e = np.zeros(n - 1)
    e[::7] = 0.3
    w, Z = tridiag_eig_dc_device(jnp.asarray(d), jnp.asarray(e))
    _check(d, e, w, Z, tol=1e-10)


def test_dc_device_toeplitz(rng):
    """1-2-1 Toeplitz: analytically known spectrum."""
    n = 96
    d = 2.0 * np.ones(n)
    e = -1.0 * np.ones(n - 1)
    w, Z = tridiag_eig_dc_device(jnp.asarray(d), jnp.asarray(e))
    wref = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
    assert np.abs(np.sort(np.asarray(w)) - np.sort(wref)).max() < 1e-11
    _check(d, e, w, Z)


def test_svd_dc(grid, rng):
    """SVD(alg='dc'): bidiagonalization + device D&C via the Golub-Kahan
    embedding, cross-checked against numpy."""
    m, n = 48, 32
    a = rng.standard_normal((m, n))
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    U, s, V = El.lapack.SVD(A, alg="dc")
    u, v = U.global_array(), V.global_array()
    s = np.asarray(s)
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.abs(np.sort(s)[::-1] - sref).max() / sref.max() < 1e-10
    recon = u @ np.diag(s) @ v.conj().T
    assert np.abs(recon - a).max() / np.abs(a).max() < 1e-9
    assert np.abs(u.T @ u - np.eye(n)).max() < 1e-9
    assert np.abs(v.T @ v - np.eye(n)).max() < 1e-9
