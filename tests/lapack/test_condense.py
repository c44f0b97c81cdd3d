"""Condensed-form reduction tests: Q^H A Q == T (tridiag), Hessenberg
similarity, and bidiagonal reconstruction."""

import numpy as np
import pytest

import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER
from elementalx.lapack.condense import (
    Bidiag,
    Hessenberg,
    HermitianTridiag,
    hessenberg_apply_q,
    tridiag_apply_q,
)


def _tridiag_dense(d, e, n):
    T = np.diag(d[:n]) + np.diag(e[: n - 1], -1) + np.diag(e[: n - 1], 1)
    return T


@pytest.mark.parametrize("n", [12, 25])
@pytest.mark.parametrize("complex_", [False, True], ids=["real", "cplx"])
def test_hermitian_tridiag(grid, rng, n, complex_):
    a = rng.standard_normal((n, n))
    if complex_:
        a = a + 1j * rng.standard_normal((n, n))
    a = a + a.conj().T
    A = DistMatrix.from_global(a, grid=grid)
    fact = HermitianTridiag(LOWER, A, blocksize=4)
    d = np.asarray(fact.d)[:n]
    e = np.asarray(fact.e)[: n - 1]
    # Q = apply to identity
    M = fact.packed.data.shape[0]
    Q = np.asarray(tridiag_apply_q(fact, jnp.eye(M, dtype=fact.packed.dtype),
                                   adjoint=False, blocksize=4))[:n, :n]
    orth = np.linalg.norm(np.eye(n) - Q.conj().T @ Q)
    assert orth < 1e-12, f"Q orthogonality {orth}"
    T = _tridiag_dense(d, e, n)
    recon = Q @ T @ Q.conj().T
    rel = np.linalg.norm(recon - a) / np.linalg.norm(a)
    assert rel < 1e-12, f"similarity residual {rel}"
    # subdiagonal must be real even for complex input
    assert np.max(np.abs(np.imag(np.asarray(fact.d)))) < 1e-12


@pytest.mark.parametrize("complex_", [False, True], ids=["real", "cplx"])
def test_hessenberg(grid, rng, complex_):
    n = 18
    a = rng.standard_normal((n, n))
    if complex_:
        a = a + 1j * rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)
    fact = Hessenberg(LOWER, A)
    M = fact.packed.data.shape[0]
    Q = np.asarray(hessenberg_apply_q(
        fact, jnp.eye(M, dtype=fact.packed.dtype), adjoint=False,
        blocksize=4))[:n, :n]
    assert np.linalg.norm(np.eye(n) - Q.conj().T @ Q) < 1e-12
    H = Q.conj().T @ a @ Q
    # H should be upper Hessenberg
    low = np.tril(H, -2)
    assert np.linalg.norm(low) / np.linalg.norm(a) < 1e-12
    # packed upper part must agree with H on the Hessenberg region
    f = fact.packed.global_array()
    np.testing.assert_allclose(np.triu(f, -1), np.triu(H, -1), atol=1e-10)


@pytest.mark.parametrize("complex_", [False, True], ids=["real", "cplx"])
def test_bidiag(grid, rng, complex_):
    m, n = 20, 12
    a = rng.standard_normal((m, n))
    if complex_:
        a = a + 1j * rng.standard_normal((m, n))
    A = DistMatrix.from_global(a, grid=grid)
    fact = Bidiag(A)
    f = fact.packed.global_array()
    d = np.asarray(fact.d)[:n]
    e = np.asarray(fact.e)[: n - 1]
    # build U from left reflectors
    from elementalx.lapack.reflect import ApplyPackedReflectors

    M = fact.packed.data.shape[0]
    U = np.asarray(ApplyPackedReflectors(
        fact.packed.data, fact.tauP, jnp.eye(M, dtype=fact.packed.dtype),
        4, n, adjoint=False))[:m, :m]
    assert np.linalg.norm(np.eye(m) - U.conj().T @ U) < 1e-11
    # build V from right reflectors (numpy, straight from the packed rows)
    V = np.eye(n, dtype=f.dtype)
    for j in range(n):
        u = np.zeros(n, dtype=f.dtype)
        if j + 1 < n:
            u[j + 1] = 1.0
            u[j + 2:] = np.conj(f[j, j + 2:n])
        s = np.asarray(fact.tauQ)[j]
        V = V @ (np.eye(n) - s * np.outer(u, u.conj()))
    B = np.zeros((m, n), dtype=f.dtype)
    B[:n, :n] = np.diag(d) + np.diag(e, 1)
    pu = np.asarray(fact.phaseU)[:n]
    pv = np.asarray(fact.phaseV)[:n]
    Ueff = U[:, :n] * pu[None, :]
    Veff = V[:, :n] * pv[None, :]
    recon = Ueff @ B[:n, :n] @ Veff.conj().T
    rel = np.linalg.norm(recon - a) / np.linalg.norm(a)
    assert rel < 1e-10, f"bidiag reconstruction {rel}"
    assert np.all(d >= 0) or not np.iscomplexobj(f)


def test_hyperbolic_reflectors(rng):
    """reflect/Hyperbolic.cpp: (I - (1/tau) w w^H Sigma)[chi; x] maps to
    -lambda e_0 and the transform is Sigma-unitary."""
    from elementalx.lapack.reflect import (LeftHyperbolicReflector,
                                           RightHyperbolicReflector)

    n = 7
    x = rng.standard_normal(n) * 0.2
    chi = 3.0
    tau, nchi, v = LeftHyperbolicReflector(chi, jnp.asarray(x))
    tau, nchi, v = float(tau), float(nchi), np.asarray(v)
    w = np.concatenate([[1.0], v])
    Sig = np.diag([1.0] + [-1.0] * n)
    H = np.eye(n + 1) - (1.0 / tau) * np.outer(w, w) @ Sig
    out = H @ np.concatenate([[chi], x])
    assert abs(out[0] - nchi) < 1e-12
    assert np.abs(out[1:]).max() < 1e-12
    assert np.abs(H @ Sig @ H.T - Sig).max() < 1e-10
    # complex right form conjugates the vector
    xc = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.1
    tau, nchi, vr = RightHyperbolicReflector(3.0, jnp.asarray(xc))
    _, _, vl = LeftHyperbolicReflector(3.0, jnp.asarray(xc))
    np.testing.assert_allclose(np.asarray(vr), np.conj(np.asarray(vl)))


def test_public_reflector_entries(rng):
    """reflect/Householder.cpp Left/RightReflector: H[chi;x] = [beta;0],
    unitary H; the x=0 case yields the valid tau=2 reflector."""
    from elementalx.lapack.reflect import LeftReflector, RightReflector

    n = 6
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    chi = complex(rng.standard_normal())
    tau, beta, v = LeftReflector(chi, jnp.asarray(x))
    w = np.concatenate([[1.0], np.asarray(v)])
    H = np.eye(n + 1) - complex(tau) * np.outer(w, np.conj(w))
    out = H @ np.concatenate([[chi], x])
    assert abs(out[0] - complex(beta)) < 1e-12
    assert np.abs(out[1:]).max() < 1e-12
    assert np.abs(H @ np.conj(H.T) - np.eye(n + 1)).max() < 1e-10
    tau, beta, v = LeftReflector(1.5, jnp.zeros(4))
    assert float(tau) == 2.0 and float(beta) == -1.5
    assert np.abs(np.asarray(v)).max() == 0
    _, _, vr = RightReflector(chi, jnp.asarray(x))
    _, _, vl = LeftReflector(chi, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(vr), np.conj(np.asarray(vl)))
