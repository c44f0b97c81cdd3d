"""Two-stage SBR tridiagonalization tests (lapack/sbr.py).

Stage 1 (band reduce), the dense stage-2 chase reference, the diamond
compact-WY backtransform, and the HermitianEig 'sbr' path. The Pallas
chase kernel (kernels/sb2tr.py) shares op order/outputs with the dense
reference and is validated on-chip (scratch/val_sb2tr.py; PERF.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER
from elementalx.lapack.sbr import (
    _apply_q1,
    _sb2tr_dense,
    band_reduce,
    sbr_apply_q,
    sbr_tridiag,
)


def _symm(rng, n):
    a = rng.standard_normal((n, n)).astype(np.float32)
    return (a + a.T) / 2


@pytest.mark.parametrize("n,b", [(96, 16), (64, 32)])
def test_band_reduce(rng, n, b):
    a = _symm(rng, n)
    a_band, Vs, Ts = jax.jit(band_reduce, static_argnames="b")(
        jnp.asarray(a), b=b)
    ab = np.asarray(a_band)
    # banded: zero outside |i-j| <= b
    i, j = np.indices((n, n))
    assert np.max(np.abs(ab[np.abs(i - j) > b])) == 0.0
    # similarity: eigenvalues preserved to f32 grade
    ev0 = np.linalg.eigvalsh(a.astype(np.float64))
    ev1 = np.linalg.eigvalsh(ab.astype(np.float64))
    assert np.max(np.abs(ev1 - ev0)) < 1e-4 * max(np.max(np.abs(ev0)), 1)
    # Q1 reconstruction: Q1^T A Q1 == A_band
    Q1 = np.asarray(_apply_q1(Vs, Ts, jnp.eye(n, dtype=jnp.float32), b))
    assert np.max(np.abs(Q1.T @ Q1 - np.eye(n))) < 5e-6
    assert np.max(np.abs(Q1.T @ a @ Q1 - ab)) < 1e-4


@pytest.mark.parametrize("n,b", [(96, 16)])
def test_sbr_dense_tridiag_and_backtransform(rng, n, b):
    a = _symm(rng, n)
    fact = sbr_tridiag(jnp.asarray(a), b=b, use_kernel=False)
    d = np.asarray(fact.d)[:n]
    e = np.asarray(fact.e)[: n - 1]
    T = np.diag(d) + np.diag(e, -1) + np.diag(e, 1)
    ev0 = np.linalg.eigvalsh(a.astype(np.float64))
    ev1 = np.linalg.eigvalsh(T.astype(np.float64))
    assert np.max(np.abs(ev1 - ev0)) < 1e-4 * max(np.max(np.abs(ev0)), 1)
    # Q = Q1 Q2 orthogonal and A Q == Q T
    Q = np.asarray(sbr_apply_q(fact, jnp.eye(n, dtype=jnp.float32), b))
    assert np.max(np.abs(Q.T @ Q - np.eye(n))) < 1e-5
    assert np.max(np.abs(a @ Q - Q @ T)) < 2e-4 * max(np.max(np.abs(ev0)), 1)
    # adjoint consistency: Q^T (Q Z) == Z
    Z = rng.standard_normal((n, 5)).astype(np.float32)
    QZ = sbr_apply_q(fact, jnp.asarray(Z), b)
    back = np.asarray(sbr_apply_q(fact, QZ, b, adjoint=True))
    assert np.max(np.abs(back - Z)) < 1e-5


def test_sb2tr_dense_matches_band_eigs(rng):
    # chase on a directly-constructed band matrix (n not huge; exercises
    # the padded-window trivial-reflector edges)
    n, b = 64, 16
    a = _symm(rng, n)
    a_band, _, _ = jax.jit(band_reduce, static_argnames="b")(
        jnp.asarray(a), b=b)
    a_tri, vout = jax.jit(_sb2tr_dense, static_argnames="b")(a_band, b)
    at = np.asarray(a_tri)
    # tridiagonal: zero outside |i-j| <= 1
    i, j = np.indices((n, n))
    assert np.max(np.abs(at[np.abs(i - j) > 1])) < 1e-6
    ev0 = np.linalg.eigvalsh(np.asarray(a_band).astype(np.float64))
    ev1 = np.linalg.eigvalsh(at.astype(np.float64))
    assert np.max(np.abs(ev1 - ev0)) < 1e-4 * max(np.max(np.abs(ev0)), 1)


def test_hermitian_eig_sbr_path(rng):
    # n NOT a band multiple: exercises the pad-to-band driver logic
    n, b = 40, 16
    a = _symm(rng, n)
    g1 = El.Grid(devices=jax.devices()[:1])
    A = DistMatrix.from_global(jnp.asarray(a), grid=g1)
    from elementalx.lapack.hermitian_eig import HermitianEig, HermitianEigCtrl

    ctrl = HermitianEigCtrl(tridiag_alg="sbr", band=b)
    w, Q = HermitianEig(LOWER, A, vectors=True, ctrl=ctrl)
    w = np.asarray(w)
    qd = np.asarray(Q.data)[:n, :n]
    ev0 = np.linalg.eigvalsh(a.astype(np.float64))
    assert np.max(np.abs(np.sort(w) - ev0)) < 1e-3 * max(np.max(np.abs(ev0)), 1)
    resid = np.max(np.abs(a @ qd - qd * w[None, :]))
    assert resid < 1e-3 * max(np.max(np.abs(ev0)), 1)
    assert np.max(np.abs(qd.T @ qd - np.eye(n))) < 1e-4
    # eigenvalues-only route
    w2 = HermitianEig(LOWER, A, vectors=False, ctrl=ctrl)
    assert np.max(np.abs(np.sort(np.asarray(w2)) - ev0)) < 1e-3 * max(
        np.max(np.abs(ev0)), 1)
