"""Blocked multi-shift engine (blas/multishift.py) — window-boundary
coupling, row-limit, safe-floor and ragged-window cases that the API
round-trips in test_quasi.py don't isolate.

Reference semantics: src/blas_like/level3/MultiShiftTrsm.cpp,
MultiShiftQuasiTrsm.cpp, SafeMultiShiftTrsm.cpp, spectral/TriangEig.cpp.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elementalx.blas.multishift import ms_blocked_upper, ms_quasi_upper
from elementalx.blas.quasi import _prep_quasi


def _rand_upper(n, rng, dtype=np.float64):
    T = np.triu(rng.standard_normal((n, n))).astype(dtype)
    T[np.arange(n), np.arange(n)] += 3.0
    return T


def _rand_quasi(n, rng, couplings):
    """Quasi-upper with 2x2 blocks starting at the given rows."""
    T = np.triu(rng.standard_normal((n, n)))
    T[np.arange(n), np.arange(n)] += 3.0
    for k in couplings:
        T[k + 1, k] = rng.standard_normal() + 2.0
    return T


def _dense_solve(T, sh, B):
    X = np.empty_like(B)
    n = T.shape[0]
    for j in range(sh.shape[0]):
        X[:, j] = np.linalg.solve(T - sh[j] * np.eye(n), B[:, j])
    return X


@pytest.mark.parametrize("nb", [7, 16, 64])
def test_blocked_plain_matches_dense(nb):
    rng = np.random.default_rng(0)
    n, ns = 96, 33
    T = _rand_upper(n, rng)
    sh = rng.standard_normal(ns) * 0.5
    B = rng.standard_normal((n, ns))
    X = np.asarray(ms_blocked_upper(jnp.asarray(T), jnp.asarray(sh),
                                    jnp.asarray(B), nb))
    ref = _dense_solve(T, sh, B)
    assert np.allclose(X, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("nb", [8, 16])
def test_quasi_coupling_crosses_window_cut(nb):
    """2x2 blocks placed EXACTLY at window cuts (rows nb-1, 2nb-1)."""
    rng = np.random.default_rng(1)
    n, ns = 64, 17
    couplings = [nb - 1, 2 * nb - 1, 3 * nb + 2, 40]
    T = _rand_quasi(n, rng, couplings)
    sh = rng.standard_normal(ns) * 0.4
    B = rng.standard_normal((n, ns))
    X = np.asarray(ms_quasi_upper(jnp.asarray(T), n, jnp.asarray(sh),
                                  jnp.asarray(B), nb, transpose=False))
    ref = _dense_solve(T, sh, B)
    assert np.allclose(X, ref, rtol=1e-9, atol=1e-9)


def test_quasi_transpose_flip_reduction():
    rng = np.random.default_rng(2)
    n, ns, nb = 48, 9, 16
    couplings = [5, nb - 1, 30]
    T = _rand_quasi(n, rng, couplings)
    sh = rng.standard_normal(ns) * 0.4
    B = rng.standard_normal((n, ns))
    X = np.asarray(ms_quasi_upper(jnp.asarray(T), n, jnp.asarray(sh),
                                  jnp.asarray(B), nb, transpose=True))
    ref = _dense_solve(T.T, sh, B)
    assert np.allclose(X, ref, rtol=1e-9, atol=1e-9)


def test_row_limit_triang_eig_structure():
    """rows >= row_limit[j] are identity rows (x = rhs passthrough)."""
    rng = np.random.default_rng(3)
    n, nb = 40, 8
    T = _rand_upper(n, rng)
    lam = np.diagonal(T).copy()
    B0 = np.eye(n)
    X = np.asarray(ms_blocked_upper(
        jnp.asarray(T), jnp.asarray(lam), jnp.asarray(B0), nb,
        row_limit=jnp.arange(n)))
    # column j: (T - lam_j) x = 0 on rows < j, x_j = 1, zeros below
    for j in [0, 1, nb - 1, nb, 17, n - 1]:
        x = X[:, j]
        assert x[j] == pytest.approx(1.0)
        assert np.all(x[j + 1:] == 0)
        r = (T - lam[j] * np.eye(n)) @ x
        assert np.allclose(r[:j], 0, atol=1e-8 * np.abs(x).max())


def test_padding_rows_stay_identity():
    """mrows: the padding diagonal must NOT be shifted."""
    rng = np.random.default_rng(4)
    m, M, ns, nb = 20, 32, 5, 8
    T = np.zeros((M, M))
    T[:m, :m] = _rand_upper(m, rng)
    T[np.arange(m, M), np.arange(m, M)] = 1.0
    sh = rng.standard_normal(ns)
    B = np.zeros((M, ns))
    B[:m] = rng.standard_normal((m, ns))
    X = np.asarray(ms_blocked_upper(jnp.asarray(T), jnp.asarray(sh),
                                    jnp.asarray(B), nb, mrows=m))
    ref = _dense_solve(T[:m, :m], sh, B[:m])
    assert np.allclose(X[:m], ref, rtol=1e-10, atol=1e-10)
    assert np.all(X[m:] == 0)


def test_safe_floor_keeps_finite():
    """Singular shift (equal to a diagonal entry) stays finite with the
    smin floor."""
    rng = np.random.default_rng(5)
    n, nb = 24, 8
    T = _rand_upper(n, rng)
    sh = np.array([T[5, 5], 0.25])
    B = rng.standard_normal((n, 2))
    smin = jnp.asarray(np.finfo(np.float64).eps * np.abs(T).max())
    X = np.asarray(ms_blocked_upper(jnp.asarray(T), jnp.asarray(sh),
                                    jnp.asarray(B), nb, smin=smin))
    assert np.all(np.isfinite(X))
    # the regular shift still solves accurately
    ref = np.linalg.solve(T - 0.25 * np.eye(n), B[:, 1])
    assert np.allclose(X[:, 1], ref, rtol=1e-9, atol=1e-9)


def test_complex_quasi_row_limit():
    """QuasiTriangEig's usage: complexified real quasi matrix, complex
    shifts, per-shift row cutoffs."""
    rng = np.random.default_rng(6)
    n, nb = 32, 8
    T = _rand_quasi(n, rng, [3, nb - 1, 20]).astype(np.complex128)
    sh = (rng.standard_normal(4) + 1j * rng.standard_normal(4)) * 0.3
    B = (rng.standard_normal((n, 4)) + 1j * rng.standard_normal((n, 4)))
    lim = np.array([n, n, 10, nb], np.int32)
    Tq = _prep_quasi(jnp.asarray(T), n, n)
    X = np.asarray(ms_blocked_upper(
        Tq, jnp.asarray(sh), jnp.asarray(B), nb, quasi=True,
        row_limit=jnp.asarray(lim)))
    for j in range(4):
        lj = int(lim[j])
        x = X[:, j]
        assert np.allclose(x[lj:], B[lj:, j])
        # rows < lim satisfy the shifted equation with the original RHS
        r = (T - sh[j] * np.eye(n)) @ x - B[:, j]
        assert np.allclose(r[:lj], 0, atol=1e-8 * max(1, np.abs(x).max()))
