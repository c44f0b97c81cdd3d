"""Quasi-triangular solve family tests (reference:
src/blas_like/level3/QuasiTrsm.cpp, MultiShiftQuasiTrsm.cpp,
SafeMultiShiftTrsm.cpp, Trstrm.cpp, level2/QuasiTrsv)."""

import numpy as np
import pytest

import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.blas.quasi import (
    MultiShiftQuasiTrsm,
    QuasiTrsm,
    QuasiTrsv,
    SafeMultiShiftQuasiTrsm,
    SafeMultiShiftTrsm,
    Trstrm,
)
from elementalx.core.types import (
    ADJOINT, LEFT, LOWER, NON_UNIT, NORMAL, RIGHT, TRANSPOSE, UPPER,
)


def _quasi_upper(rng, n):
    """Random quasi-upper-triangular matrix with isolated 2x2 couplings
    and a safe diagonal."""
    T = np.triu(rng.standard_normal((n, n)))
    np.fill_diagonal(T, np.sign(np.diag(T)) * (1.0 + np.abs(np.diag(T))))
    k = 1
    while k < n - 1:
        if rng.random() < 0.4:
            T[k + 1, k] = rng.standard_normal() * 0.5
            k += 3  # keep couplings isolated
        else:
            k += 1
    return T


def test_quasi_trsm_left_upper(grid, rng):
    n, nrhs = 24, 7
    T = _quasi_upper(rng, n)
    b = rng.standard_normal((n, nrhs))
    Td = DistMatrix.from_global(jnp.asarray(T), grid=grid)
    B = DistMatrix.from_global(jnp.asarray(b), grid=grid)
    X = QuasiTrsm(LEFT, UPPER, NORMAL, 2.0, Td, B).global_array()
    np.testing.assert_allclose(T @ X, 2.0 * b, atol=1e-10)
    Xt = QuasiTrsm(LEFT, UPPER, TRANSPOSE, 1.0, Td, B).global_array()
    np.testing.assert_allclose(T.T @ Xt, b, atol=1e-10)


def test_quasi_trsm_lower_right(grid, rng):
    n, nrhs = 18, 5
    T = _quasi_upper(rng, n).T  # quasi-LOWER
    b = rng.standard_normal((n, nrhs))
    Td = DistMatrix.from_global(jnp.asarray(T), grid=grid)
    B = DistMatrix.from_global(jnp.asarray(b), grid=grid)
    X = QuasiTrsm(LEFT, LOWER, NORMAL, 1.0, Td, B).global_array()
    np.testing.assert_allclose(T @ X, b, atol=1e-10)
    # RIGHT: X op(T) = alpha B with B (nrhs x n)
    c = rng.standard_normal((nrhs, n))
    C = DistMatrix.from_global(jnp.asarray(c), grid=grid)
    Xr = QuasiTrsm(RIGHT, LOWER, NORMAL, 1.0, Td, C).global_array()
    np.testing.assert_allclose(Xr @ T, c, atol=1e-10)
    Xrt = QuasiTrsm(RIGHT, LOWER, TRANSPOSE, 1.0, Td, C).global_array()
    np.testing.assert_allclose(Xrt @ T.T, c, atol=1e-10)


def test_quasi_trsv(grid, rng):
    n = 16
    T = _quasi_upper(rng, n)
    b = rng.standard_normal((n, 1))
    x = QuasiTrsv(UPPER, NORMAL,
                  DistMatrix.from_global(jnp.asarray(T), grid=grid),
                  DistMatrix.from_global(jnp.asarray(b), grid=grid)
                  ).global_array()
    np.testing.assert_allclose(T @ x, b, atol=1e-10)


def test_multishift_quasi_trsm(grid, rng):
    n = 20
    T = _quasi_upper(rng, n)
    shifts = rng.standard_normal(6) * 0.1  # keep shifted diag nonsingular
    b = rng.standard_normal((n, 6))
    X = MultiShiftQuasiTrsm(
        LEFT, UPPER, NORMAL, 1.0,
        DistMatrix.from_global(jnp.asarray(T), grid=grid),
        jnp.asarray(shifts),
        DistMatrix.from_global(jnp.asarray(b), grid=grid)).global_array()
    for j in range(6):
        np.testing.assert_allclose(
            (T - shifts[j] * np.eye(n)) @ X[:, j], b[:, j], atol=1e-9)
    # transpose orientation
    Xt = MultiShiftQuasiTrsm(
        LEFT, UPPER, TRANSPOSE, 1.0,
        DistMatrix.from_global(jnp.asarray(T), grid=grid),
        jnp.asarray(shifts),
        DistMatrix.from_global(jnp.asarray(b), grid=grid)).global_array()
    for j in range(6):
        np.testing.assert_allclose(
            (T.T - shifts[j] * np.eye(n)) @ Xt[:, j], b[:, j], atol=1e-9)


def test_safe_multishift_trsm(grid, rng):
    """Overflow guard: a shift exactly at a diagonal entry must yield a
    finite, large solution rather than Inf/NaN."""
    n = 12
    t = np.triu(rng.standard_normal((n, n)))
    np.fill_diagonal(t, np.arange(1.0, n + 1))
    shifts = np.array([0.0, 3.0])  # 3.0 hits t[2,2]
    b = rng.standard_normal((n, 2))
    X, scales = SafeMultiShiftTrsm(
        LEFT, UPPER, NORMAL, 1.0,
        DistMatrix.from_global(jnp.asarray(t), grid=grid),
        jnp.asarray(shifts),
        DistMatrix.from_global(jnp.asarray(b), grid=grid))
    x = X.global_array()
    assert np.all(np.isfinite(x))
    # the well-conditioned shift solves exactly (scaled)
    s0 = float(np.asarray(scales)[0])
    np.testing.assert_allclose(t @ x[:, 0], s0 * b[:, 0], atol=1e-9)


def test_safe_multishift_quasi_trsm(grid, rng):
    n = 16
    T = _quasi_upper(rng, n)
    shifts = np.array([0.05, float(T[4, 4])])  # second is near-singular
    b = rng.standard_normal((n, 2))
    X, scales = SafeMultiShiftQuasiTrsm(
        LEFT, UPPER, NORMAL, 1.0,
        DistMatrix.from_global(jnp.asarray(T), grid=grid),
        jnp.asarray(shifts),
        DistMatrix.from_global(jnp.asarray(b), grid=grid))
    x = X.global_array()
    assert np.all(np.isfinite(x))
    s0 = float(np.asarray(scales)[0])
    np.testing.assert_allclose((T - 0.05 * np.eye(n)) @ x[:, 0],
                               s0 * b[:, 0], atol=1e-9)


def test_trstrm(grid, rng):
    n = 14
    a = np.tril(rng.standard_normal((n, n)))
    np.fill_diagonal(a, 2.0 + np.abs(np.diag(a)))
    bfull = np.tril(rng.standard_normal((n, n)))
    X = Trstrm(LEFT, LOWER, NORMAL, NON_UNIT, 1.0,
               DistMatrix.from_global(jnp.asarray(a), grid=grid),
               DistMatrix.from_global(jnp.asarray(bfull), grid=grid)
               ).global_array()
    # X is lower triangular and solves A X = B on the lower triangle
    assert np.allclose(X, np.tril(X))
    want = np.tril(np.linalg.solve(a, bfull))
    np.testing.assert_allclose(np.tril(X), want, atol=1e-10)


def test_multishift_trsm_right(grid, rng):
    """RIGHT-side MultiShiftTrsm (beyond the reference, whose driver
    raises LogicError for side=RIGHT — MultiShiftTrsm.cpp:28-37)."""
    from elementalx.blas.level3 import MultiShiftTrsm

    n, nsh = 12, 5
    t = np.triu(rng.standard_normal((n, n))) + 4 * np.eye(n)
    shifts = rng.standard_normal(nsh) * 0.1
    b = rng.standard_normal((nsh, n))
    T = DistMatrix.from_global(jnp.asarray(t), grid=grid)
    B = DistMatrix.from_global(jnp.asarray(b), grid=grid)
    X = MultiShiftTrsm(RIGHT, UPPER, NORMAL, 1.0, T,
                       jnp.asarray(shifts), B).global_array()
    for j in range(nsh):
        np.testing.assert_allclose(
            X[j, :] @ (t - shifts[j] * np.eye(n)), b[j, :], atol=1e-9)
    # adjoint orientation with a complex T
    tc = t + 1j * np.triu(rng.standard_normal((n, n)))
    shc = shifts + 0.05j
    bc = b + 1j * rng.standard_normal((nsh, n))
    Tc = DistMatrix.from_global(jnp.asarray(tc), grid=grid)
    Bc = DistMatrix.from_global(jnp.asarray(bc), grid=grid)
    Xc = MultiShiftTrsm(RIGHT, UPPER, ADJOINT, 1.0, Tc,
                        jnp.asarray(shc), Bc).global_array()
    for j in range(nsh):
        np.testing.assert_allclose(
            Xc[j, :] @ (np.conj(tc.T) - shc[j] * np.eye(n)), bc[j, :],
            atol=1e-9)


def test_quasi_reorder(grid, rng):
    """Block-aware reordering of the real quasi form (dtrsen role)."""
    from elementalx.lapack.schur import ReorderSchur, Schur

    n = 16
    a = rng.standard_normal((n, n))
    dec = Schur(DistMatrix.from_global(a, grid=grid))
    w0 = dec.w
    # select the eigenvalue(s) of largest magnitude
    sel = np.abs(w0) >= np.sort(np.abs(w0))[-1]
    dec2 = ReorderSchur(dec, sel)
    T2, Z2 = dec2.T.global_array(), dec2.Z.global_array()
    assert np.linalg.norm(Z2 @ T2 @ Z2.T - a) / np.linalg.norm(a) < 1e-11
    assert np.linalg.norm(Z2.T @ Z2 - np.eye(n)) < 1e-12
    # the top block now carries the largest |eigenvalue|
    top_mag = abs(dec2.w[0])
    assert abs(top_mag - np.abs(w0).max()) < 1e-8 * max(1, top_mag)


def test_multishift_quasi_trsm_right(grid, rng):
    """RIGHT side via the transpose reduction (reference:
    MultiShiftQuasiTrsm.cpp handles both sides)."""
    n, k = 18, 5
    T = _quasi_upper(rng, n)
    shifts = rng.standard_normal(k) * 0.1
    b = rng.standard_normal((k, n))
    X = MultiShiftQuasiTrsm(
        RIGHT, UPPER, NORMAL, 2.0,
        DistMatrix.from_global(jnp.asarray(T), grid=grid),
        jnp.asarray(shifts),
        DistMatrix.from_global(jnp.asarray(b), grid=grid)).global_array()
    for j in range(k):
        np.testing.assert_allclose(
            X[j] @ (T - shifts[j] * np.eye(n)), 2.0 * b[j], atol=1e-8)


def test_safe_multishift_trsm_right(grid, rng):
    n, k = 12, 2
    t = np.triu(rng.standard_normal((n, n)))
    np.fill_diagonal(t, np.arange(1.0, n + 1))
    shifts = np.array([0.0, 0.5])
    b = rng.standard_normal((k, n))
    X, scales = SafeMultiShiftTrsm(
        RIGHT, UPPER, NORMAL, 1.0,
        DistMatrix.from_global(jnp.asarray(t), grid=grid),
        jnp.asarray(shifts),
        DistMatrix.from_global(jnp.asarray(b), grid=grid))
    x = X.global_array()
    assert np.all(np.isfinite(x))
    for j in range(k):
        sj = float(np.asarray(scales)[j])
        np.testing.assert_allclose(
            x[j] @ (t - shifts[j] * np.eye(n)), sj * b[j], atol=1e-9)


def test_safe_multishift_quasi_trsm_right(grid, rng):
    n, k = 16, 2
    T = _quasi_upper(rng, n)
    shifts = np.array([0.05, -0.07])
    b = rng.standard_normal((k, n))
    X, scales = SafeMultiShiftQuasiTrsm(
        RIGHT, UPPER, NORMAL, 1.0,
        DistMatrix.from_global(jnp.asarray(T), grid=grid),
        jnp.asarray(shifts),
        DistMatrix.from_global(jnp.asarray(b), grid=grid))
    x = X.global_array()
    for j in range(k):
        sj = float(np.asarray(scales)[j])
        np.testing.assert_allclose(
            x[j] @ (T - shifts[j] * np.eye(n)), sj * b[j], atol=1e-8)
