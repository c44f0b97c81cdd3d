"""QR tests (reference: tests/lapack_like/QR.cpp pattern: orthogonality
||I - Q^H Q|| and reconstruction ||A - Q R||)."""

import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.lapack.qr import (
    ApplyQ,
    CholeskyQR,
    ColPivQR,
    ExplicitQR,
    QR,
    TSQR,
)


def _checks(a, q, r, tol=1e-12):
    m, n = a.shape
    k = q.shape[1]
    orth = np.linalg.norm(np.eye(k) - q.conj().T @ q)
    recon = np.linalg.norm(a - q @ r) / np.linalg.norm(a)
    assert orth < tol, f"orthogonality {orth}"
    assert recon < tol, f"reconstruction {recon}"


@pytest.mark.parametrize("shape", [(30, 30), (40, 18), (18, 30)],
                         ids=["square", "tall", "wide"])
@pytest.mark.parametrize("complex_", [False, True], ids=["real", "cplx"])
def test_explicit_qr(grid, rng, shape, complex_):
    m, n = shape
    a = rng.standard_normal((m, n))
    if complex_:
        a = a + 1j * rng.standard_normal((m, n))
    Q, R = ExplicitQR(DistMatrix.from_global(a, grid=grid), blocksize=8)
    q, r = Q.global_array(), R.global_array()
    assert np.allclose(r, np.triu(r))
    _checks(a, q, r)


def test_apply_q(grid, rng):
    m, n, nrhs = 24, 16, 5
    a = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    b = rng.standard_normal((m, nrhs)) + 1j * rng.standard_normal((m, nrhs))
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    fact = QR(A, blocksize=4)
    QhB = ApplyQ(True, fact, B, blocksize=4)
    QQhB = ApplyQ(False, fact, QhB, blocksize=4)
    # Q Q^H b == b when Q is square-orthogonal (m reflectors span C^m? only
    # k = n < m reflectors, so Q Q^H is I on range(Q) extended by identity:
    # applying all reflectors twice (H* then H) is exact inverse)
    np.testing.assert_allclose(QQhB.global_array(), b, atol=1e-12)


def test_qr_solve_least_squares(grid, rng):
    m, n = 32, 12
    a = rng.standard_normal((m, n))
    b = rng.standard_normal((m, 1))
    A = DistMatrix.from_global(a, grid=grid)
    fact = QR(A, blocksize=8)
    Q, R = ExplicitQR(A, blocksize=8)
    x = np.linalg.solve(R.global_array()[:n, :n],
                        (Q.global_array().T @ b)[:n])
    xref, *_ = np.linalg.lstsq(a, b, rcond=None)
    np.testing.assert_allclose(x, xref, atol=1e-10)


def test_cholesky_qr(grid, rng):
    m, n = 48, 8
    a = rng.standard_normal((m, n))
    Q, R = CholeskyQR(DistMatrix.from_global(a, grid=grid))
    _checks(a, Q.global_array(), R.global_array()[:n, :n], tol=1e-10)


def test_tsqr(grid, rng):
    m, n = 64, 8
    a = rng.standard_normal((m, n))
    Q, R = TSQR(DistMatrix.from_global(a, grid=grid))
    q, r = Q.global_array(), R.global_array()
    _checks(a, q, r)


def test_colpiv_qr(grid, rng):
    m, n = 20, 14
    a = rng.standard_normal((m, n))
    # make some columns tiny to force nontrivial pivoting
    a[:, 3] *= 1e-8
    a[:, 7] *= 1e-5
    fact, P = ColPivQR(DistMatrix.from_global(a, grid=grid))
    f = fact.packed.global_array()
    r = np.triu(f)[: min(m, n)]
    perm = np.asarray(P.perm)[:n]
    # reconstruct via explicit Q from packed reflectors
    from elementalx.lapack.reflect import ExpandPackedReflectors
    import jax.numpy as jnp

    Qfull = np.asarray(ExpandPackedReflectors(
        jnp.asarray(fact.packed.data), fact.tau, 4, min(m, n), m))
    q = Qfull[:m, : min(m, n)]
    recon = q @ np.triu(f)[: min(m, n), :n]
    np.testing.assert_allclose(recon[: , :], a[:, perm][: m], atol=1e-10)
    # R diagonal magnitudes must be non-increasing
    d = np.abs(np.diag(r))
    assert np.all(d[:-1] >= d[1:] - 1e-12)


def test_qr_under_jit(grid, rng):
    import jax

    m, n = 16, 16
    a = rng.standard_normal((m, n))
    A = DistMatrix.from_global(a, grid=grid)

    @jax.jit
    def f(A):
        return QR(A, blocksize=8)

    fact = f(A)
    r = np.triu(fact.packed.global_array())
    # |diag(R)| matches numpy's
    _, rref = np.linalg.qr(a)
    np.testing.assert_allclose(np.abs(np.diag(r)), np.abs(np.diag(rref)),
                               atol=1e-12)


def test_panel_fallbacks_match_xla(grid, rng):
    """The masked two-level loop panels (used when XLA's geqrf/getrf
    composites are unavailable) must produce valid factorizations."""
    import jax.numpy as jnp
    from elementalx.lapack import qr as qrmod
    from elementalx.lapack import lu as lumod
    from elementalx.core.dmatrix import pad_array

    n = 96
    a = rng.standard_normal((n, n))
    ap = pad_array(jnp.asarray(a), grid)
    M = ap.shape[0]
    tau0 = jnp.zeros((ap.shape[1],), ap.dtype)
    packed, tau = qrmod._panel_qr_loop(ap, tau0, 0, min(32, M), n)
    packed_x, tau_x = qrmod._panel_qr(ap, tau0, 0, min(32, M), n)
    # both must yield the same R block up to column signs
    r_loop = np.triu(np.asarray(packed)[:32, :32])
    r_xla = np.triu(np.asarray(packed_x)[:32, :32])
    np.testing.assert_allclose(np.abs(r_loop), np.abs(r_xla),
                               rtol=1e-10, atol=1e-10)

    perm0 = jnp.arange(M, dtype=jnp.int32)
    a_lu, perm = lumod._lu_panel_loop(ap, perm0, 0, min(32, M), n)
    a_xla, perm_x = lumod._lu_panel(ap, perm0, 0, min(32, M), n)
    # identical pivot choices => identical factors
    np.testing.assert_allclose(np.asarray(a_lu)[:, :32],
                               np.asarray(a_xla)[:, :32],
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(perm_x))


def test_cholqr_panels_f32(grid, rng):
    """The CholeskyQR2+reconstruction panel path (f32, nb >= 192) must
    deliver f32-grade residuals/orthogonality, including on a graded
    matrix whose square-ish corner panels exercise the geqrf fallback
    predicate (scratch/ab_qr3.py is the perf A/B; this is the
    correctness gate)."""
    import jax.numpy as jnp
    from elementalx.lapack.qr import _use_cholqr_panels

    assert _use_cholqr_panels(jnp.float32, 256)
    assert not _use_cholqr_panels(jnp.float64, 256)
    assert not _use_cholqr_panels(jnp.float32, 64)

    n = 1024
    eps = np.finfo(np.float32).eps
    for tag, a in [
        ("gauss", rng.standard_normal((n, n))),
        ("tall", rng.standard_normal((n + 512, 640))),
        ("graded", rng.standard_normal((n, n))
         * np.logspace(0, -7, n)[None, :]),
    ]:
        a = a.astype(np.float32)
        A = DistMatrix.from_global(a, grid=grid)
        Q, R = ExplicitQR(A, blocksize=256)
        q, r = Q.global_array(), R.global_array()
        k = q.shape[1]
        orth = np.linalg.norm(np.eye(k) - q.T @ q)
        recon = np.linalg.norm(a - q @ r) / np.linalg.norm(a)
        assert orth < 100 * eps * np.sqrt(a.shape[0] * k), (tag, orth)
        assert recon < 100 * eps * np.sqrt(a.size) ** 0.5, (tag, recon)
