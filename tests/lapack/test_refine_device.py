"""Device-resident dw eigen-refinement (lapack/refine_device.py).

These run the EXACT computation the TPU executes (on CPU backends the
dispatcher runs it eagerly — see `_refine_device`'s XLA:CPU FMA-
contraction hazard note), on an f32-degraded basis mimicking the
on-chip solver's output quality.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from elementalx.lapack import refine_device as RD


def _check(a64, v0, w0, iters=6):
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    out = RD._refine_device(jnp.asarray(hi), jnp.asarray(lo),
                            jnp.asarray(v0), jnp.asarray(w0), iters=iters)
    vh, vl, lh, ll = out[:4]
    V = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    w = np.asarray(lh, np.float64) + np.asarray(ll, np.float64)
    scale = max(np.max(np.abs(w)), 1e-30)
    resid = np.max(np.abs(a64 @ V - V * w[None, :])) / scale
    ortho = np.max(np.abs(V.T @ V - np.eye(a64.shape[0])))
    wref = np.linalg.eigvalsh(a64)
    werr = np.max(np.abs(np.sort(w) - wref)) / scale
    return resid, ortho, werr


def _degraded_basis(a64, rng, noise=3e-4):
    w64, V64 = np.linalg.eigh(a64)
    n = a64.shape[0]
    v0 = (V64 + noise * rng.standard_normal((n, n))).astype(np.float32)
    return v0, w64.astype(np.float32)


def test_refine_device_goe():
    rng = np.random.default_rng(5)
    n = 256
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    v0, w0 = _degraded_basis(a, rng)
    resid, ortho, werr = _check(a, v0, w0)
    assert resid < 1e-12
    assert ortho < 1e-12
    assert werr < 1e-12


def test_refine_device_clustered():
    """Degenerate pair + 1e-9 pair + 1e-10-spaced triple: exercises the
    guarded corrections, the 2x2 Jacobi rotations (incl. the offset-2
    classes that resolve skip-one couplings inside triples), and the
    rotation/correction blocking."""
    rng = np.random.default_rng(7)
    n = 256
    w = np.sort(rng.standard_normal(n))
    w[50] = w[51] = 0.5
    w[120], w[121] = 0.25, 0.25 + 1e-9
    w[200], w[201], w[202] = -0.4, -0.4 + 1e-10, -0.4 + 2e-10
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = (Q * w[None, :]) @ Q.T
    a = (a + a.T) / 2
    v0, w0 = _degraded_basis(a, rng)
    resid, ortho, werr = _check(a, v0, w0)
    assert resid < 1e-9   # intra-cluster couplings below the dw rot_tol
    assert ortho < 1e-12
    assert werr < 1e-9


def test_refined_eig_device_driver():
    """Public driver returns sorted f64-grade eigenpairs."""
    import elementalx as El
    import jax
    from elementalx import DistMatrix
    from elementalx.core.types import LOWER
    from elementalx.lapack.refine_device import RefinedHermitianEigDevice

    rng = np.random.default_rng(3)
    n = 128
    a64 = rng.standard_normal((n, n))
    a64 = (a64 + a64.T) / 2
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    grid = El.Grid(devices=jax.devices()[:1])
    A = DistMatrix.from_global(jnp.asarray(hi), grid=grid)
    w, V, rel = RefinedHermitianEigDevice(LOWER, A, a_lo=lo)
    assert np.all(np.diff(w) >= 0)
    atrue = hi.astype(np.float64) + lo.astype(np.float64)
    resid = np.max(np.abs(atrue @ V - V * w[None, :])) / max(
        np.max(np.abs(w)), 1e-30)
    assert resid < 1e-11
    assert rel < 1e-11


def test_refine_device_split_path():
    """The decomposed small-jit sweep (used above _SPLIT_MIN to fit
    HBM at n=8192) must produce the same f64-grade results as the
    monolithic path."""
    import unittest.mock as mock

    rng = np.random.default_rng(21)
    n = 256
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    v0, w0 = _degraded_basis(a, rng)
    with mock.patch.object(RD, "_SPLIT_MIN", 64):
        resid, ortho, werr = _check(a, v0, w0)
    assert resid < 1e-12
    assert ortho < 1e-12
    assert werr < 1e-12


def test_refine_device_global_rr_rescue():
    """A MISPAIRED entry basis (columns scrambled against the claimed
    eigenvalues — the failure mode of the f32 tridiag solver at
    n=8192, where inverse iteration returns duplicated/mispaired
    vectors) must be rescued by the full-space Rayleigh-Ritz pass and
    still converge to f64 grade."""
    import unittest.mock as mock

    rng = np.random.default_rng(23)
    n = 256
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    w64, V64 = np.linalg.eigh(a)
    # scramble a band of columns far out of order + add f32-grade noise
    perm = np.arange(n)
    perm[40:200] = np.roll(perm[40:200], 57)
    v0 = (V64[:, perm] + 3e-4 * rng.standard_normal((n, n))).astype(
        np.float32)
    w0 = w64.astype(np.float32)   # claimed values stay SORTED
    with mock.patch.object(RD, "_SPLIT_MIN", 64):
        resid, ortho, werr = _check(a, v0, w0, iters=8)
    assert resid < 1e-12
    assert ortho < 1e-12
    assert werr < 1e-12


def test_refined_linear_solve_device():
    """Device-resident LU-IR reaches ~f64 residuals from f32 factors."""
    import elementalx as El
    import jax
    from elementalx import DistMatrix
    from elementalx.lapack.refine_device import RefinedLinearSolveDevice

    rng = np.random.default_rng(9)
    n = 192
    a64 = rng.standard_normal((n, n)) + n * np.eye(n) * 0.1
    b64 = rng.standard_normal(n)
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    grid = El.Grid(devices=jax.devices()[:1])
    A = DistMatrix.from_global(jnp.asarray(hi), grid=grid)
    hist = []
    x, scaled = RefinedLinearSolveDevice(A, b64, a_lo=lo, history=hist)
    atrue = hi.astype(np.float64) + lo.astype(np.float64)
    xref = np.linalg.solve(atrue, b64)
    relerr = np.max(np.abs(x - xref)) / max(np.max(np.abs(xref)), 1e-30)
    assert scaled < 100          # the reference's < 100 scaled-resid bar
    assert relerr < 1e-10
    assert len(hist) >= 2 and hist[-1] < hist[0]


@pytest.mark.parametrize("shape", [(160, 160), (224, 160)])
def test_refined_svd_device(shape):
    """Device-resident dw SVD refinement: ~f64 residuals + singular
    values matching an f64 oracle (square and tall)."""
    import elementalx as El
    import jax
    from elementalx import DistMatrix
    from elementalx.lapack.refine_device import RefinedSVDDevice

    rng = np.random.default_rng(13)
    m, n = shape
    a64 = rng.standard_normal((m, n))
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    grid = El.Grid(devices=jax.devices()[:1])
    A = DistMatrix.from_global(jnp.asarray(hi), grid=grid)
    U, s, V, rel = RefinedSVDDevice(A, a_lo=lo)
    atrue = hi.astype(np.float64) + lo.astype(np.float64)
    sref = np.linalg.svd(atrue, compute_uv=False)
    scale = max(sref[0], 1e-30)
    assert np.max(np.abs(s - sref)) / scale < 1e-11
    resid = np.max(np.abs(atrue @ V - U * s[None, :])) / scale
    residT = np.max(np.abs(atrue.T @ U - V * s[None, :])) / scale
    assert resid < 1e-11 and residT < 1e-11, (resid, residT)
    assert np.max(np.abs(U.T @ U - np.eye(n))) < 1e-11
    assert np.max(np.abs(V.T @ V - np.eye(n))) < 1e-11
    assert rel < 1e-11


def test_window_rr_cleanup():
    """The windowed Rayleigh-Ritz stage (`_window_rr`) must fix
    arbitrary-magnitude couplings WITHIN a window in one shot: start
    from an exact eigenbasis rotated by a random orthogonal mix inside
    each 256-column window (f32-solver-grade damage the guarded
    first-order corrections cannot touch) and check the intra-window
    couplings collapse to ~f32 eigh grade."""
    import jax

    rng = np.random.default_rng(11)
    n, b = 512, 256
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    w64, V64 = np.linalg.eigh(a)
    # rotate within each window by a small-but-not-tiny orthogonal mix
    Vd = V64.copy()
    for w0 in range(0, n, b):
        g = 0.05 * rng.standard_normal((b, b))
        q, _ = np.linalg.qr(np.eye(b) + (g - g.T))
        Vd[:, w0:w0 + b] = Vd[:, w0:w0 + b] @ q
    vh = jnp.asarray(Vd.astype(np.float32))
    vl = jnp.zeros_like(vh)
    lam = jnp.asarray(w64.astype(np.float32))
    av = jnp.asarray((a @ Vd).astype(np.float32))
    qtr = jnp.asarray(Vd.T.astype(np.float32)) @ (
        av - vh * lam[None, :])
    scale = float(np.max(np.abs(w64)))
    before = float(jnp.max(jnp.abs(qtr - jnp.diag(jnp.diag(qtr)))))
    vh2, vl2, lam2 = RD._window_rr(vh, vl, lam, qtr, 0, b)
    V2 = np.asarray(vh2, np.float64) + np.asarray(vl2, np.float64)
    q2 = V2.T @ (a @ V2) - np.diag(np.asarray(lam2, np.float64))
    # couplings within each window must drop by orders of magnitude
    for w0 in range(0, n, b):
        blk = q2[w0:w0 + b, w0:w0 + b]
        off = np.max(np.abs(blk - np.diag(np.diag(blk))))
        assert off < 1e-4 * max(before, 1e-30), (off, before)
