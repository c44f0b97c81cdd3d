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
