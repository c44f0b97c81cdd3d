"""bfloat16 coverage — the production serving dtype on TPU."""

import numpy as np
import pytest

import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER, NORMAL


def test_gemm_bf16(grid, rng):
    m, k, n = 32, 32, 32
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    A = DistMatrix.from_global(jnp.asarray(a, jnp.bfloat16), grid=grid)
    B = DistMatrix.from_global(jnp.asarray(b, jnp.bfloat16), grid=grid)
    C = El.Gemm(NORMAL, NORMAL, 1.0, A, B)
    assert C.dtype == jnp.bfloat16
    ref = a @ b
    out = np.asarray(C.global_array(), np.float32)
    # f32 accumulation: error dominated by the bf16 input rounding
    assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 2e-2


def test_redistribution_bf16(grid, rng):
    a = jnp.asarray(rng.standard_normal((16, 8)), jnp.bfloat16)
    A = DistMatrix.from_global(a, grid=grid)
    B = A.redistribute(El.VC, El.STAR).redistribute(El.MC, El.MR)
    np.testing.assert_array_equal(np.asarray(B.data, np.float32),
                                  np.asarray(A.data, np.float32))


def test_cholesky_bf16_solve(grid, rng):
    """bf16 storage with the solve residual at bf16-appropriate bounds."""
    n = 24
    a = rng.standard_normal((n, n)).astype(np.float32)
    spd = (a @ a.T / n + 4 * n * np.eye(n, dtype=np.float32))
    A = DistMatrix.from_global(jnp.asarray(spd, jnp.bfloat16), grid=grid)
    L = El.Cholesky(LOWER, A)
    ell = np.asarray(L.global_array(), np.float32)
    rec = ell @ ell.T
    assert np.linalg.norm(rec - spd) / np.linalg.norm(spd) < 5e-2
