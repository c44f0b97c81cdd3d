"""Pivoted Cholesky, Contract, ImageAndKernel, FLAME partitioning."""

import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER, MC, MR, STAR
from elementalx.lapack import CholeskyPivoted, Image, ImageAndKernel, Kernel


def test_cholesky_pivoted(grid, rng):
    n = 16
    a = rng.standard_normal((n, n))
    spd = a @ a.T + 0.1 * np.eye(n)
    L, P = CholeskyPivoted(LOWER, DistMatrix.from_global(spd, grid=grid))
    ell = L.global_array()
    perm = np.asarray(P.perm)[:n]
    pap = spd[np.ix_(perm, perm)]
    assert np.linalg.norm(ell @ ell.T - pap) / np.linalg.norm(spd) < 1e-12
    # pivoting => non-increasing diagonal
    d = np.diag(ell)
    assert np.all(d[:-1] >= d[1:] - 1e-12)


def test_cholesky_pivoted_rank_deficient(grid, rng):
    n, r = 12, 5
    g = rng.standard_normal((n, r))
    psd = g @ g.T
    L, P = CholeskyPivoted(LOWER, DistMatrix.from_global(psd, grid=grid))
    ell = L.global_array()
    perm = np.asarray(P.perm)[:n]
    pap = psd[np.ix_(perm, perm)]
    assert np.linalg.norm(ell @ ell.T - pap) / np.linalg.norm(psd) < 1e-10


def test_contract(grid, rng):
    """Contract consumes per-device partial sums, so the producer and the
    reduction live in one jitted SPMD program (the only regime in which
    'replicated-but-partial' data exists — see blas/contract.py)."""
    import jax
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from elementalx.blas import Contract

    m, n = 16, 8
    full = rng.standard_normal((m, n))
    c = grid.width
    A = DistMatrix.from_global(full, grid=grid)

    def body(x_loc):
        # partial product: my column block's contribution to x @ ones
        return x_loc @ np.ones((n // c, n))

    @jax.jit
    def pipeline(data):
        x_mr = jax.lax.with_sharding_constraint(
            data[:, :n], NamedSharding(grid.mesh, P(None, "mr")))
        partial = shard_map(body, mesh=grid.mesh,
                            in_specs=P(None, "mr"),
                            out_specs=P(None, None),
                            check_vma=False)(x_mr)
        pdm = DistMatrix(partial, m, n, MC, STAR, grid)
        return Contract(pdm, MC, MR).data

    out = pipeline(A.data)
    ref = full @ np.ones((n, n))
    np.testing.assert_allclose(np.asarray(out)[:m, :n], ref, atol=1e-12)


def test_image_kernel(grid, rng):
    m, n, r = 14, 10, 6
    a = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    A = DistMatrix.from_global(a, grid=grid)
    Img, Ker = ImageAndKernel(A)
    img, ker = Img.global_array(), Ker.global_array()
    assert img.shape[1] == r
    assert ker.shape[1] == n - r
    # A x = 0 for kernel columns; range columns span col(A)
    assert np.linalg.norm(a @ ker) < 1e-8
    proj = img @ img.T
    assert np.linalg.norm(proj @ a - a) < 1e-8


def test_flame_partitioning(grid, rng):
    a = rng.standard_normal((12, 10))
    A = DistMatrix.from_global(a, grid=grid)
    TL, TR, BL, BR = El.Partition2x2(A, 5)
    assert TL.shape == (5, 5) and BR.shape == (7, 5)
    M = El.Merge2x2(TL, TR, BL, BR)
    np.testing.assert_allclose(M.global_array(), a)
    T, B = El.Partition2x1(A, 4)
    np.testing.assert_allclose(El.Merge2x1(T, B).global_array(), a)
    L, R = El.Partition1x2(A, 3)
    np.testing.assert_allclose(El.Merge1x2(L, R).global_array(), a)
    V = El.View(A, El.IR(2, 6), El.IR(1, 4))
    np.testing.assert_allclose(V.global_array(), a[2:6, 1:4])


def test_one_condition_estimate(grid, rng):
    from elementalx.lapack.props import OneCondition, OneConditionEstimate

    n = 24
    a = rng.standard_normal((n, n)) + 2 * np.eye(n)
    A = DistMatrix.from_global(a, grid=grid)
    exact = float(OneCondition(A))
    est = OneConditionEstimate(A)
    # Hager's estimator is a lower bound, almost always within a small
    # factor of the true 1-norm condition number
    assert est <= exact * 1.0001
    assert est >= exact / 10.0


def test_trdtrmm(grid, rng):
    from elementalx.blas.level3 import Trdtrmm
    from elementalx.lapack import LDL

    n = 12
    a = rng.standard_normal((n, n))
    sym = a + a.T + 2 * n * np.eye(n)
    F = LDL(DistMatrix.from_global(sym, grid=grid))
    out = Trdtrmm(El.LOWER, F).global_array()
    f = F.global_array()
    ell = np.tril(f, -1) + np.eye(n)
    d = np.diag(f)
    ref = np.tril(ell @ np.diag(1.0 / d) @ ell.T) + np.triu(f, 1)
    np.testing.assert_allclose(out, ref, atol=1e-11)


def test_perm_module_extras(grid, rng):
    """perm/: PermuteSymmetrically (+inverse), InversePermuteRows/Cols,
    PivotsToPartialPermutation."""
    import jax.numpy as jnp

    from elementalx.lapack.perm import (InversePermuteRows,
                                        InversePermuteSymmetrically,
                                        Permutation,
                                        PermuteSymmetrically,
                                        PivotsToPartialPermutation)

    n = 9
    a = rng.standard_normal((n, n))
    a = a + a.T
    A = DistMatrix.from_global(a, grid=grid)
    pm = rng.permutation(n).astype(np.int32)
    P = Permutation(jnp.asarray(pm), n)
    S = np.asarray(PermuteSymmetrically(P, A).global_array())
    np.testing.assert_allclose(S, a[pm][:, pm])
    back = InversePermuteSymmetrically(
        P, DistMatrix.from_global(S, grid=grid))
    np.testing.assert_allclose(np.asarray(back.global_array()), a,
                               atol=1e-14)
    r = np.asarray(InversePermuteRows(P, A).global_array())
    exp = np.empty_like(a)
    exp[pm] = a
    np.testing.assert_allclose(r, exp)
    piv = np.asarray([3, 1, 4, 3, 4], dtype=np.int32)
    P2 = PivotsToPartialPermutation(piv, 5)
    x = np.arange(5.0)
    y = x.copy()
    for j, p in enumerate(piv):
        y[j], y[p] = y[p], y[j]
    np.testing.assert_allclose(x[np.asarray(P2.perm)[:5]], y)
