"""Sparse layer tests: containers, orderings, multifrontal LDL."""

import numpy as np
import pytest

from elementalx.sparse import (
    DistMultiVec,
    Graph,
    SparseHPDSolve,
    SparseLDL,
    SparseMatrix,
    SolveAfter,
    nested_dissection,
)


def _laplacian_2d(nx):
    n = nx * nx
    S = SparseMatrix(n)
    for y in range(nx):
        for x in range(nx):
            i = y * nx + x
            S.queue_update(i, i, 4.0)
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                xx, yy = x + dx, y + dy
                if 0 <= xx < nx and 0 <= yy < nx:
                    S.queue_update(i, yy * nx + xx, -1.0)
    S.process_queues()
    return S


def test_sparse_matrix_roundtrip(rng):
    m, n = 9, 7
    a = rng.standard_normal((m, n))
    a[np.abs(a) < 0.8] = 0.0
    S = SparseMatrix.from_dense(a)
    np.testing.assert_allclose(S.to_dense(), a)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(S.matvec(x), a @ x, atol=1e-12)
    # duplicate accumulation
    S2 = SparseMatrix(3)
    S2.queue_update(0, 0, 1.0)
    S2.queue_update(0, 0, 2.0)
    S2.queue_update(2, 1, -1.0)
    S2.process_queues()
    assert S2.to_dense()[0, 0] == 3.0 and S2.nnz == 2


def test_graph_and_nd(rng):
    S = _laplacian_2d(6)
    g = Graph.from_pattern(S.colptr, S.rowind, S.n)
    assert g.neighbors(0).shape[0] == 2  # corner vertex
    perm = nested_dissection(g, leaf_size=8)
    assert sorted(perm.tolist()) == list(range(S.n))


@pytest.mark.parametrize("ordering", ["amd", "nd", "natural"])
def test_sparse_ldl_laplacian(ordering):
    S = _laplacian_2d(8)
    n = S.n
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    fact = SparseLDL(S, ordering)
    x = SolveAfter(fact, b)
    A = S.to_dense()
    np.testing.assert_allclose(A @ x, b, atol=1e-10)
    # fill-reducing orderings must not be worse than natural by > 2x
    nnz = sum(len(s) for s in fact.struct)
    assert nnz < n * n / 2


def test_sparse_ldl_multiple_rhs(rng):
    S = _laplacian_2d(5)
    b = rng.standard_normal((S.n, 3))
    x = SparseHPDSolve(S, b)
    np.testing.assert_allclose(S.to_dense() @ x, b, atol=1e-10)


def test_sparse_quasidefinite(rng):
    """Quasi-definite KKT-style system (the reference's IPM regime)."""
    n1, n2 = 10, 6
    A = rng.standard_normal((n2, n1))
    H = np.eye(n1) * 2.0
    K = np.block([[H, A.T], [A, -np.eye(n2)]])
    S = SparseMatrix.from_dense(K, tol=0.0)
    b = rng.standard_normal(n1 + n2)
    x = SparseHPDSolve(S, b)
    np.testing.assert_allclose(K @ x, b, atol=1e-9)


def test_dist_multivec(grid, rng):
    import elementalx as El

    a = rng.standard_normal(12)
    v = DistMultiVec.from_global(a, grid=grid)
    assert v.height == 12 and v.width == 1
    assert v.dm.dist == (El.VC, El.STAR)
    np.testing.assert_allclose(v.global_array()[:, 0], a)


def test_dist_sparse_device_resident(grid):
    """DistSparseMatrix: padded-ELL row blocks live ON the mesh (sharded
    over all devices, the reference's row-block ownership) and the
    distributed SpMV matches the host matvec."""
    import jax
    import jax.numpy as jnp
    from elementalx.sparse import DistMultiVec, DistSparseMatrix, Multiply

    n = 40
    rng = np.random.default_rng(0)
    S = DistSparseMatrix(n, n, grid=grid)
    for i in range(n):
        S.queue_update(i, i, 4.0)
        if i + 1 < n:
            S.queue_update(i, i + 1, -1.0)
            S.queue_update(i + 1, i, -1.0)
        S.queue_update(i, (7 * i + 3) % n, 0.25)
    S.process_queues()
    # genuinely device-resident + sharded over the whole mesh
    assert S.ell_vals is not None
    assert len(S.ell_vals.sharding.device_set) == grid.size
    # ownership map: contiguous ceil(n/p) blocks
    r0, r1 = S.local_row_range(0)
    assert r0 == 0 and r1 == -(-n // grid.size)
    x = rng.standard_normal((n, 3))
    X = DistMultiVec.from_global(x, grid=grid)
    Y = Multiply(2.0, S, X)
    yref = 2.0 * np.stack([S.matvec(x[:, k]) for k in range(3)], axis=1)
    np.testing.assert_allclose(Y.global_array(), yref, rtol=1e-12,
                               atol=1e-12)


def test_dist_graph_partitioned(grid):
    """DistGraph: vertex-block ownership + per-rank CSR views + device
    edge arrays."""
    from elementalx.sparse import DistGraph

    n = 23
    G = DistGraph(n, grid=grid)
    for i in range(n - 1):
        G.connect(i, i + 1)
    G.connect(0, n - 1)
    G.process_queues()
    assert G.edge_src is not None
    assert len(G.edge_src.sharding.device_set) == grid.size
    # per-rank views tile the global CSR
    tot = 0
    for r in range(grid.size):
        offs = G.local_sources(r)
        tgts = G.local_targets(r)
        assert offs[-1] == tgts.shape[0]
        tot += tgts.shape[0]
    assert tot == G.targets.shape[0]
    v0, v1 = G.local_vertex_range(0)
    assert G.vertex_owner(v0) == 0 and v1 >= v0
