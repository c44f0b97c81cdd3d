"""Redistribution conformance sweep.

Mirrors the reference's tests/core/DistMatrix.cpp: for every ordered pair
of the 13(+CIRC) distributions, B = A must preserve the global matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import elementalx as El
from elementalx import ALL_DISTS, DistMatrix


def _mk(rng, m, n, grid, dist):
    a = rng.standard_normal((m, n))
    return a, DistMatrix.from_global(a, dist[0], dist[1], grid)


@pytest.mark.parametrize("src", ALL_DISTS, ids=lambda d: f"{d[0].name}_{d[1].name}")
@pytest.mark.parametrize("dst", ALL_DISTS, ids=lambda d: f"{d[0].name}_{d[1].name}")
def test_redistribution_conformance(grid, rng, src, dst):
    a, A = _mk(rng, 13, 7, grid, src)  # awkward sizes on purpose
    B = A.redistribute(*dst)
    assert B.dist == dst
    np.testing.assert_array_equal(B.global_array(), a)


def test_redistribution_under_jit(grid, rng):
    a, A = _mk(rng, 16, 8, grid, (El.MC, El.MR))

    @jax.jit
    def roundtrip(X: DistMatrix):
        Y = X.redistribute(El.VC, El.STAR)
        Z = Y.redistribute(El.STAR, El.VR)
        return Z.redistribute(El.MC, El.MR)

    B = roundtrip(A)
    np.testing.assert_allclose(B.global_array(), a)


def test_named_paths(grid, rng):
    a, A = _mk(rng, 12, 12, grid, (El.MC, El.MR))
    B = El.copy.RowAllGather(A)
    assert B.dist == (El.MC, El.STAR)
    C = El.copy.ColAllGather(B)
    assert C.dist == (El.STAR, El.STAR)
    D = El.copy.Filter(C, El.VR, El.STAR)
    assert D.dist == (El.VR, El.STAR)
    E = El.copy.PartialColAllGather(D)
    assert E.dist == (El.MR, El.STAR)
    F = El.copy.Gather(E)
    assert F.dist == (El.CIRC, El.CIRC)
    G = El.copy.Scatter(F)
    np.testing.assert_array_equal(G.global_array(), a)


def test_exchange_and_demote(grid, rng):
    a, A = _mk(rng, 10, 6, grid, (El.MC, El.MR))
    B = El.copy.Exchange(A)
    assert B.dist == (El.MR, El.MC)
    C = El.copy.ColAllToAllDemote(B)
    assert C.dist == (El.VR, El.STAR)
    D = El.copy.ColAllToAllPromote(C)
    assert D.dist == (El.MR, El.MC)
    np.testing.assert_array_equal(D.global_array(), a)


def test_translate_between_grids(grid, square_grid, rng):
    """Reference: tests/core/DifferentGrids.cpp:30-70."""
    a, A = _mk(rng, 9, 9, grid, (El.MC, El.MR))
    B = El.TranslateBetweenGrids(A, square_grid)
    assert B.grid == square_grid
    np.testing.assert_array_equal(B.global_array(), a)
    C = El.TranslateBetweenGrids(B, grid)
    np.testing.assert_array_equal(C.global_array(), a)


def test_translate_between_grids_under_jit(grid, rng):
    """Same-device-set grid translation is first-class under jit (the
    movement is a sharding constraint XLA plans); cross-device-set
    translation must stay eager and raises jax's incompatible-devices
    error inside jit."""
    import jax

    g2 = El.Grid(height=2)     # same 8 devices, different mesh shape
    a, A = _mk(rng, 12, 10, grid, (El.MC, El.MR))

    B = jax.jit(lambda X: El.TranslateBetweenGrids(X, g2))(A)
    assert B.grid == g2
    np.testing.assert_array_equal(B.global_array(), a)

    sub = El.Grid(devices=jax.devices()[:4], height=2)
    with pytest.raises(ValueError):
        jax.jit(lambda X: El.TranslateBetweenGrids(X, sub))(A)


def test_grid_properties():
    g = El.Grid(height=4)
    assert (g.height, g.width, g.size) == (4, 2, 8)
    assert g.lcm == 4 and g.gcd == 2
    assert El.default_grid_height(8) == 2
    assert El.default_grid_height(16) == 4
    assert El.default_grid_height(7) == 1


def test_invalid_dist_pair(grid):
    with pytest.raises(ValueError):
        grid.spec(El.MC, El.MC)
    with pytest.raises(ValueError):
        grid.spec(El.VC, El.MR)


def test_dist_algebra():
    assert El.Collect(El.MC) == El.STAR
    assert El.Collect(El.CIRC) == El.CIRC
    assert El.Partial(El.VC) == El.MC
    assert El.Partial(El.VR) == El.MR
    assert El.ProductDist(El.MC, El.MR) == El.VC
    assert El.ProductDist(El.MR, El.MC) == El.VR
    assert El.DiagCol(El.MC, El.MR) == El.MD


def test_dtype_preserved(grid, rng):
    for dt in (jnp.float32, jnp.float64, jnp.complex64, jnp.complex128):
        a = rng.standard_normal((8, 8)).astype(dt)
        A = DistMatrix.from_global(a, El.MC, El.MR, grid)
        B = A.redistribute(El.VR, El.STAR)
        assert B.dtype == dt
        np.testing.assert_array_equal(B.global_array(), a)


def test_block_cyclic_wrap(grid, rng):
    """BLOCK-wrap conformance (reference: tests/core/BasicBlockDistMatrix
    .cpp): element<->block round trip preserves the matrix; ownership
    matches ScaLAPACK's cyclic map."""
    from elementalx.core.block import BlockMatrix, FillDesc

    a = rng.standard_normal((20, 12))
    A = DistMatrix.from_global(a, grid=grid)
    B = BlockMatrix.from_element(A, bh=4, bw=2)
    assert B.dm.wrap == El.BLOCK
    np.testing.assert_array_equal(B.global_array(), a)
    C = B.to_element()
    np.testing.assert_array_equal(C.global_array(), a)
    # ScaLAPACK ownership: element (i, j) on process ((i//bh)%r, (j//bw)%c)
    assert B.owner(0, 0) == (0, 0)
    assert B.owner(4, 0) == (1 % grid.height, 0)
    assert B.owner(0, 2) == (0, 1 % grid.width)
    desc = FillDesc(B)
    assert desc[2] == 20 and desc[4] == 4 and desc[5] == 2


def test_block_native_ops(grid, rng):
    """Algorithms consuming BLOCK-wrapped operands natively (reference:
    BlockMatrix algorithm instantiations, Block.hpp:20-218): Gemm with
    matching inner layouts runs on the permuted shards directly;
    Cholesky/Trsm unwind and rewrap the owner-permutation."""
    from elementalx.core.block import (
        BlockCholesky, BlockGemm, BlockMatrix, BlockTrsm)

    n = 16
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, n))
    # native zero-movement path needs identical inner permutations:
    # matching inner block size on a SQUARE grid
    import jax

    sq = El.Grid(devices=jax.devices()[:4])
    assert sq.height == sq.width
    Ab = BlockMatrix.from_element(DistMatrix.from_global(a, grid=sq),
                                  bh=4, bw=2)
    Bb = BlockMatrix.from_element(DistMatrix.from_global(b, grid=sq),
                                  bh=2, bw=4)
    from elementalx.core.block import _same_perm
    assert _same_perm(Ab.col_perm, Bb.row_perm)
    Cb = BlockGemm(1.0, Ab, Bb)          # native: A.bw == B.bh == 2
    assert Cb.block_height == 4 and Cb.block_width == 4
    np.testing.assert_allclose(Cb.global_array(), a @ b, rtol=1e-12)
    Ab = BlockMatrix.from_element(DistMatrix.from_global(a, grid=grid),
                                  bh=4, bw=2)
    Bb = BlockMatrix.from_element(DistMatrix.from_global(b, grid=grid),
                                  bh=2, bw=4)
    # mismatched inner layouts re-wrap B first
    Bb2 = BlockMatrix.from_element(DistMatrix.from_global(b, grid=grid),
                                   bh=8, bw=4)
    C2 = BlockGemm(2.0, Ab, Bb2)
    np.testing.assert_allclose(C2.global_array(), 2.0 * (a @ b),
                               rtol=1e-12)

    spd = a @ a.T + n * np.eye(n)
    Sb = BlockMatrix.from_element(DistMatrix.from_global(spd, grid=grid),
                                  bh=4, bw=4)
    Lb = BlockCholesky(El.LOWER, Sb)
    L = np.tril(Lb.global_array())
    np.testing.assert_allclose(L @ L.T, spd, rtol=1e-10, atol=1e-10)
    Xb = BlockTrsm(El.LEFT, El.LOWER, El.NORMAL, El.NON_UNIT, 1.0, Lb, Bb)
    np.testing.assert_allclose(L @ Xb.global_array(), b,
                               rtol=1e-9, atol=1e-9)


def test_local_matrix(rng):
    """Local Matrix facade (reference: include/El/core/Matrix/decl.hpp)."""
    from elementalx import Matrix

    M = Matrix(4, 3)
    assert (M.height, M.width) == (4, 3)
    M.set(1, 2, 5.0)
    M.update(1, 2, 1.5)
    assert float(M.get(1, 2)) == 6.5
    M.resize(6, 3)
    assert M.height == 6 and float(M.get(1, 2)) == 6.5
    a = rng.standard_normal((5, 4))
    M2 = Matrix.from_array(a)
    np.testing.assert_allclose(M2.numpy(), a)
    D = M2.to_dist()
    np.testing.assert_allclose(D.global_array(), a)


def test_debug_bounds_checks(grid, rng):
    """Opt-in entrywise bounds mode (reference: EL_DEBUG_ONLY bounds
    assertions; release builds skip them, as does the default here)."""
    from elementalx import Matrix, debug_checks

    M = Matrix(3, 2)
    M.set(2, 1, 5.0)               # in bounds
    _ = M.get(5, 0)                # out of bounds: silent without debug
    with debug_checks():
        with pytest.raises(IndexError):
            M.get(5, 0)
        with pytest.raises(IndexError):
            M.set(0, 2, 1.0)
        M.update(1, 1, 2.0)        # in bounds still fine

    a, A = _mk(rng, 6, 5, grid, (El.MC, El.MR))
    assert float(A.get(2, 3)) == a[2, 3]
    B = A.set(1, 1, 7.0)
    assert float(B.get(1, 1)) == 7.0
    C = A.update(0, 0, 1.0)
    np.testing.assert_allclose(float(C.get(0, 0)), a[0, 0] + 1.0)
    with debug_checks():
        with pytest.raises(IndexError):
            A.get(6, 0)
    A.check_valid()                # padding invariant holds
    bad = A.with_data(A.data + 1)  # pollutes the padding region
    with pytest.raises(AssertionError):
        bad.check_valid()
