"""BLOCK-wrap cut support tests (Block.hpp colCut/rowCut)."""

import numpy as np

from elementalx import DistMatrix
from elementalx.core.types import LOWER



def test_block_cuts_roundtrip_owner_and_native_gemm(grid):
    """Block.hpp colCut/rowCut: partial leading blocks shift the cyclic
    owner map; round-trip, owner formula, native BlockGemm and
    BlockCholesky all preserve cuts."""
    from elementalx.core.block import (BlockCholesky, BlockGemm,
                                       BlockMatrix)

    rng = np.random.default_rng(91)
    a = rng.standard_normal((19, 13))
    A = DistMatrix.from_global(a, grid=grid)
    for rc, cc in [(0, 0), (3, 1), (5, 7)]:
        B = BlockMatrix.from_element(A, bh=6, bw=8, row_cut=rc,
                                     col_cut=cc)
        np.testing.assert_allclose(np.asarray(B.global_array()), a)
        g = B.dm.grid
        for i in (0, 5, 11, 18):
            for j in (0, 4, 12):
                pr, pc = B.owner(i, j)
                assert pr == ((i + rc) // 6) % g.height
                assert pc == ((j + cc) // 8) % g.width
    sq = rng.standard_normal((16, 16))
    sq2 = rng.standard_normal((16, 16))
    S1 = BlockMatrix.from_element(DistMatrix.from_global(sq, grid=grid),
                                  bh=4, bw=4, row_cut=2, col_cut=2)
    S2 = BlockMatrix.from_element(DistMatrix.from_global(sq2, grid=grid),
                                  bh=4, bw=4, row_cut=2, col_cut=2)
    C = BlockGemm(1.0, S1, S2)
    np.testing.assert_allclose(np.asarray(C.global_array()), sq @ sq2,
                               rtol=1e-12)
    assert C.row_cut == 2 and C.col_cut == 2
    spd = sq @ sq.T + 16 * np.eye(16)
    Sb = BlockMatrix.from_element(DistMatrix.from_global(spd, grid=grid),
                                  bh=4, bw=4, row_cut=1, col_cut=1)
    L = BlockCholesky(LOWER, Sb)
    Lh = np.tril(np.asarray(L.global_array()))
    np.testing.assert_allclose(Lh @ Lh.T, spd, rtol=1e-10)
    assert L.row_cut == 1
