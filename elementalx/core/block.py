"""Block-cyclic (ScaLAPACK-compatible) matrices — the BLOCK wrap.

Reference: include/El/core/DistMatrix/Block.hpp:20-218 (the 13
distributions with blockHeight/blockWidth + cuts) and the ScaLAPACK
descriptor interop (FillDesc, include/El/core/DistMatrix.hpp:74-86).

TPU mapping: XLA shardings are block-contiguous, so a block-cyclic
layout is realised as an *index permutation*: reordering global rows/
columns by (owning process, local offset) makes the cyclic ownership
pattern contiguous, after which the standard [MC,MR] sharding places
every element on exactly the device a ScaLAPACK distribution would.
``BlockMatrix`` carries the permuted DistMatrix plus the permutations;
element<->block conversion is one gather each way (XLA: all-to-all).

Note the load-balance role block-cyclic plays in MPI factorizations is
already covered here by full-size masked updates (every device always
touches its whole shard), so BLOCK wrap is primarily interop/parity."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .dmatrix import DistMatrix, pad_array
from .grid import Grid
from .types import BLOCK, Dist, MC, MR


def block_cyclic_perm(n_padded: int, nb: int, p: int,
                      cut: int = 0) -> np.ndarray:
    """Permutation pi with pi[k] = global index stored at position k when
    cyclic blocks of size nb over p processes are made owner-contiguous.
    Ownership: index i belongs to process ((i + cut) // nb) %% p — the
    reference's colCut/rowCut shift the start of the first (partial)
    block (Block.hpp:20-218)."""
    idx = np.arange(n_padded)
    owner = ((idx + cut) // nb) % p
    order = np.lexsort((idx, owner))
    return order


class BlockMatrix:
    """An m x n matrix in block-cyclic layout over the grid.

    ``dm`` holds the row/column-permuted data distributed [MC,MR]; the
    element at logical (i, j) lives where ScaLAPACK's (bh, bw) cyclic
    distribution puts it."""

    def __init__(self, dm: DistMatrix, row_perm: np.ndarray,
                 col_perm: np.ndarray, bh: int, bw: int,
                 m: int, n: int, row_cut: int = 0, col_cut: int = 0):
        self.dm = dm
        self.row_perm = row_perm
        self.col_perm = col_perm
        self.block_height = bh
        self.block_width = bw
        self.m = m
        self.n = n
        self.row_cut = row_cut
        self.col_cut = col_cut

    @staticmethod
    def from_element(A: DistMatrix, bh: int = 32, bw: int = 32,
                     row_cut: int = 0, col_cut: int = 0
                     ) -> "BlockMatrix":
        """ELEMENT -> BLOCK redistribution (reference: the
        ElementMatrix <-> BlockMatrix operator= pairs). ``row_cut`` /
        ``col_cut`` (0 <= cut < block size) make the leading block
        partial, as the reference's cut parameters do."""
        if not (0 <= row_cut < bh and 0 <= col_cut < bw):
            raise ValueError("cuts must lie in [0, blocksize)")
        g = A.grid
        P, Q = A.data.shape
        rp = block_cyclic_perm(P, bh, g.height, row_cut)
        cp = block_cyclic_perm(Q, bw, g.width, col_cut)
        data = A.data[jnp.asarray(rp), :][:, jnp.asarray(cp)]
        dm = DistMatrix.from_padded(data, A.m, A.n, MC, MR, g, BLOCK)
        return BlockMatrix(dm, rp, cp, bh, bw, A.m, A.n, row_cut,
                           col_cut)

    def to_element(self) -> DistMatrix:
        """BLOCK -> ELEMENT."""
        inv_r = np.argsort(self.row_perm)
        inv_c = np.argsort(self.col_perm)
        data = self.dm.data[jnp.asarray(inv_r), :][:, jnp.asarray(inv_c)]
        return DistMatrix.from_padded(data, self.m, self.n, MC, MR,
                                      self.dm.grid)

    def global_array(self) -> np.ndarray:
        return self.to_element().global_array()

    def owner(self, i: int, j: int) -> Tuple[int, int]:
        """(process row, process col) owning logical element (i, j) —
        matches ScaLAPACK's indxg2p."""
        g = self.dm.grid
        return (((i + self.row_cut) // self.block_height) % g.height,
                ((j + self.col_cut) // self.block_width) % g.width)

    def descriptor(self) -> np.ndarray:
        """ScaLAPACK descriptor array (reference: FillDesc,
        include/El/core/DistMatrix.hpp:74-86). DTYPE_=1, CTXT_=0."""
        return np.asarray([1, 0, self.m, self.n, self.block_height,
                           self.block_width, 0, 0,
                           max(1, -(-self.m // self.dm.grid.height))],
                          np.int64)


def FillDesc(B: BlockMatrix) -> np.ndarray:
    return B.descriptor()


def _same_perm(p: np.ndarray, q: np.ndarray) -> bool:
    return p.shape == q.shape and bool(np.all(p == q))


def BlockGemm(alpha, A: BlockMatrix, B: BlockMatrix,
              bh: Optional[int] = None, bw: Optional[int] = None
              ) -> BlockMatrix:
    """C := alpha A B on BLOCK-wrapped operands (reference: BlockMatrix
    instantiations of Gemm, Block.hpp:20-218 + Gemm.cpp's BLOCK
    dispatch). Native path: when A's column permutation equals B's row
    permutation (same inner block size), the inner permutations cancel —
    (Pr A Pc^T)(Pc B Pc'^T) = Pr (A B) Pc'^T — so the product runs
    DIRECTLY on the permuted shards with ZERO extra data movement, and
    the result is C block-wrapped with A's row / B's column layout.
    Mismatched inner layouts re-wrap B's rows first (one gather); cuts
    participate through the owner permutations (equal layouts = equal
    block size AND equal cut)."""
    from ..blas.gemm import Gemm
    from .types import NORMAL

    if _same_perm(A.col_perm, B.row_perm):
        # the permuted operands multiply directly (the inner perms are
        # identical arrays — requires matching inner block size AND a
        # cyclic map with the same process count, e.g. a square grid)
        prod = Gemm(NORMAL, NORMAL, alpha, A.dm, B.dm)
        dm = DistMatrix.from_padded(prod.data, A.m, B.n, MC, MR,
                                    A.dm.grid, BLOCK)
        return BlockMatrix(dm, A.row_perm, B.col_perm, A.block_height,
                           B.block_width, A.m, B.n, A.row_cut, B.col_cut)
    C = Gemm(NORMAL, NORMAL, alpha, A.to_element(), B.to_element())
    return BlockMatrix.from_element(C, bh or A.block_height,
                                    bw or B.block_width,
                                    A.row_cut, B.col_cut)


def BlockCholesky(uplo, A: BlockMatrix) -> BlockMatrix:
    """Cholesky of a BLOCK-wrapped HPD matrix, returning the factor in
    the same block-cyclic layout (reference: ScaLAPACK-style potrf on
    BlockMatrix). Cholesky is not permutation-equivariant, so the
    owner-permutation is unwound (one gather), the element-wrap
    factorization runs, and the factor is re-wrapped (one gather) —
    O(N^2) movement GSPMD plans against the O(N^3) factorization."""
    from ..lapack.cholesky import Cholesky

    L = Cholesky(uplo, A.to_element())
    return BlockMatrix.from_element(L, A.block_height, A.block_width,
                                    A.row_cut, A.col_cut)


def BlockTrsm(side, uplo, orientation, diag, alpha, A: BlockMatrix,
              B: BlockMatrix) -> BlockMatrix:
    """Triangular solve with BLOCK-wrapped operands (same unwind/rewrap
    scheme as BlockCholesky; the solve itself is the element-wrap
    partitioned-inverse Trsm)."""
    from ..blas.trsm import Trsm

    X = Trsm(side, uplo, orientation, diag, alpha, A.to_element(),
             B.to_element())
    return BlockMatrix.from_element(X, B.block_height, B.block_width,
                                    B.row_cut, B.col_cut)
