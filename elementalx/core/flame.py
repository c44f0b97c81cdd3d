"""FLAME-style partitioning helpers.

Reference: src/core/FlamePart/ (Partition/Repartition/SlidePartition/
Merge — present in the reference tree but disabled in its build,
src/core/CMakeLists.txt:21) and the view machinery
include/El/core/View/decl.hpp. Functional equivalents over DistMatrix
submatrices; the IR(a, b) range idiom maps to python slices."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .dmatrix import DistMatrix, pad_array
from ..blas.level1 import GetSubmatrix


def IR(a: int, b: int) -> slice:
    """El::IR(a, b) half-open index range."""
    return slice(a, b)


ALL = slice(None)


def View(A: DistMatrix, I: slice, J: slice = ALL) -> DistMatrix:
    """A(I, J) (functional 'view'; reference: View/decl.hpp)."""
    return GetSubmatrix(A, I, J if J != ALL else slice(0, A.n))


def Partition2x2(A: DistMatrix, k: int) -> Tuple[DistMatrix, DistMatrix,
                                                 DistMatrix, DistMatrix]:
    """[[ATL, ATR], [ABL, ABR]] split at index k (reference:
    FlamePart/Partition.hpp)."""
    return (View(A, IR(0, k), IR(0, k)), View(A, IR(0, k), IR(k, A.n)),
            View(A, IR(k, A.m), IR(0, k)), View(A, IR(k, A.m), IR(k, A.n)))


def Partition1x2(A: DistMatrix, k: int) -> Tuple[DistMatrix, DistMatrix]:
    return View(A, IR(0, A.m), IR(0, k)), View(A, IR(0, A.m), IR(k, A.n))


def Partition2x1(A: DistMatrix, k: int) -> Tuple[DistMatrix, DistMatrix]:
    return View(A, IR(0, k), IR(0, A.n)), View(A, IR(k, A.m), IR(0, A.n))


def Merge2x2(ATL: DistMatrix, ATR: DistMatrix, ABL: DistMatrix,
             ABR: DistMatrix) -> DistMatrix:
    """Reference: FlamePart/Merge.hpp."""
    top = jnp.concatenate([ATL.data[:ATL.m, :ATL.n],
                           ATR.data[:ATR.m, :ATR.n]], axis=1)
    bot = jnp.concatenate([ABL.data[:ABL.m, :ABL.n],
                           ABR.data[:ABR.m, :ABR.n]], axis=1)
    full = jnp.concatenate([top, bot], axis=0)
    return DistMatrix.from_padded(pad_array(full, ATL.grid),
                                  ATL.m + ABL.m, ATL.n + ATR.n,
                                  ATL.col_dist, ATL.row_dist, ATL.grid,
                                  ATL.wrap)


def Merge2x1(AT: DistMatrix, AB: DistMatrix) -> DistMatrix:
    full = jnp.concatenate([AT.data[:AT.m, :AT.n], AB.data[:AB.m, :AB.n]],
                           axis=0)
    return DistMatrix.from_padded(pad_array(full, AT.grid), AT.m + AB.m,
                                  AT.n, AT.col_dist, AT.row_dist, AT.grid,
                                  AT.wrap)


def Merge1x2(AL: DistMatrix, AR: DistMatrix) -> DistMatrix:
    full = jnp.concatenate([AL.data[:AL.m, :AL.n], AR.data[:AR.m, :AR.n]],
                           axis=1)
    return DistMatrix.from_padded(pad_array(full, AL.grid), AL.m,
                                  AL.n + AR.n, AL.col_dist, AL.row_dist,
                                  AL.grid, AL.wrap)
