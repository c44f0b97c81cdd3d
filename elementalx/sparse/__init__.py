"""Sparse layer: Graph/SparseMatrix/DistMultiVec + multifrontal LDL.

Rebuilds the core sparse classes the Hydrogen fork deleted plus the
multifrontal factorization they supported (SURVEY §0 stratum 2 and §7
step 9)."""

from .graph import DistGraph, Graph, nested_dissection  # noqa: F401
from .matrix import DistMultiVec, DistSparseMatrix, SparseMatrix  # noqa: F401
from .ldl import (  # noqa: F401
    SparseHPDSolve,
    SparseLDL,
    SparseLDLFactorization,
    SolveAfter,
)
from .supernodal import (  # noqa: F401
    SupernodalLDLFactorization,
    SupernodalSymbolic,
)


def Multiply(alpha, A: DistSparseMatrix, X: DistMultiVec) -> DistMultiVec:
    """Y := alpha A X (reference: El::Multiply on DistSparseMatrix x
    DistMultiVec, the DistSparseMultMeta-exchange SpMV)."""
    return A.multiply(X, alpha=alpha)
