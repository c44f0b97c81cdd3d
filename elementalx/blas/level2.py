"""BLAS-like level 2 (reference: src/blas_like/level2/, SURVEY §2.3 —
only Gemv is built by the fork; the rest is source-only spec).

On TPU a matrix-vector product is a thin Gemm; XLA handles the
[MR,*]-style vector redistributions the reference codes by hand
(src/blas_like/level2/Gemv/Normal.hpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix, check_same_grid
from ..core.types import (
    ADJOINT,
    LOWER,
    LeftOrRight,
    MC,
    MR,
    NORMAL,
    Orientation,
    TRANSPOSE,
    UPPER,
    UpperOrLower,
)
from .gemm import Gemm
from .level1 import MakeSymmetric
from .trsm import Trsv  # noqa: F401  (level-2 API member, impl in trsm)


def Gemv(orientation: Orientation, alpha, A: DistMatrix, x: DistMatrix,
         beta=0.0, y: DistMatrix = None) -> DistMatrix:
    """y := alpha op(A) x + beta y (reference: Gemv/Normal.hpp,
    Gemv/Transpose.hpp)."""
    return Gemm(orientation, NORMAL, alpha, A, x, beta=beta, C=y)


def Symv(uplo: UpperOrLower, alpha, A: DistMatrix, x: DistMatrix,
         beta=0.0, y: DistMatrix = None, conjugate: bool = False
         ) -> DistMatrix:
    """y := alpha A x + beta y, A symmetric in uplo (reference: Symv.cpp)."""
    Afull = MakeSymmetric(uplo, A.redistribute(MC, MR), conjugate=conjugate)
    return Gemm(NORMAL, NORMAL, alpha, Afull, x, beta=beta, C=y)


def Hemv(uplo: UpperOrLower, alpha, A: DistMatrix, x: DistMatrix,
         beta=0.0, y: DistMatrix = None) -> DistMatrix:
    """Reference: Hemv.cpp."""
    return Symv(uplo, alpha, A, x, beta=beta, y=y, conjugate=True)


def Ger(alpha, x: DistMatrix, y: DistMatrix, A: DistMatrix) -> DistMatrix:
    """A += alpha x y^H (reference: Ger.cpp)."""
    return Gemm(NORMAL, ADJOINT, alpha, x, y, beta=1.0, C=A)


def Geru(alpha, x: DistMatrix, y: DistMatrix, A: DistMatrix) -> DistMatrix:
    """A += alpha x y^T (reference: Geru.cpp)."""
    return Gemm(NORMAL, TRANSPOSE, alpha, x, y, beta=1.0, C=A)


def Her(uplo: UpperOrLower, alpha, x: DistMatrix, A: DistMatrix) -> DistMatrix:
    """A += alpha x x^H on the triangle (reference: Her.cpp)."""
    from .level3 import _merge_triangle

    prod = Gemm(NORMAL, ADJOINT, alpha, x, x, beta=1.0, C=A)
    return _merge_triangle(uplo, prod, A.redistribute(MC, MR))


def Syr(uplo: UpperOrLower, alpha, x: DistMatrix, A: DistMatrix,
        conjugate: bool = False) -> DistMatrix:
    """A += alpha x x^T on the triangle (reference: Syr.cpp)."""
    from .level3 import _merge_triangle

    orient = ADJOINT if conjugate else TRANSPOSE
    prod = Gemm(NORMAL, orient, alpha, x, x, beta=1.0, C=A)
    return _merge_triangle(uplo, prod, A.redistribute(MC, MR))


def Her2(uplo: UpperOrLower, alpha, x: DistMatrix, y: DistMatrix,
         A: DistMatrix) -> DistMatrix:
    """A += alpha x y^H + conj(alpha) y x^H on the triangle
    (reference: Her2.cpp)."""
    from .level3 import _merge_triangle

    P1 = Gemm(NORMAL, ADJOINT, alpha, x, y, beta=1.0, C=A)
    P2 = Gemm(NORMAL, ADJOINT, jnp.conj(jnp.asarray(alpha)), y, x,
              beta=1.0, C=P1)
    # P2 = A + a x y^H + conj(a) y x^H
    return _merge_triangle(uplo, P2, A.redistribute(MC, MR))


def Syr2(uplo: UpperOrLower, alpha, x: DistMatrix, y: DistMatrix,
         A: DistMatrix, conjugate: bool = False) -> DistMatrix:
    """Reference: Syr2.cpp."""
    from .level3 import _merge_triangle

    orient = ADJOINT if conjugate else TRANSPOSE
    P1 = Gemm(NORMAL, orient, alpha, x, y, beta=1.0, C=A)
    P2 = Gemm(NORMAL, orient, alpha, y, x, beta=1.0, C=P1)
    return _merge_triangle(uplo, P2, A.redistribute(MC, MR))
