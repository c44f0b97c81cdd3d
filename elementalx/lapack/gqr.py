"""Generalized QR / RQ factorizations.

Reference: src/lapack_like/factor/GQR.cpp and GRQ.cpp — the pencil
factorizations used by GLM/LSE in LAPACK's formulation:
  GQR(A, B): A = Q R,  B = Q T Z
  GRQ(A, B): A = R Q,  B = Z T Q
Built on the QR/RQ engines."""

from __future__ import annotations

from typing import Tuple

from ..core.dmatrix import DistMatrix
from ..core.types import ADJOINT, MC, MR, NORMAL
from ..blas.gemm import Gemm
from .qr import ExplicitQR
from .lq import ExplicitRQ


def GQR(A: DistMatrix, B: DistMatrix
        ) -> Tuple[DistMatrix, DistMatrix, DistMatrix, DistMatrix]:
    """(Q, R, T, Z) with A = Q R and B = Q T Z (reference: GQR.cpp)."""
    Q, R = ExplicitQR(A, thin=False)
    QhB = Gemm(ADJOINT, NORMAL, 1.0, Q, B)
    T, Z = ExplicitRQ(QhB, full=True)
    return Q, R, T, Z


def GRQ(A: DistMatrix, B: DistMatrix
        ) -> Tuple[DistMatrix, DistMatrix, DistMatrix, DistMatrix]:
    """(R, Q, Z, T) with A = R Q and B = Z T Q (reference: GRQ.cpp)."""
    R, Q = ExplicitRQ(A, full=True)
    BQh = Gemm(NORMAL, ADJOINT, 1.0, B, Q)
    Z, T = ExplicitQR(BQh, thin=False)
    return R, Q, Z, T
