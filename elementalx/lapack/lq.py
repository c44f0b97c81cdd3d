"""LQ and RQ factorizations.

Reference: src/lapack_like/factor/LQ/ and factor/RQ/ (Householder from
the right). Here they ride on the QR engine via conjugate transposition —
the same compact-WY MXU kernels, one extra (fusable) transpose."""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import LOWER, MC, MR, UPPER
from ..blas.level1 import Adjoint, MakeTrapezoidal
from .qr import QR, ExplicitQR, QRFactorization


class LQFactorization(NamedTuple):
    packed: DistMatrix  # L in lower triangle; reflectors above
    tau: jax.Array


def LQ(A: DistMatrix, blocksize: Optional[int] = None) -> LQFactorization:
    """A = L Q (reference: LQ.cpp). Computed as QR(A^H)^H."""
    fact = QR(Adjoint(A), blocksize)
    return LQFactorization(Adjoint(fact.packed), jnp.conj(fact.tau))


def ExplicitLQ(A: DistMatrix, blocksize: Optional[int] = None,
               full: bool = False) -> Tuple[DistMatrix, DistMatrix]:
    """(L, Q) with Q having orthonormal rows (reference: lq::Explicit).
    full=True returns the square n x n Q (L becomes m x n trapezoidal)."""
    Qh, Rh = ExplicitQR(Adjoint(A), blocksize, thin=not full)
    return Adjoint(Rh), Adjoint(Qh)


def ExplicitRQ(A: DistMatrix, blocksize: Optional[int] = None,
               full: bool = False) -> Tuple[DistMatrix, DistMatrix]:
    """A = R Q with R upper triangular/trapezoidal (reference: factor/RQ/):
    via the flip trick on LQ. full=True returns the square n x n Q and an
    m x n trapezoidal R (the LAPACK ggrqf shape)."""
    Am = A.redistribute(MC, MR)
    # flip rows/cols of the logical region, LQ, flip back
    m, n = A.m, A.n
    d = Am.data
    dl = d[:m, :n][::-1, ::-1]
    from ..core.dmatrix import pad_array

    Afl = DistMatrix.from_padded(pad_array(dl, A.grid), m, n, MC, MR,
                                 A.grid, A.wrap)
    Lf, Qf = ExplicitLQ(Afl, blocksize, full=full)
    if full:
        # A = (J_m Ltrap J_n)(J_n Qf J_n)
        lf = Lf.data[:m, :n][::-1, ::-1]
        qf = Qf.data[:n, :n][::-1, ::-1]
        R = DistMatrix.from_padded(pad_array(lf, A.grid), m, n, MC, MR,
                                   A.grid, A.wrap)
        Q = DistMatrix.from_padded(pad_array(qf, A.grid), n, n, MC, MR,
                                   A.grid, A.wrap)
        return R, Q
    lf = Lf.data[:m, :m][::-1, ::-1]
    qf = Qf.data[:m, :n][::-1, ::-1]
    R = DistMatrix.from_padded(pad_array(lf, A.grid), m, m, MC, MR,
                               A.grid, A.wrap)
    Q = DistMatrix.from_padded(pad_array(qf, A.grid), m, n, MC, MR,
                               A.grid, A.wrap)
    return MakeTrapezoidal(UPPER, R), Q
