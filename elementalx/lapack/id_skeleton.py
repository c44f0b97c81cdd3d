"""Interpolative decomposition and skeleton (CUR) approximation.

Reference: src/lapack_like/factor/ID.cpp and Skeleton.cpp — both built
on column-pivoted QR, as here."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import LEFT, MC, MR, NON_UNIT, NORMAL, UPPER
from ..blas.level1 import Adjoint, GetSubmatrix
from ..blas.trsm import Trsm
from .perm import Permutation
from .qr import ColPivQR


def ID(A: DistMatrix, rank: int) -> Tuple[Permutation, DistMatrix]:
    """Interpolative decomposition A P ~= A(:, cols) [I, Z]
    (reference: factor/ID.cpp). Returns (column permutation, Z)."""
    fact, P = ColPivQR(A)
    k = rank
    R = fact.packed
    R11 = GetSubmatrix(R, slice(0, k), slice(0, k))
    R12 = GetSubmatrix(R, slice(0, k), slice(k, A.n))
    from ..blas.level1 import MakeTrapezoidal

    R11 = MakeTrapezoidal(UPPER, R11)
    Z = Trsm(LEFT, UPPER, NORMAL, NON_UNIT, 1.0, R11, R12)
    return P, Z


def Skeleton(A: DistMatrix, rank: int
             ) -> Tuple[Permutation, Permutation, DistMatrix]:
    """CUR-style skeleton (reference: factor/Skeleton.cpp): column ID on
    A picks columns, column ID on A^H picks rows, core = pinv(C) A
    pinv(R)."""
    factC, PC = ColPivQR(A)
    factR, PR = ColPivQR(Adjoint(A.redistribute(MC, MR)))
    k = rank
    colsel = PC.perm[:k]
    rowsel = PR.perm[:k]
    Ad = A.redistribute(MC, MR)
    C = Ad.data[:, colsel]
    Rr = Ad.data[rowsel, :]
    core = jnp.linalg.pinv(C[: A.m]) @ Ad.data[: A.m, : A.n] @ \
        jnp.linalg.pinv(Rr[:, : A.n])
    Gdm = DistMatrix.from_global(core, MC, MR, A.grid)
    return PC, PR, Gdm
