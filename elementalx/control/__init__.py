"""Control-theory solvers: Sylvester, Lyapunov, Riccati.

Reference: src/control/ — all three ride on the matrix sign function:
Sylvester (src/control/Sylvester.cpp:25-130) runs Sign on the block
matrix [[A, C], [0, -B]] and reads X off the (scaled) off-diagonal
block; Lyapunov is the B = A^H special case; Riccati signs the
Hamiltonian [[A^H, L], [-Q, -A]]."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix, pad_array
from ..core.types import ADJOINT, MC, MR, NORMAL
from ..blas.level1 import Adjoint, Scale
from ..lapack.funcs import Sign, SignCtrl


def _block2x2(A11, A12, A21, A22, grid):
    """Assemble a dense 2x2 block matrix from logical blocks."""
    import numpy as _np

    n1 = A11.shape[0]
    n2 = A22.shape[0]
    top = jnp.concatenate([A11, A12], axis=1)
    bot = jnp.concatenate([A21, A22], axis=1)
    W = jnp.concatenate([top, bot], axis=0)
    return DistMatrix.from_global(W, MC, MR, grid)


def Sylvester(A: DistMatrix, B: DistMatrix, C: DistMatrix,
              ctrl: Optional[SignCtrl] = None) -> DistMatrix:
    """Solve A X + X B = C (reference: Sylvester.cpp:25-130):
    sign([[A, C], [0, -B]]) = [[I, 2X], [0, -I]]."""
    m, n = A.m, B.m
    Ad = A.redistribute(MC, MR).data[:m, :m]
    Bd = B.redistribute(MC, MR).data[:n, :n]
    Cd = C.redistribute(MC, MR).data[:m, :n]
    W = _block2x2(Ad, Cd, jnp.zeros((n, m), Ad.dtype), -Bd, A.grid)
    S = Sign(W, ctrl)
    X = S.redistribute(MC, MR).data[:m, m:m + n] * 0.5
    return DistMatrix.from_global(X, MC, MR, A.grid)


def Lyapunov(A: DistMatrix, C: DistMatrix,
             ctrl: Optional[SignCtrl] = None) -> DistMatrix:
    """Solve A X + X A^H = C (reference: control/Lyapunov.cpp)."""
    return Sylvester(A, Adjoint(A.redistribute(MC, MR)), C, ctrl)


def Riccati(A: DistMatrix, Q: DistMatrix, L: DistMatrix,
            ctrl: Optional[SignCtrl] = None) -> DistMatrix:
    """Solve X L X - A^H X - X A = Q via the sign of the Hamiltonian
    [[A^H, L], [-Q, -A]]... wait: reference (control/Riccati.cpp) solves
    X K X - A^H X - X A = Q by signing W = [[A, -L], [-Q, -A^H]] and
    solving the stable-subspace least squares. Here: sign + subspace
    extraction via a linear solve."""
    n = A.m
    Ad = A.redistribute(MC, MR).data[:n, :n]
    Qd = Q.redistribute(MC, MR).data[:n, :n]
    Ld = L.redistribute(MC, MR).data[:n, :n]
    W = _block2x2(Ad, -Ld, -Qd, -jnp.conj(Ad.T), A.grid)
    S = Sign(W, ctrl)
    Sd = S.redistribute(MC, MR).data[: 2 * n, : 2 * n]
    # stable invariant subspace = range((I - S)/2); its columns satisfy
    # [W11; W21] = [I; X] W11, so X solves X W11 = W21 (least squares)
    ImS = jnp.eye(2 * n, dtype=Sd.dtype) - Sd
    W11 = ImS[:n, :]
    W21 = ImS[n:, :]
    Xt, *_ = jnp.linalg.lstsq(W11.T, W21.T)
    X = Xt.T
    return DistMatrix.from_global(X, MC, MR, A.grid)
