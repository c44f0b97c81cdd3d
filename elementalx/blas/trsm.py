"""Distributed triangular solve with multiple RHS.

Reference: src/blas_like/level3/Trsm.cpp:121-157 (8 side/uplo/orientation
cases, each with Large/Medium/Small variants chosen by shape and grid).

TPU-native design: a blocked substitution on the sharded global matrix.
Diagonal blocks are inverted once, batched on the MXU (vmapped
triangular solve against I — the partitioned-inverse scheme standard on
accelerators); each substitution step is then one distributed
(nb x M) @ (M x N) matmul, so the hot loop is pure MXU work + the
collectives XLA plans. The reference's Large/Medium/Small distinction
(which redistribution plan to use per shape) is XLA's job here.

All eight cases normalise to a LEFT, NORMAL solve by materialising the
(cheap, fusable) transpose of the operand.
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix, check_same_grid
from ..core.environment import Blocksize
from ..core.types import (
    ADJOINT,
    LEFT,
    LOWER,
    LeftOrRight,
    MC,
    MR,
    NON_UNIT,
    NORMAL,
    Orientation,
    RIGHT,
    TRANSPOSE,
    UNIT,
    UPPER,
    UnitOrNonUnit,
    UpperOrLower,
)
from .gemm import local_gemm


def _pick_nb(M: int, want: int) -> int:
    nb = min(want, M)
    while M % nb != 0:
        nb -= 1
    return nb


def _prep_triangle(T: jax.Array, m: int, lower: bool, unit: bool) -> jax.Array:
    """Mask to the triangle, force unit diagonal if requested, and set the
    padding diagonal (rows/cols >= m) to 1 so diagonal blocks stay
    invertible."""
    M = T.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    keep = (j <= i) if lower else (j >= i)
    T = jnp.where(keep, T, jnp.zeros((), T.dtype))
    diag = i == j
    one = jnp.ones((), T.dtype)
    if unit:
        T = jnp.where(diag, one, T)
    else:
        T = jnp.where(diag & (i >= m), one, T)
    return T


def _left_solve(T: jax.Array, B: jax.Array, lower: bool, nb: int) -> jax.Array:
    """Solve T X = B for triangular T (already prepped), blocked.
    bf16/f16 storage solves through f32 (no low-precision XLA
    TriangularSolve; accumulation wants f32 regardless)."""
    if T.dtype in (jnp.bfloat16, jnp.float16):
        out = _left_solve(T.astype(jnp.float32), B.astype(jnp.float32),
                          lower, nb)
        return out.astype(B.dtype)
    M, N = T.shape[0], B.shape[1]
    nb = _pick_nb(M, nb)
    nblk = M // nb

    # batched diagonal-block inverses (MXU, one shot)
    ks = jnp.arange(nblk) * nb
    blocks = jax.vmap(
        lambda k0: jax.lax.dynamic_slice(T, (k0, k0), (nb, nb)))(ks)
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=T.dtype), (nblk, nb, nb))
    tri_inv = jax.lax.linalg.triangular_solve(
        blocks, eye, left_side=True, lower=lower)

    def step(idx, X):
        k = idx if lower else (nblk - 1 - idx)
        k0 = k * nb
        row = jax.lax.dynamic_slice(T, (k0, 0), (nb, M))
        Bk = jax.lax.dynamic_slice(B, (k0, 0), (nb, N))
        Rk = Bk - local_gemm(row, X)
        Xk = local_gemm(jax.lax.dynamic_index_in_dim(tri_inv, k, keepdims=False),
                        Rk)
        return jax.lax.dynamic_update_slice(X, Xk, (k0, 0))

    X0 = jnp.zeros_like(B)
    return jax.lax.fori_loop(0, nblk, step, X0)


def _right_solve_adjoint_lower(T: jax.Array, B: jax.Array, nb: int
                               ) -> jax.Array:
    """Solve X T^H = B for lower-triangular T (already prepped), i.e. a
    RIGHT solve against the upper-triangular T^H, without materialising
    any transpose of T or B: blocked partitioned-inverse substitution
    with each step one (P, M) @ (M, nb) MXU matmul. Used by the Cholesky
    recursion's L21 = A21 inv(L11)^H panels."""
    if T.dtype in (jnp.bfloat16, jnp.float16):
        out = _right_solve_adjoint_lower(T.astype(jnp.float32),
                                         B.astype(jnp.float32), nb)
        return out.astype(B.dtype)
    M = T.shape[0]
    P = B.shape[0]
    nb = _pick_nb(M, nb)
    nblk = M // nb
    ks = jnp.arange(nblk) * nb
    blocks = jax.vmap(
        lambda k0: jax.lax.dynamic_slice(T, (k0, k0), (nb, nb)))(ks)
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=T.dtype), (nblk, nb, nb))
    tri_inv = jax.lax.linalg.triangular_solve(
        blocks, eye, left_side=True, lower=True)

    def step(k, X):
        k0 = k * nb
        rowL = jax.lax.dynamic_slice(T, (k0, 0), (nb, M))   # L[k, :]
        Bk = jax.lax.dynamic_slice(B, (0, k0), (P, nb))
        # (T^H)[:, k-block] = conj(rowL)^T
        Rk = Bk - local_gemm(X, jnp.conj(rowL).T)
        inv_k = jax.lax.dynamic_index_in_dim(tri_inv, k, keepdims=False)
        Xk = local_gemm(Rk, jnp.conj(inv_k).T)
        return jax.lax.dynamic_update_slice(X, Xk, (0, k0))

    X0 = jnp.zeros_like(B)
    return jax.lax.fori_loop(0, nblk, step, X0)


@functools.partial(jax.jit, static_argnames=('side', 'uplo', 'orientation', 'diag', 'blocksize'))
def Trsm(
    side: LeftOrRight,
    uplo: UpperOrLower,
    orientation: Orientation,
    diag: UnitOrNonUnit,
    alpha,
    A: DistMatrix,
    B: DistMatrix,
    blocksize: Optional[int] = None,
) -> DistMatrix:
    """Solve op(A) X = alpha B (LEFT) or X op(A) = alpha B (RIGHT)
    (reference: Trsm.cpp driver). Returns X as [MC,MR]."""
    check_same_grid(A, B)
    Ad = A.redistribute(MC, MR).data
    Bm = B.redistribute(MC, MR)
    nb = blocksize or Blocksize()
    unit = diag == UNIT
    lower = uplo == LOWER

    # materialise op(A); its triangle flips under transposition
    if orientation == NORMAL:
        T, tlower = Ad, lower
    elif orientation == TRANSPOSE:
        T, tlower = Ad.T, not lower
    elif orientation == ADJOINT:
        T, tlower = jnp.conj(Ad.T), not lower
    else:
        raise ValueError(orientation)

    if side == LEFT:
        T = _prep_triangle(T, A.m, tlower, unit)
        X = _left_solve(T, Bm.data * jnp.asarray(alpha, Bm.dtype), tlower, nb)
        out = Bm.with_data(X)
    elif side == RIGHT:
        # X op(A) = alpha B  <=>  op(A)^T X^T = alpha B^T
        Tt = _prep_triangle(T.T, A.m, not tlower, unit)
        Xt = _left_solve(Tt, Bm.data.T * jnp.asarray(alpha, Bm.dtype),
                         not tlower, nb)
        out = DistMatrix.from_padded(Xt.T, Bm.m, Bm.n, MC, MR, Bm.grid, Bm.wrap)
    else:
        raise ValueError(side)
    return out


def Trsv(uplo: UpperOrLower, orientation: Orientation, diag: UnitOrNonUnit,
         A: DistMatrix, x: DistMatrix) -> DistMatrix:
    """Triangular solve, single RHS (reference: src/blas_like/level2/Trsv)."""
    return Trsm(LEFT, uplo, orientation, diag, 1.0, A, x)
