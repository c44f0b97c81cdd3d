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


def _inv_prec(dt):
    """Matmul precision for the accuracy-critical triangular inversions
    on f32/c64 carriers: HIGH (bf16x3, ~f32-grade) instead of the
    6-pass library-default HIGHEST — the inverses feed HIGH-or-lower
    panel matmuls, so the extra passes buy nothing (measured on the
    Cholesky/LU tails, PERF.md)."""
    return jax.lax.Precision.HIGH \
        if jnp.dtype(dt) in (jnp.float32, jnp.complex64) else None


def _batched_diag_inv(T: jax.Array, nb: int, nblk: int, lower: bool,
                      compute_dtype=None) -> jax.Array:
    """Batched inverses of the nb x nb diagonal blocks: log-depth
    batched partitioned inversion (blas/trinv.py) instead of XLA's
    substitution-lowered TriangularSolve. ``compute_dtype`` casts the
    sliced blocks up (for low-precision-storage T) without touching the
    rest of the matrix."""
    from .trinv import tri_inv_lower, tri_inv_upper

    ks = jnp.arange(nblk) * nb
    blocks = jax.vmap(
        lambda k0: jax.lax.dynamic_slice(T, (k0, k0), (nb, nb)))(ks)
    if compute_dtype is not None and blocks.dtype != compute_dtype:
        blocks = blocks.astype(compute_dtype)
    inv = tri_inv_lower if lower else tri_inv_upper
    prec = _inv_prec(blocks.dtype)
    return jax.vmap(lambda b: inv(b, precision=prec))(blocks)


def _left_solve(T: jax.Array, B: jax.Array, lower: bool, nb: int,
                precision=None, opcast=None) -> jax.Array:
    """Solve T X = B for triangular T (already prepped), blocked.

    Recursive halving (exact FLOPs, log-depth shape diversity): split
    T = [[T11, .], [T21, T22]]; X1 = solve(T11, B1), then
    X2 = solve(T22, B2 - T21 X1) — every off-diagonal update is one
    dense MXU matmul over exactly the strictly-lower (upper) part, so
    total work is the true M^2 N, unlike a full-width fori_loop sweep
    (2x). Base case = precomputed batched diagonal-block inverses.
    bf16/f16 storage solves through f32 (no low-precision XLA
    TriangularSolve) but runs its matmuls single-pass on the MXU
    (`precision=DEFAULT`): accumulation stays f32 while the operand
    truncation matches the bf16 storage accuracy already accepted."""
    if T.dtype in (jnp.bfloat16, jnp.float16):
        out = _left_solve(T.astype(jnp.float32), B.astype(jnp.float32),
                          lower, nb, precision=jax.lax.Precision.DEFAULT,
                          opcast=T.dtype)
        return out.astype(B.dtype)
    M = T.shape[0]
    # cap the block count: the axon tunnel's remote-compile payload
    # rejects very large unrolled graphs, and >32 sequential base steps
    # buys no MXU efficiency anyway
    nb = _pick_nb(M, max(nb, -(-M // 32)))
    nblk = M // nb
    tri_inv = _batched_diag_inv(T, nb, nblk, lower)
    acc = T.dtype

    def mm(a, b):
        # opcast (see _right_solve_adjoint_lower): bf16 operand reads at
        # half the HBM bytes, accumulation stays in the carrier dtype
        if opcast is not None:
            return jnp.matmul(a.astype(opcast), b.astype(opcast),
                              precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=acc)
        return local_gemm(a, b, precision=precision)

    def rec(k_lo: int, k_hi: int, Bp: jax.Array) -> jax.Array:
        if k_hi - k_lo == 1:
            return mm(tri_inv[k_lo], Bp)
        k_mid = (k_lo + k_hi) // 2
        lo0, mid0, hi0 = k_lo * nb, k_mid * nb, k_hi * nb
        if lower:
            X1 = rec(k_lo, k_mid, Bp[: mid0 - lo0])
            R2 = Bp[mid0 - lo0:] - mm(T[mid0:hi0, lo0:mid0], X1)
            X2 = rec(k_mid, k_hi, R2)
        else:
            X2 = rec(k_mid, k_hi, Bp[mid0 - lo0:])
            R1 = Bp[: mid0 - lo0] - mm(T[lo0:mid0, mid0:hi0], X2)
            X1 = rec(k_lo, k_mid, R1)
        return jnp.concatenate([X1, X2], axis=0)

    return rec(0, nblk, B)


def _right_solve_adjoint_lower(T: jax.Array, B: jax.Array, nb: int,
                               precision=None, opcast=None) -> jax.Array:
    """Solve X T^H = B for lower-triangular T (already prepped), i.e. a
    RIGHT solve against the upper-triangular T^H, without materialising
    any transpose of T or B: blocked partitioned-inverse substitution
    with each step one (P, M) @ (M, nb) MXU matmul. Used by the Cholesky
    recursion's L21 = A21 inv(L11)^H panels.

    ``opcast`` (e.g. bfloat16): cast every matmul OPERAND to that dtype
    while accumulating in the carrier dtype — numerically identical to
    DEFAULT matmul precision on f32 carriers (the MXU truncates operands
    to bf16 either way) but with half the operand HBM traffic, which is
    what sets the rate for these bandwidth-bound panel solves."""
    low_T = T.dtype in (jnp.bfloat16, jnp.float16)
    if low_T and B.dtype == T.dtype:
        out = _right_solve_adjoint_lower(
            T.astype(jnp.float32), B.astype(jnp.float32), nb,
            precision=jax.lax.Precision.DEFAULT, opcast=T.dtype)
        return out.astype(B.dtype)
    # mixed mode (low-precision T, f32 carrier B — the Cholesky
    # recursion reading factor blocks straight from its bf16 output
    # buffer): off-diagonal T slabs feed the DEFAULT-precision matmuls
    # directly at half the HBM bytes; only the nb x nb diagonal blocks
    # are cast up for the (accuracy-critical) batched inversion.
    if low_T:
        opcast = T.dtype
        precision = jax.lax.Precision.DEFAULT
    M = T.shape[0]
    nb = _pick_nb(M, max(nb, -(-M // 32)))
    nblk = M // nb
    acc = B.dtype
    tri_inv = _batched_diag_inv(T, nb, nblk, True,
                                compute_dtype=acc if low_T else None)

    def mm(a, b):
        if opcast is not None:
            return jnp.matmul(a.astype(opcast), b.astype(opcast),
                              precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=acc)
        return local_gemm(a, b, precision=precision)

    # recursive halving on column blocks of X (see _left_solve):
    # [X1 X2] [[T11,.],[T21,T22]]^H = [B1 B2] =>
    # X1 = B1 inv(T11)^H;  X2 = (B2 - X1 T21^H) inv(T22)^H
    def rec(k_lo: int, k_hi: int, Bp: jax.Array) -> jax.Array:
        if k_hi - k_lo == 1:
            return mm(Bp, jnp.conj(tri_inv[k_lo]).T)
        k_mid = (k_lo + k_hi) // 2
        lo0, mid0, hi0 = k_lo * nb, k_mid * nb, k_hi * nb
        X1 = rec(k_lo, k_mid, Bp[:, : mid0 - lo0])
        R2 = Bp[:, mid0 - lo0:] - mm(X1, jnp.conj(T[mid0:hi0, lo0:mid0]).T)
        X2 = rec(k_mid, k_hi, R2)
        return jnp.concatenate([X1, X2], axis=1)

    return rec(0, nblk, B)


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
