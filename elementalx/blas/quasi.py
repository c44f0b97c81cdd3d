"""Quasi-triangular solves (real Schur form support).

Reference: src/blas_like/level3/QuasiTrsm.cpp (+ QuasiTrsm/LLN.hpp etc.),
MultiShiftQuasiTrsm.cpp, SafeMultiShiftTrsm.cpp, Trstrm.cpp, and
src/blas_like/level2/QuasiTrsv. A quasi-triangular matrix is the real
Schur form: upper triangular plus isolated subdiagonal entries marking
standardized 2x2 blocks (no two adjacent).

TPU-native design — the Givens pre-elimination trick: because the 2x2
couplings are isolated, the subdiagonal can be eliminated by a family of
PAIRWISE-DISJOINT Givens rotations applied in ONE batched elementwise
pass: T = G R with G block-diagonal (2x2 rotations at coupling rows,
identity elsewhere) and R genuinely upper triangular. A quasi solve then
costs one banded elementwise pass plus one ordinary triangular solve
(blas/trsm.py's partitioned-inverse MXU path):

    T x = b        =>  x = R^{-1} (G^T b)
    T^T x = b      =>  x = G (R^{-T} b)

This replaces the reference's per-block substitution sweeps
(QuasiTrsm/LLN.hpp) with static-shape, fully-vectorized work — no
data-dependent control flow, so it jits and shards unchanged.
"""

from __future__ import annotations

import functools

from typing import Optional, Tuple

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
    NORMAL,
    Orientation,
    RIGHT,
    TRANSPOSE,
    UPPER,
    UpperOrLower,
)
from .trsm import _left_solve, _prep_triangle


def quasi_rotations(T: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(c, s) of the disjoint Givens family eliminating the subdiagonal
    of a quasi-upper-triangular (or, with complex entries, any upper-
    Hessenberg matrix with ISOLATED subdiagonal nonzeros): rotation k
    acts on rows (k, k+1) and zeroes T[k+1, k] against T[k, k];
    identity (c=1, s=0) where there is no coupling. Length M-1."""
    d = jnp.diagonal(T)
    sub = jnp.diagonal(T, -1)
    coup = sub != 0
    r = jnp.sqrt(jnp.abs(d[:-1]) ** 2 + jnp.abs(sub) ** 2)
    safe = jnp.where(coup, r, jnp.ones_like(r)).astype(T.dtype)
    c = jnp.where(coup, d[:-1] / safe, jnp.ones_like(safe))
    s = jnp.where(coup, sub / safe, jnp.zeros_like(safe))
    return c, s


def rot_rows(c: jax.Array, s: jax.Array, X: jax.Array) -> jax.Array:
    """Apply G^H to the rows of X: row k (coupling start) becomes
    conj(c) X[k] + conj(s) X[k+1]; row k+1 becomes -s X[k] + c X[k+1].
    One elementwise pass (all rotations disjoint). G^H T is upper
    triangular when (c, s) = quasi_rotations(T)."""
    one = jnp.ones((1,), c.dtype)
    zero = jnp.zeros((1,), s.dtype)
    cs = jnp.concatenate([c, one])         # start coeff at row k
    sn = jnp.concatenate([s, zero])
    cs_prev = jnp.concatenate([one, c])    # end coeff at row k (from k-1)
    sn_prev = jnp.concatenate([zero, s])
    start = sn != 0
    end = sn_prev != 0
    up = jnp.concatenate([X[1:], jnp.zeros_like(X[:1])], axis=0)
    dn = jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], axis=0)
    zc = jnp.zeros((), c.dtype)
    diag_c = jnp.where(start, jnp.conj(cs),
                       jnp.where(end, cs_prev, one[0]))
    return (diag_c[:, None] * X
            + jnp.where(start, jnp.conj(sn), zc)[:, None] * up
            - jnp.where(end, sn_prev, zc)[:, None] * dn)


def rot_rows_inv(c: jax.Array, s: jax.Array, X: jax.Array) -> jax.Array:
    """Apply G (the inverse of rot_rows) to the rows of X: row k becomes
    c X[k] - conj(s) X[k+1]; row k+1 becomes s X[k] + conj(c) X[k+1]."""
    one = jnp.ones((1,), c.dtype)
    zero = jnp.zeros((1,), s.dtype)
    cs = jnp.concatenate([c, one])
    sn = jnp.concatenate([s, zero])
    cs_prev = jnp.concatenate([one, c])
    sn_prev = jnp.concatenate([zero, s])
    start = sn != 0
    end = sn_prev != 0
    up = jnp.concatenate([X[1:], jnp.zeros_like(X[:1])], axis=0)
    dn = jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], axis=0)
    zc = jnp.zeros((), c.dtype)
    diag_c = jnp.where(start, cs, jnp.where(end, jnp.conj(cs_prev), one[0]))
    return (diag_c[:, None] * X
            - jnp.where(start, jnp.conj(sn), zc)[:, None] * up
            + jnp.where(end, sn_prev, zc)[:, None] * dn)


def _quasi_factor(T: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """T = G R: returns (c, s, R) with R exactly upper triangular."""
    c, s = quasi_rotations(T)
    R = rot_rows(c, s, T)
    M = R.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    R = jnp.where(j >= i, R, jnp.zeros((), R.dtype))
    return c, s, R


def _flip_idx(M: int, m: int) -> jax.Array:
    """Index vector reversing the LOGICAL range [0, m) while leaving the
    padding rows [m, M) in place."""
    idx = jnp.arange(M)
    return jnp.where(idx < m, m - 1 - idx, idx)


def _quasi_upper_solve(T: jax.Array, B: jax.Array, nb: int,
                       transpose: bool) -> jax.Array:
    """Solve T X = B (or T^T X = B) for quasi-UPPER-triangular T."""
    c, s, R = _quasi_factor(T)
    if not transpose:
        return _left_solve(R, rot_rows(c, s, B), lower=False, nb=nb)
    Y = _left_solve(R.T, B, lower=True, nb=nb)
    return rot_rows_inv(c, s, Y)


@functools.partial(jax.jit, static_argnames=(
    'side', 'uplo', 'orientation', 'blocksize'))
def QuasiTrsm(side: LeftOrRight, uplo: UpperOrLower,
              orientation: Orientation, alpha, A: DistMatrix,
              B: DistMatrix, blocksize: Optional[int] = None
              ) -> DistMatrix:
    """Solve op(A) X = alpha B (LEFT) or X op(A) = alpha B (RIGHT) for
    quasi-triangular A (real Schur form; reference: QuasiTrsm.cpp).
    ADJOINT coincides with TRANSPOSE for the real forms."""
    check_same_grid(A, B)
    Ad = A.redistribute(MC, MR).data
    Bm = B.redistribute(MC, MR)
    nb = blocksize or Blocksize()
    Bd = Bm.data * jnp.asarray(alpha, Bm.dtype)
    if orientation == ADJOINT:
        orientation = TRANSPOSE  # real quasi forms
    transpose = orientation == TRANSPOSE

    if side == RIGHT:
        # X op(A) = B  <=>  op(A)^T X^T = B^T
        Xt = QuasiTrsm(LEFT, uplo,
                       NORMAL if transpose else TRANSPOSE, 1.0,
                       A, DistMatrix.from_padded(
                           Bd.T, B.n, B.m, MC, MR, B.grid, B.wrap),
                       blocksize)
        return DistMatrix.from_padded(Xt.data.T, B.m, B.n, MC, MR,
                                      B.grid, B.wrap)

    # normalise to the quasi-UPPER case via the exchange flip:
    # J T J is quasi-upper when T is quasi-lower, and
    # (J T J)(J X) = J B  <=>  T X = B  (J reverses the LOGICAL range
    # only — the padding region stays trailing)
    m = A.m
    M = Ad.shape[0]
    if uplo == LOWER:
        fl = _flip_idx(M, m)
        Tq = _prep_quasi(Ad[fl][:, fl], m, M)
        X = _quasi_upper_solve(Tq, Bd[fl], nb, transpose)[fl]
    else:
        Tq = _prep_quasi(Ad, m, M)
        X = _quasi_upper_solve(Tq, Bd, nb, transpose)
    return Bm.with_data(X.astype(Bm.dtype))


def _prep_quasi(T: jax.Array, m: int, M: int) -> jax.Array:
    """Mask to the quasi-upper band (upper triangle + subdiagonal), set
    the padding diagonal (rows >= m) to 1 and padding subdiagonal to 0."""
    i = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    keep = j >= i - 1
    T = jnp.where(keep, T, jnp.zeros((), T.dtype))
    diag = i == j
    T = jnp.where(diag & (i >= m), jnp.ones((), T.dtype), T)
    subpad = (j == i - 1) & (i >= m)
    return jnp.where(subpad, jnp.zeros((), T.dtype), T)


def QuasiTrsv(uplo: UpperOrLower, orientation: Orientation, A: DistMatrix,
              x: DistMatrix) -> DistMatrix:
    """Quasi-triangular solve, single RHS
    (reference: src/blas_like/level2/QuasiTrsv)."""
    return QuasiTrsm(LEFT, uplo, orientation, 1.0, A, x)


@functools.partial(jax.jit, static_argnames=('side', 'uplo', 'orientation'))
def MultiShiftQuasiTrsm(side: LeftOrRight, uplo: UpperOrLower,
                        orientation: Orientation, alpha, T: DistMatrix,
                        shifts: jax.Array, B: DistMatrix) -> DistMatrix:
    """Solve (op(T) - shifts[j] I) X[:, j] = alpha B[:, j] per column for
    quasi-triangular T and REAL shifts (reference:
    MultiShiftQuasiTrsm.cpp). Each shifted matrix keeps the same coupling
    structure, so the Givens pre-elimination vmaps over the shifts; the
    per-column triangular solves batch on the device. Complex shifts on
    real T are handled by ``MultiShiftQuasiTrsmPairs`` (split real/imag
    planes)."""
    if side != LEFT:
        # X[j,:] (op(T) - s_j) = alpha B[j,:]  <=>
        # (op(T)^T - s_j) X[j,:]^T = alpha B[j,:]^T — a LEFT solve with
        # the orientation flipped and B transposed (real quasi forms:
        # ADJOINT == TRANSPOSE)
        from .level1 import Transpose

        flip = {NORMAL: TRANSPOSE, TRANSPOSE: NORMAL, ADJOINT: NORMAL}
        Xt = MultiShiftQuasiTrsm(LEFT, uplo, flip[orientation], alpha,
                                 T, shifts, Transpose(B))
        return Transpose(Xt)
    Td = T.replicated()
    m = T.m
    M = Td.shape[0]
    lower = uplo == LOWER
    if orientation in (TRANSPOSE, ADJOINT):
        transpose = True
    else:
        transpose = False
    Bd = B.replicated() * jnp.asarray(alpha, B.dtype)
    sh = jnp.asarray(shifts).astype(Td.dtype)
    nshift = sh.shape[0]

    fl = _flip_idx(M, m)
    Tq0 = Td[fl][:, fl] if lower else Td

    cols = Bd[:, :nshift]
    if lower:
        cols = cols[fl, :]
    # blocked backward-substitution engine (O(nshift * nb^2) transient
    # memory instead of a full (M, M) matrix per shift)
    from .multishift import ms_quasi_upper

    X = ms_quasi_upper(Tq0, m, sh, cols, Blocksize(), transpose)
    if lower:
        X = X[fl, :]
    out = Bd.at[:, :nshift].set(X)
    return DistMatrix.from_padded(out, B.m, B.n, MC, MR, B.grid, B.wrap)


@functools.partial(jax.jit, static_argnames=('side', 'uplo', 'orientation'))
def SafeMultiShiftTrsm(side: LeftOrRight, uplo: UpperOrLower,
                       orientation: Orientation, alpha, T: DistMatrix,
                       shifts: jax.Array, B: DistMatrix
                       ) -> Tuple[DistMatrix, jax.Array]:
    """Overflow-guarded multi-shift triangular solve (reference:
    SafeMultiShiftTrsm.cpp, the zlatrs role for TriangEig): returns
    (X, scales) with (op(T) - shifts[j]) X[:, j] = scales[j] alpha
    B[:, j]. Each column is pre-normalised and the shifted diagonal is
    regularised at the underflow-safe floor, so near-singular shifts
    produce large-but-finite vectors instead of Inf/NaN."""
    if side != LEFT:
        # same transpose reduction as MultiShiftQuasiTrsm; the per-shift
        # scales are invariant under transposition
        from .level1 import Transpose

        flip = {NORMAL: TRANSPOSE, TRANSPOSE: NORMAL, ADJOINT: NORMAL}
        if orientation == ADJOINT:
            Tm = T.redistribute(MC, MR)
            Tc = Tm.with_data(jnp.conj(Tm.data))
            Xt, scales = SafeMultiShiftTrsm(
                LEFT, uplo, NORMAL, alpha, Tc, shifts, Transpose(B))
            return Transpose(Xt), scales
        Xt, scales = SafeMultiShiftTrsm(LEFT, uplo, flip[orientation],
                                        alpha, T, shifts, Transpose(B))
        return Transpose(Xt), scales
    Td = T.replicated()
    m = T.m
    M = Td.shape[0]
    lower = uplo == LOWER
    if orientation == TRANSPOSE:
        Td, lower = Td.T, not lower
    elif orientation == ADJOINT:
        Td, lower = jnp.conj(Td.T), not lower
    Bd = B.replicated() * jnp.asarray(alpha, B.dtype)
    sh = jnp.asarray(shifts).astype(Td.dtype)
    nshift = sh.shape[0]
    # near-singularity floor: smin ~ eps * |T|_max
    rdt = jnp.finfo(Td.dtype)
    tmax = jnp.maximum(jnp.max(jnp.abs(Td)), 1.0)
    smin = rdt.eps * tmax

    cols = Bd[:, :nshift]
    bnorm = jnp.max(jnp.abs(cols), axis=0)
    scales = jnp.where(bnorm > 0, 1.0 / jnp.maximum(bnorm, rdt.tiny), 1.0)
    rhs = cols * scales.astype(Bd.dtype)[None, :]

    # blocked engine (upper core; lower forms flip): per window only an
    # (nshift, nb, nb) shifted-diagonal batch is materialized
    from .multishift import ms_blocked_upper

    if lower:
        fl = _flip_idx(M, m)
        Tu = Td[fl][:, fl]
        X = ms_blocked_upper(Tu, sh, rhs[fl], Blocksize(), smin=smin,
                             mrows=m)[fl]
    else:
        X = ms_blocked_upper(Td, sh, rhs, Blocksize(), smin=smin, mrows=m)
    out = Bd.at[:, :nshift].set(X)
    Xdm = DistMatrix.from_padded(out, B.m, B.n, MC, MR, B.grid, B.wrap)
    return Xdm, scales


@functools.partial(jax.jit, static_argnames=('side', 'uplo', 'orientation'))
def SafeMultiShiftQuasiTrsm(side: LeftOrRight, uplo: UpperOrLower,
                            orientation: Orientation, alpha, T: DistMatrix,
                            shifts: jax.Array, B: DistMatrix
                            ) -> Tuple[DistMatrix, jax.Array]:
    """Overflow-guarded real-shift quasi-triangular multi-shift solve
    (reference: SafeMultiShiftTrsm.cpp applied to the quasi form)."""
    if side != LEFT:
        from .level1 import Transpose

        flip = {NORMAL: TRANSPOSE, TRANSPOSE: NORMAL, ADJOINT: NORMAL}
        Xt, scales = SafeMultiShiftQuasiTrsm(
            LEFT, uplo, flip[orientation], alpha, T, shifts,
            Transpose(B))
        return Transpose(Xt), scales
    Td = T.replicated()
    m = T.m
    M = Td.shape[0]
    lower = uplo == LOWER
    transpose = orientation in (TRANSPOSE, ADJOINT)
    Bd = B.replicated() * jnp.asarray(alpha, B.dtype)
    sh = jnp.asarray(shifts).astype(Td.dtype)
    nshift = sh.shape[0]
    rdt = jnp.finfo(Td.dtype)
    tmax = jnp.maximum(jnp.max(jnp.abs(Td)), 1.0)
    smin = rdt.eps * tmax
    fl = _flip_idx(M, m)
    Tq0 = Td[fl][:, fl] if lower else Td

    cols = Bd[:, :nshift]
    if lower:
        cols = cols[fl, :]
    bnorm = jnp.max(jnp.abs(cols), axis=0)
    scales = jnp.where(bnorm > 0, 1.0 / jnp.maximum(bnorm, rdt.tiny), 1.0)
    rhs = cols * scales.astype(Bd.dtype)[None, :]

    # blocked engine: the R-diagonal floor is applied per window (the
    # G-elimination concentrates any near-singularity on R's diagonal)
    from .multishift import ms_quasi_upper

    X = ms_quasi_upper(Tq0, m, sh, rhs, Blocksize(), transpose, smin=smin)
    if lower:
        X = X[fl, :]
    out = Bd.at[:, :nshift].set(X)
    Xdm = DistMatrix.from_padded(out, B.m, B.n, MC, MR, B.grid, B.wrap)
    return Xdm, scales


def Trstrm(side: LeftOrRight, uplo: UpperOrLower,
           orientation: Orientation, diag, alpha, A: DistMatrix,
           B: DistMatrix) -> DistMatrix:
    """Solve op(A) X = alpha B where B and X are triangular of the same
    uplo as A (reference: level3/Trstrm.cpp — currently LLN there). The
    reference exploits the triangular RHS to halve the work; on the MXU
    a full-width solve plus a triangle mask is the faster schedule (the
    masked half of the solve rides along free in the same matmuls)."""
    from .trsm import Trsm
    from .level1 import MakeTrapezoidal

    X = Trsm(side, uplo, orientation, diag, alpha, A, B)
    return MakeTrapezoidal(uplo, X)
