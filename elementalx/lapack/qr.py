"""Distributed Householder QR.

Reference: src/lapack_like/factor/QR/ — blocked Householder panels
(PanelHouseholder.hpp) with compact-WY T matrices, applied via
ApplyPackedReflectors; column-pivoted BusingerGolub with norm
downdating; TSQR tall-skinny tree reduction (QR/TS.hpp:14-316);
Cholesky-QR; explicit Q formation.

TPU-native design: panels are factored with a fori_loop of masked
Householder steps on the full (padded, sharded) column — the per-column
norm is a psum XLA plans — and the trailing update is one compact-WY
triple matmul per panel on the MXU. TSQR reduces per-'mc'-shard local QRs
(XLA's on-device geqrf, the analogue of the reference's local LAPACK
call) with a gathered second-stage QR."""

from __future__ import annotations

import functools

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix, pad_array
from ..core.environment import Blocksize
from ..core.types import LOWER, MC, MR, STAR, UPPER
from ..blas.gemm import local_gemm
from ..blas.level1 import MakeTrapezoidal
from .perm import Permutation
from .reflect import (
    ApplyPackedReflectors,
    apply_block_reflector,
    build_wy_T,
    extract_panel_V,
    householder,
)


class QRFactorization(NamedTuple):
    """Packed result: R in the upper triangle of ``packed``; Householder
    vectors below the diagonal; tau per reflector (reference: El::qr
    returns householder-packed A plus t and d)."""

    packed: DistMatrix
    tau: jax.Array


def _panel_qr(a: jax.Array, tau: jax.Array, k0: int, nb: int, m: int
              ) -> Tuple[jax.Array, jax.Array]:
    """Unblocked Householder factorization of columns [k0, k0+nb)
    (reference: QR/PanelHouseholder.hpp). Runs on an extracted (M, nb)
    panel so each reflector application touches O(M*nb) memory, written
    back once."""
    M, N = a.shape
    panel = jax.lax.dynamic_slice(a, (0, k0), (M, nb))
    pcols = jax.lax.broadcasted_iota(jnp.int32, (nb,), 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)

    def col_step(j, carry):
        panel, tau = carry
        jc = k0 + j
        x = jax.lax.dynamic_index_in_dim(panel, j, axis=1, keepdims=False)
        v, tj, beta = householder(x, jc, m)
        tau = tau.at[jc].set(tj)
        # apply H to remaining panel columns (j+1 .. nb)
        Pm = jnp.where((pcols > j)[None, :], panel, jnp.zeros_like(panel))
        w = local_gemm(jnp.conj(v)[None, :], Pm)  # (1, nb)
        panel = panel - tj * jnp.outer(v, w[0])
        # store: beta at diagonal, v below, R part above untouched
        newcol = jnp.where(rows > jc, v, x)
        newcol = newcol.at[jc].set(beta)
        panel = jax.lax.dynamic_update_index_in_dim(
            panel, newcol[:, None], j, axis=1)
        return panel, tau

    panel, tau = jax.lax.fori_loop(0, nb, col_step, (panel, tau))
    a = jax.lax.dynamic_update_slice(a, panel, (0, k0))
    return a, tau


def _qr_packed(a: jax.Array, m: int, n: int, nb: int
               ) -> Tuple[jax.Array, jax.Array]:
    """Blocked Householder QR on the padded array."""
    M, N = a.shape
    ncols = min(m, n)
    nblk = (ncols + nb - 1) // nb
    tau0 = jnp.zeros((N,), a.dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)

    # python loop: nblk is static and panel widths vary at the tail
    tau = tau0
    for b in range(nblk):
        k0 = b * nb
        w = min(nb, ncols - k0)
        a, tau = _panel_qr(a, tau, k0, w, m)
        # trailing update with compact-WY (cols >= k0 + w)
        V = extract_panel_V(a, k0, w)
        t = jax.lax.dynamic_slice(tau, (k0,), (w,))
        T = build_wy_T(V, t)
        right = cols >= k0 + w
        Am = jnp.where(right[None, :], a, jnp.zeros_like(a))
        upd = apply_block_reflector(V, T, Am, adjoint=True)
        a = jnp.where(right[None, :], upd, a)
    return a, tau


@functools.partial(jax.jit, static_argnames=('blocksize',))
def QR(A: DistMatrix, blocksize: Optional[int] = None) -> QRFactorization:
    """Householder QR of an m x n matrix (reference: QR.cpp driver)."""
    Am = A.redistribute(MC, MR)
    nb = blocksize or Blocksize()
    a, tau = _qr_packed(Am.data, A.m, A.n, nb)
    return QRFactorization(Am.with_data(Am.mask_padding(a)), tau)


def ApplyQ(orientation_adjoint: bool, fact: QRFactorization, B: DistMatrix,
           blocksize: Optional[int] = None) -> DistMatrix:
    """B := Q B or Q^H B (reference: qr::ApplyQ via
    ApplyPackedReflectors)."""
    nb = blocksize or Blocksize()
    packed = fact.packed
    Bm = B.redistribute(MC, MR)
    ncols = min(packed.m, packed.n)
    out = ApplyPackedReflectors(packed.data, fact.tau, Bm.data, nb, ncols,
                                adjoint=orientation_adjoint)
    return Bm.with_data(Bm.mask_padding(out))


def ExplicitQR(A: DistMatrix, blocksize: Optional[int] = None,
               thin: bool = True) -> Tuple[DistMatrix, DistMatrix]:
    """(Q, R) with Q m x min(m,n) (thin) or m x m
    (reference: qr::Explicit)."""
    fact = QR(A, blocksize)
    packed = fact.packed
    m, n = packed.m, packed.n
    k = min(m, n)
    M = packed.data.shape[0]
    qcols = k if thin else m
    eye = jnp.eye(M, M, dtype=packed.data.dtype)
    nb = blocksize or Blocksize()
    Qfull = ApplyPackedReflectors(packed.data, fact.tau, eye, nb, k,
                                  adjoint=False)
    Qdm = DistMatrix.from_padded(
        jnp.where(jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) < qcols,
                  Qfull, jnp.zeros_like(Qfull)),
        m, qcols, MC, MR, packed.grid, packed.wrap)
    R = MakeTrapezoidal(UPPER, packed)
    if thin:
        from ..blas.level1 import GetSubmatrix

        R = GetSubmatrix(R, slice(0, k), slice(0, n))
    return Qdm, R


def CholeskyQR(A: DistMatrix) -> Tuple[DistMatrix, DistMatrix]:
    """Tall-skinny QR via A^H A = R^H R (reference: QR/Cholesky.hpp)."""
    from ..blas.gemm import Gemm
    from ..core.types import ADJOINT, LEFT, NON_UNIT, NORMAL, RIGHT
    from ..blas.trsm import Trsm
    from .cholesky import Cholesky

    G = Gemm(ADJOINT, NORMAL, 1.0, A, A)
    R = Cholesky(UPPER, G)
    Q = Trsm(RIGHT, UPPER, NORMAL, NON_UNIT, 1.0, R, A)
    return Q, R


def TSQR(A: DistMatrix) -> Tuple[DistMatrix, DistMatrix]:
    """Tall-skinny QR with a tree reduction over the 'mc' axis
    (reference: QR/TS.hpp:14-316). Stage 1: independent local QRs per row
    shard (on-device geqrf, the analogue of the reference's local LAPACK
    panel); stage 2: QR of the stacked R factors; Q reconstructed by one
    local matmul per shard."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    g = A.grid
    mesh = g.mesh
    Am = A.redistribute(MC, STAR)
    a = Am.data
    M, N = a.shape
    r = g.height

    def stage1(a_loc):
        q, rr = jnp.linalg.qr(a_loc, mode="reduced")  # (M/r, N), (N, N)
        return q, rr

    q1, r1 = shard_map(stage1, mesh=mesh,
                       in_specs=P("mc", None),
                       out_specs=(P("mc", None), P("mc", None)))(a)
    # r1 stacked: (r*N, N) distributed over 'mc'; second-stage QR
    q2, r2 = jnp.linalg.qr(r1.reshape(r * N, N), mode="reduced")

    def stage2(q1_loc, q2_loc):
        return local_gemm(q1_loc, q2_loc[0])

    q2r = q2.reshape(r, N, N)
    Qd = shard_map(stage2, mesh=mesh,
                   in_specs=(P("mc", None), P("mc", None, None)),
                   out_specs=P("mc", None))(q1, q2r)
    Qdm = DistMatrix.from_padded(Qd, A.m, A.n, MC, MR, g, A.wrap)
    Rpad = pad_array(r2, g)
    Rdm = DistMatrix.from_padded(Rpad, A.n, A.n, MC, MR, g, A.wrap)
    return Qdm, Rdm


def ColPivQR(A: DistMatrix, blocksize: Optional[int] = None
             ) -> Tuple[QRFactorization, Permutation]:
    """Column-pivoted (Businger-Golub) QR with greedy norm pivoting
    (reference: QR/BusingerGolub.hpp). Unblocked; each step is a masked
    argmax over downdated column norms + a rank-1 reflector update."""
    Am = A.redistribute(MC, MR)
    a = Am.data
    M, N = a.shape
    m, n = A.m, A.n
    k = min(m, n)
    tau0 = jnp.zeros((N,), a.dtype)
    perm0 = jnp.arange(N, dtype=jnp.int32)
    colsv = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
    rowsv = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)

    def step(j, carry):
        a, tau, perm = carry
        # column norms over active rows >= j, active cols [j, n)
        act_r = (rowsv >= j) & (rowsv < m)
        sq = jnp.sum(jnp.where(act_r[:, None], jnp.abs(a) ** 2,
                               jnp.zeros_like(jnp.abs(a))), axis=0)
        act_c = (colsv >= j) & (colsv < n)
        p = jnp.argmax(jnp.where(act_c, sq, -jnp.ones_like(sq))).astype(jnp.int32)
        # swap columns j <-> p (and perm entries)
        cj = jax.lax.dynamic_index_in_dim(a, j, axis=1, keepdims=False)
        cp = jax.lax.dynamic_index_in_dim(a, p, axis=1, keepdims=False)
        a = jax.lax.dynamic_update_index_in_dim(a, cp[:, None], j, axis=1)
        a = jax.lax.dynamic_update_index_in_dim(a, cj[:, None], p, axis=1)
        t = perm[j]
        perm = perm.at[j].set(perm[p]).at[p].set(t)
        # householder on column j
        x = jax.lax.dynamic_index_in_dim(a, j, axis=1, keepdims=False)
        v, tj, beta = householder(x, j, m)
        tau = tau.at[j].set(tj)
        right = colsv > j
        Amask = jnp.where(right[None, :], a, jnp.zeros_like(a))
        w = local_gemm(jnp.conj(v)[None, :], Amask)
        a = a - tj * jnp.outer(v, w[0])
        newcol = jnp.where(rowsv > j, v, x).at[j].set(beta)
        a = jax.lax.dynamic_update_index_in_dim(a, newcol[:, None], j, axis=1)
        return a, tau, perm

    a, tau, perm = jax.lax.fori_loop(0, k, step, (a, tau0, perm0))
    fact = QRFactorization(Am.with_data(Am.mask_padding(a)), tau)
    return fact, Permutation(perm, A.n)
