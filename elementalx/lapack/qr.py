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
from ..blas.gemm import hot_precision, local_gemm
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


_QR_INNER = 16

# CholeskyQR2 panels take over from geqrf at this width for f32/bf16
# (the geqrf custom call costs ~1 ms per (16384, 256) panel — an
# effective ~1.2 TF/s that scales with panel AREA; the cholqr panel is
# 4 tall MXU matmuls + 256^2-sized tails). Measured at 16384 f32
# (scratch/ab_qr3.py): geqrf-panel QR 210.7 ms -> cholqr 146.4 ms.
_CHOLQR_MIN_NB = 192
# square-ish trailing corners are exactly where cond(panel) blows up
# the CholeskyQR predicate, and their geqrf area is small — skip them
_CHOLQR_MIN_ASPECT = 4


def _use_cholqr_panels(dtype, nb: int) -> bool:
    import os

    if os.environ.get("ELEMENTALX_QR_PANEL", "") == "geqrf":
        return False
    return dtype in (jnp.float32, jnp.bfloat16) and nb >= _CHOLQR_MIN_NB


def _geqrf_slab(s32: jax.Array, nb: int
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """geqrf of an (Mt, nb) slice -> (packed slab, tau, T)."""
    from jax._src.lax.linalg import geqrf

    pk, tnew = geqrf(s32)
    r2 = jax.lax.broadcasted_iota(jnp.int32, pk.shape, 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, pk.shape, 1)
    V = jnp.where(r2 > c2, pk, jnp.zeros_like(pk))
    V = jnp.where(r2 == c2, jnp.ones((), pk.dtype), V)
    return pk, tnew, build_wy_T(V, tnew)


def _panel_cholqr(a: jax.Array, tau: jax.Array, k0: int, nb: int, m: int
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """MXU-bound panel: CholeskyQR2 + Householder reconstruction.

    Reference semantics: QR/PanelHouseholder.hpp (the panel contract is
    identical to _panel_qr's). TPU-native scheme (TSQR-HR, Ballard et
    al. IPDPS'14; CholeskyQR2, Yamamoto et al.):

      1. G1 = A1^T A1 (HIGHEST); R1 = chol(G1 + shift); Q1 = A1 R1^{-1}
      2. G2 = Q1^T Q1 (HIGHEST); R2 = chol(G2); R = R2 R1
      3. reconstruction: with the sign scaling S (s_i = -sign(q_ii)),
         the no-pivot LU  Q S - E1 = V W  gives the unit-lower V whose
         reflectors reproduce Q: (I - V T V^H) E1 = Q S with
         T = -W V1^{-H} and tau_i = -W_ii.  V2 needs no explicit tall
         Q:  V2 = Q1[b:] @ (R2^{-1} S W^{-1})  — one fused matmul.
         The b x b LU is the pivoted XLA custom call on a matrix whose
         diagonal sits in [-2,-1] with off-diag <= 1, so the identity
         permutation wins generically; the predicate checks it.

    Every tall op is a b-wide MXU matmul (Grams at HIGHEST, products at
    HIGH). A runtime predicate (pass-1 orthogonality < 0.25, identity
    LU pivots, finite results, tau in the Householder range) routes
    ill-conditioned panels to the geqrf slab inside a lax.cond whose
    carry is only the (Mt, b) slab — NOT the full matrix. Returns
    (a, tau, T) with T the compact-WY factor of this panel (free here;
    the generic path would re-derive it from a tall Gram)."""
    from ..blas.trinv import tri_inv_lower_unit, tri_inv_upper

    M, N = a.shape
    Mt = M - k0
    HI = jax.lax.Precision.HIGHEST
    H3 = jax.lax.Precision.HIGH
    sl = jax.lax.dynamic_slice(a, (k0, k0), (Mt, nb))
    low = a.dtype in (jnp.bfloat16, jnp.float16)
    s32 = sl.astype(jnp.float32) if low else sl

    if Mt < _CHOLQR_MIN_ASPECT * nb:
        pk, tnew, T = _geqrf_slab(s32, nb)
    else:
        eps = jnp.finfo(jnp.float32).eps
        eye = jnp.eye(nb, dtype=jnp.float32)
        G1 = local_gemm(s32.T, s32, precision=HI)
        shift = (100.0 * nb * eps) * jnp.max(jnp.abs(jnp.diag(G1)))
        R1 = jax.lax.linalg.cholesky(G1 + shift * eye).T
        Q1 = local_gemm(s32, tri_inv_upper(R1), precision=H3)
        G2 = local_gemm(Q1.T, Q1, precision=HI)
        ortho_err = jnp.max(jnp.abs(G2 - eye))
        R2 = jax.lax.linalg.cholesky(G2).T
        R2inv = tri_inv_upper(R2)
        R = jnp.triu(local_gemm(R2, R1))
        Q_top = local_gemm(Q1[:nb, :], R2inv)
        qd = jnp.diag(Q_top)
        s = jnp.where(qd >= 0, -jnp.ones_like(qd), jnp.ones_like(qd))
        B1 = Q_top * s[None, :] - eye
        lu1, _, lperm = jax.lax.linalg.lu(B1)
        ident = jnp.all(lperm == jnp.arange(nb, dtype=lperm.dtype))
        r2 = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
        W = jnp.where(r2 <= c2, lu1, jnp.zeros_like(lu1))
        V1 = jnp.where(r2 > c2, lu1, jnp.zeros_like(lu1))
        tau_new = -jnp.diag(W)
        C = local_gemm(R2inv * s[None, :], tri_inv_upper(W))
        V2 = local_gemm(Q1[nb:, :], C, precision=H3)
        Rt = s[:, None] * R
        ok = (ortho_err < 0.25) & ident & jnp.all(jnp.isfinite(Rt)) \
            & jnp.all(jnp.isfinite(V2)) \
            & jnp.all(jnp.abs(tau_new) > 0.5)
        top = jnp.where(r2 > c2, V1, Rt)
        packed_fast = jnp.concatenate([top, V2], axis=0)
        V1u = jnp.where(r2 == c2, jnp.ones((), s32.dtype), V1)
        T_fast = -local_gemm(W, jnp.conj(tri_inv_lower_unit(V1u)).T)

        def fast(s32):
            return packed_fast, tau_new, T_fast

        def slow(s32):
            return _geqrf_slab(s32, nb)

        pk, tnew, T = jax.lax.cond(ok, fast, slow, s32)

    if low:
        pk = pk.astype(a.dtype)
        T = T.astype(a.dtype)
    a = jax.lax.dynamic_update_slice(a, pk, (k0, k0))
    tau = jax.lax.dynamic_update_slice(tau, tnew.astype(tau.dtype), (k0,))
    return a, tau, T


def _panel_qr(a: jax.Array, tau: jax.Array, k0: int, nb: int, m: int
              ) -> Tuple[jax.Array, jax.Array]:
    """Householder factorization of columns [k0, k0+nb) (reference:
    QR/PanelHouseholder.hpp). The panel is XLA's native geqrf on the
    static row slice [k0, M) — the exact analogue of the reference
    calling the vendor LAPACK on local panels (SURVEY §2.6: Fortran
    shims -> XLA ops); the sequential Householder column loop is
    latency-bound on TPU and XLA's composite runs it ~50x faster than
    an op-by-op fori_loop (measured: sub-ms per (8192,128) panel vs
    ~25 us/column). Output layout and (v, tau) convention match ours
    (v below the diagonal, unit-implicit, H = I - tau v v^H). Padding
    rows (>= m) hold zeros so they contribute nothing to the reflector
    norms. Falls back to the masked two-level loop if geqrf is
    unavailable."""
    try:
        from jax._src.lax.linalg import geqrf
    except ImportError:      # pragma: no cover - geqrf moved/renamed
        return _panel_qr_loop(a, tau, k0, nb, m)
    M, N = a.shape
    low = a.dtype in (jnp.bfloat16, jnp.float16)
    sl = jax.lax.dynamic_slice(a, (k0, k0), (M - k0, nb))
    pk, tnew = geqrf(sl.astype(jnp.float32) if low else sl)
    if low:
        pk = pk.astype(a.dtype)
        tnew = tnew.astype(a.dtype)
    a = jax.lax.dynamic_update_slice(a, pk, (k0, k0))
    tau = jax.lax.dynamic_update_slice(tau, tnew, (k0,))
    return a, tau


def _panel_qr_loop(a: jax.Array, tau: jax.Array, k0: int, nb: int, m: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Two-level blocked fallback panel: a fori_loop over inner blocks of
    width `ib`, each an unblocked pass on an (M, ib) sub-slice followed
    by one compact-WY application to the rest of the panel."""
    M, N = a.shape
    panel = jax.lax.dynamic_slice(a, (0, k0), (M, nb))
    ib = _QR_INNER if nb % _QR_INNER == 0 else nb
    nib = nb // ib
    rows = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    pcols = jax.lax.broadcasted_iota(jnp.int32, (nb,), 0)
    scols = jax.lax.broadcasted_iota(jnp.int32, (ib,), 0)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (M, ib), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (M, ib), 1)

    def inner_block(t, carry):
        panel, tau = carry
        j0 = t * ib
        sub = jax.lax.dynamic_slice(panel, (0, j0), (M, ib))

        def col_step(j, carry2):
            sub, tau = carry2
            jc = k0 + j0 + j
            x = jax.lax.dynamic_index_in_dim(sub, j, axis=1, keepdims=False)
            v, tj, beta = householder(x, jc, m)
            tau = tau.at[jc].set(tj)
            Pm = jnp.where((scols > j)[None, :], sub, jnp.zeros_like(sub))
            wv = local_gemm(jnp.conj(v)[None, :], Pm)  # (1, ib)
            sub = sub - tj * jnp.outer(v, wv[0])
            newcol = jnp.where(rows > jc, v, x)
            newcol = newcol.at[jc].set(beta)
            sub = jax.lax.dynamic_update_index_in_dim(
                sub, newcol[:, None], j, axis=1)
            return sub, tau

        sub, tau = jax.lax.fori_loop(0, ib, col_step, (sub, tau))
        panel = jax.lax.dynamic_update_slice(panel, sub, (0, j0))
        # compact-WY application of this block to the rest of the panel
        gcols = cols2 + (k0 + j0)
        V = jnp.where(rows2 > gcols, sub, jnp.zeros_like(sub))
        V = jnp.where(rows2 == gcols, jnp.ones((), sub.dtype), V)
        tb = jax.lax.dynamic_slice(tau, (k0 + j0,), (ib,))
        T = build_wy_T(V, tb)
        right = (pcols >= j0 + ib)[None, :]
        Am = jnp.where(right, panel, jnp.zeros_like(panel))
        upd = apply_block_reflector(V, T, Am, adjoint=True)
        panel = jnp.where(right, upd, panel)
        return panel, tau

    panel, tau = jax.lax.fori_loop(0, nib, inner_block, (panel, tau))
    a = jax.lax.dynamic_update_slice(a, panel, (0, k0))
    return a, tau


def _qr_packed(a: jax.Array, m: int, n: int, nb: int
               ) -> Tuple[jax.Array, jax.Array]:
    """Blocked Householder QR on the padded array."""
    M, N = a.shape
    ncols = min(m, n)
    tau0 = jnp.zeros((N,), a.dtype)

    # python loop: k0 is static, so the compact-WY trailing update runs
    # on the exact (M-k0, N-k0-w) static slice — no wasted full-size
    # masked matmuls. Panel width stays UNIFORM at nb: although XLA's
    # geqrf composite has a cost cliff above ~8k rows ((16384,256):
    # 2.33 ms vs (16384,128): 0.74 — scratch/prof_geqrf.py), halving the
    # width in the tall region measured SLOWER end-to-end (284.8 vs
    # 208.8 ms at 16384 f32): every extra panel pays a (M-k0)x(N-k0)
    # strided trailing-slice materialisation + writeback, which swamps
    # the geqrf saving.
    tau = tau0
    cholqr = _use_cholqr_panels(a.dtype, nb)
    k0 = 0
    while k0 < ncols:
        w = min(nb, ncols - k0)
        T = None
        if cholqr and w >= _CHOLQR_MIN_NB:
            a, tau, T = _panel_cholqr(a, tau, k0, w, m)
        else:
            a, tau = _panel_qr(a, tau, k0, w, m)
        if k0 + w >= N:
            k0 += w
            continue
        sl = a[k0:, k0:k0 + w]
        r2 = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 1)
        V = jnp.where(r2 > c2, sl, jnp.zeros_like(sl))
        V = jnp.where(r2 == c2, jnp.ones((), a.dtype), V)
        if T is None:
            t = jax.lax.dynamic_slice(tau, (k0,), (w,))
            T = build_wy_T(V, t)
        Asub = a[k0:, k0 + w:]
        upd = apply_block_reflector(V, T, Asub, adjoint=True,
                                    precision=hot_precision(a.dtype))
        a = jax.lax.dynamic_update_slice(a, upd, (k0, k0 + w))
        k0 += w
    return a, tau


@functools.partial(jax.jit, static_argnames=('blocksize',))
def QR(A: DistMatrix, blocksize: Optional[int] = None) -> QRFactorization:
    """Householder QR of an m x n matrix (reference: QR.cpp driver)."""
    Am = A.redistribute(MC, MR)
    nb = blocksize or Blocksize()
    if blocksize is None and A.grid.size == 1 and min(A.m, A.n) >= 2048:
        # v5e measurements (PERF.md): 8192 f32 43.8 ms at nb=256 vs
        # 49.8 ms at nb=128; with cholqr panels the 16384 knee moves to
        # nb=512 (146.4 ms vs 168.9 at 256 — scratch/ab_qr3.py)
        nb = max(nb, 512 if (min(A.m, A.n) >= 8192
                             and _use_cholqr_panels(Am.dtype, 512))
                 else 256)
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
