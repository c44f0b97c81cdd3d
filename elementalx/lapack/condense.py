"""Condensed-form reductions: HermitianTridiag, Bidiag, Hessenberg.

Reference: src/lapack_like/condense/ (SURVEY §2.4): HermitianTridiag
(blocked Householder, symv-heavy panels, square-subgrid specialization
HermitianTridiag.cpp:82-116), Bidiag (Golub-Kahan, for SVD), Hessenberg
(for Schur).

TPU-native design: the LAPACK latrd-style blocked panel — each panel
column costs one full-size Hermitian matvec (bandwidth-bound, psum over
the mesh) and the trailing two-sided update is a pair of full MXU
matmuls (A -= V W^H + W V^H). The reference's square-subgrid trick
exists to balance MPI symv cost; XLA's sharding propagation plays that
role here. (Two-stage band reduction is the known further speedup —
future work, noted in SURVEY §7.)"""

from __future__ import annotations

import functools

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.environment import Blocksize
from ..core.types import LOWER, MC, MR, UPPER, UpperOrLower
from ..blas.gemm import local_gemm
from ..blas.level1 import MakeHermitian
from .reflect import ApplyPackedReflectors, householder


class TridiagFactorization(NamedTuple):
    """packed: reflectors below the first subdiagonal; d, e: the REAL
    tridiagonal; tau: reflector scalars; phase: the diagonal unitary D
    that absorbs complex subdiagonal phases (A = (QD) T (QD)^H — the
    reference's 'd' phase-vector idiom)."""

    packed: DistMatrix
    d: jax.Array
    e: jax.Array
    tau: jax.Array
    phase: jax.Array


def _tridiag_panel(a0, at, V, W, tau, k0, nb, m_loc):
    """latrd-style panel on the TRAILING block: ``at`` is the
    (M-k0, M-k0) trailing slice (local indices; the panel columns are
    local 0..nb); the trailing matrix is a0[k0:, k0:] - V W^H - W V^H
    with the stored V/W (masked by column). Confining the per-column
    Hermitian matvec — the reduction's HBM bound — to the trailing
    block cuts the total matvec traffic from n*n^2 to ~n^3/3 (PERF.md);
    this is the algorithm's bandwidth roofline. (A Pallas lower-triangle
    symv, kernels/symv.py, halves the theoretical traffic but measured
    2.4x SLOWER at this per-column grain — ~8k kernel launches of 36
    grid steps each; kept as a library primitive only.) ``a0`` is the
    FULL frozen array; ``tau`` stays globally indexed."""
    Mt = at.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Mt,), 0)
    colsM = jax.lax.broadcasted_iota(jnp.int32, (Mt, V.shape[1]), 1)

    def col_step(j, carry):
        at, V, W, tau = carry
        colmask = colsM < j  # previously-built panel columns
        Vp = jnp.where(colmask, V, jnp.zeros_like(V))
        Wp = jnp.where(colmask, W, jnp.zeros_like(W))
        acol = jax.lax.dynamic_index_in_dim(at, j, axis=1, keepdims=False)
        vrow = jax.lax.dynamic_index_in_dim(V, j, axis=0, keepdims=False)
        wrow = jax.lax.dynamic_index_in_dim(W, j, axis=0, keepdims=False)
        vrow = jnp.where(colmask[0], vrow, jnp.zeros_like(vrow))
        wrow = jnp.where(colmask[0], wrow, jnp.zeros_like(wrow))
        # current column of the updated trailing matrix
        acur = acol - Vp @ jnp.conj(wrow) - Wp @ jnp.conj(vrow)
        v, tj, beta = householder(acur, j + 1, m_loc)
        tau = tau.at[k0 + j].set(tj)
        # store the column: diagonal entry, beta at subdiagonal, v below
        newcol = jnp.where(rows > j + 1, v, acur)
        newcol = jnp.where(rows == j + 1, beta, newcol)
        at = jax.lax.dynamic_update_index_in_dim(at, newcol[:, None], j,
                                                 axis=1)
        # w = tau A_cur v - (|tau|^2/2)(v^H A_cur v) v  — the exact rank-2
        # form of the unitary similarity H^H A H with complex tau
        Av = a0[k0:, k0:] @ v
        p = tj * (Av - Vp @ (jnp.conj(Wp.T) @ v) - Wp @ (jnp.conj(Vp.T) @ v))
        w = p - (jnp.conj(tj) * 0.5 * jnp.vdot(v, p)) * v
        V = V.at[:, j].set(v)
        W = W.at[:, j].set(w)
        return at, V, W, tau

    return jax.lax.fori_loop(0, nb, col_step, (at, V, W, tau))


@functools.partial(jax.jit, static_argnames=('uplo', 'blocksize'))
def HermitianTridiag(uplo: UpperOrLower, A: DistMatrix,
                     blocksize: Optional[int] = None
                     ) -> TridiagFactorization:
    """Reduce a Hermitian matrix to real symmetric tridiagonal form,
    A = Q T Q^H (reference: condense/HermitianTridiag.cpp:60-130, lower
    variant; the uplo=UPPER case is normalised through the lower path)."""
    nb = blocksize or Blocksize()
    Af = MakeHermitian(uplo, A.redistribute(MC, MR))
    a = Af.data
    M = a.shape[0]
    m = A.m
    ncols = max(m - 2, 0)
    nblk = (ncols + nb - 1) // nb if ncols else 0
    tau = jnp.zeros((M,), a.dtype)

    # panel-fused Pallas latrd (kernels/latrd.py): the whole panel in one
    # kernel, streaming ONLY the lower triangle — halves the symv HBM
    # traffic that is this reduction's roofline. f32, unpadded,
    # single-device, tile-divisible sizes only; otherwise the XLA panel.
    from ..kernels.common import on_tpu
    # ts=1024 measured fastest at 8192 (873 vs 1168 ms panels-only for
    # ts=2048 — finer tiles track the tril triangle more tightly, so the
    # streamed traffic is closer to the theoretical half; scratch/
    # ab_latrd.py sweep). END-TO-END verified same-session (2026-08-21,
    # scratch/eig_e2e.py): tridiag 916.0 ms vs the XLA panel's 1295.8
    # (−29%); full HermitianEig 1604.7 vs 2008.8 ms (−20%).
    _lat_ts = (1024 if M % 1024 == 0 else
               512 if M % 512 == 0 else 2048)
    use_pallas = (on_tpu() and a.dtype == jnp.float32 and m == M
                  and M % _lat_ts == 0 and nb <= 128
                  and A.grid.size == 1)
    if use_pallas:
        from ..kernels.latrd import latrd_panel

    for b in range(nblk):
        # every step works on the static trailing block (rows/cols >=
        # k0): the panel's per-column Hermitian matvecs and the rank-2w
        # trailing update never touch the finished rows (total traffic
        # ~n^3/3 instead of n^3; entries above the finished rows are
        # never read again — the packed output's reflectors live below
        # the first subdiagonal)
        k0 = b * nb
        w = min(nb, ncols - k0)
        if use_pallas:
            P, Wg, taup = latrd_panel(a, k0, w, nb=128, ts=_lat_ts)
            # reconstruct V from P (rows > pivot hold the reflector,
            # the pivot row is implicitly 1) — saves a kernel output
            rowsM = jax.lax.broadcasted_iota(jnp.int32, (M, 128), 0)
            pivs = k0 + jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1) + 1
            Vg = jnp.where(rowsM > pivs, P, 0.0)
            Vg = jnp.where(rowsM == pivs, 1.0, Vg)
            tau = jax.lax.dynamic_update_slice(
                tau, jax.lax.dynamic_slice(taup, (0,), (w,)), (k0,))
            a = jax.lax.dynamic_update_slice(a, P[k0:, :w], (k0, k0))
            V = Vg[k0:, :w]
            W = Wg[k0:, :w]
            at = a[k0:, k0:]
        else:
            at = a[k0:, k0:]
            Mt = at.shape[0]
            V = jnp.zeros((Mt, w), a.dtype)
            W = jnp.zeros((Mt, w), a.dtype)
            at, V, W, tau = _tridiag_panel(a, at, V, W, tau, k0, w, m - k0)
        # two-sided trailing update: only touches local columns >= w
        colsN = jax.lax.broadcasted_iota(jnp.int32, at.shape, 1)
        upd = local_gemm(V, jnp.conj(W.T)) + local_gemm(W, jnp.conj(V.T))
        at = jnp.where(colsN >= w, at - upd, at)
        a = jax.lax.dynamic_update_slice(a, at, (k0, k0))

    d = jnp.real(jnp.diagonal(a))
    e_c = jnp.diagonal(a, -1)
    if jnp.iscomplexobj(a):
        mag = jnp.abs(e_c)
        sign = jnp.where(mag == 0, jnp.ones_like(e_c),
                         e_c / jnp.where(mag == 0, 1, mag))
        phase = jnp.concatenate(
            [jnp.ones((1,), a.dtype), jnp.cumprod(sign)])
        e = mag
    else:
        phase = jnp.ones((M,), a.dtype)[: e_c.shape[0] + 1]
        e = e_c
    out = Af.with_data(Af.mask_padding(a))
    return TridiagFactorization(out, d, e, tau, phase)


def tridiag_apply_q(fact: TridiagFactorization, B: jax.Array, adjoint: bool,
                    blocksize: Optional[int] = None) -> jax.Array:
    """Backtransform: B := Q B or Q^H B with Q from the tridiagonal
    reduction (reference: condense/HermitianTridiag/ApplyQ.hpp). The
    effective Q includes the phase diagonal: Q_eff = Q_householder D."""
    nb = blocksize or Blocksize()
    m = fact.packed.m
    ncols = max(m - 2, 0)
    phase = jnp.ones((B.shape[0],), fact.packed.dtype).at[
        : fact.phase.shape[0]].set(fact.phase.astype(fact.packed.dtype))
    if adjoint:
        if ncols:
            B = ApplyPackedReflectors(fact.packed.data, fact.tau, B, nb,
                                      ncols, adjoint=True, offset=1)
        return jnp.conj(phase)[:, None] * B
    B = phase[:, None] * B
    if ncols == 0:
        return B
    return ApplyPackedReflectors(fact.packed.data, fact.tau, B, nb, ncols,
                                 adjoint=False, offset=1)


# ---------------------------------------------------------------------------
# Bidiagonalization (reference: condense/Bidiag.cpp + Bidiag/)
# ---------------------------------------------------------------------------


class BidiagFactorization(NamedTuple):
    """A = (U D_l) B_real (V D_r)^H: d/e are the REAL bidiagonal; phaseU/
    phaseV the diagonal unitaries absorbing complex phases (the
    reference's 'tP/tQ phase' handling in condense/Bidiag)."""

    packed: DistMatrix
    d: jax.Array       # real main diagonal
    e: jax.Array       # real superdiagonal
    tauP: jax.Array    # left (column) reflectors
    tauQ: jax.Array    # right (row) reflectors
    phaseU: jax.Array
    phaseV: jax.Array


def _bidiag_panel(at0, at, tauP, tauQ, k0, w, m_loc, n_loc):
    """labrd-style panel on the trailing slice ``at`` (local indices,
    columns/rows 0..w are the panel): the implicitly-updated trailing
    matrix is at0 - V Yh^H - X Uh^H, so each column costs two trailing
    matvecs (at0^H v and at0 u) plus small (Mt, w) GEMVs — the
    bandwidth shape of the reduction — and the trailing block is
    repaired with two MXU GEMMs by the caller. tauP/tauQ stay globally
    indexed (offset k0)."""
    Mt, Nt = at.shape
    rloc = jax.lax.broadcasted_iota(jnp.int32, (Mt,), 0)
    cloc = jax.lax.broadcasted_iota(jnp.int32, (Nt,), 0)
    V = jnp.zeros((Mt, w), at.dtype)
    Yh = jnp.zeros((Nt, w), at.dtype)
    X = jnp.zeros((Mt, w), at.dtype)
    Uh = jnp.zeros((Nt, w), at.dtype)
    colsW = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def col_step(i, carry):
        at, V, Yh, X, Uh, tauP, tauQ = carry
        mask = colsW < i
        Vp = jnp.where(mask, V, jnp.zeros_like(V))
        Yp = jnp.where(mask, Yh, jnp.zeros_like(Yh))
        Xp = jnp.where(mask, X, jnp.zeros_like(X))
        Up = jnp.where(mask, Uh, jnp.zeros_like(Uh))
        # current column i of the implicit matrix (valid at rows >= i)
        vrow = jax.lax.dynamic_index_in_dim(Yp, i, axis=0, keepdims=False)
        urow = jax.lax.dynamic_index_in_dim(Up, i, axis=0, keepdims=False)
        col = jax.lax.dynamic_index_in_dim(at0, i, axis=1, keepdims=False) \
            - Vp @ jnp.conj(vrow) - Xp @ jnp.conj(urow)
        v, tj, beta = householder(col, i, m_loc)
        tauP = tauP.at[k0 + i].set(tj)
        old = jax.lax.dynamic_index_in_dim(at, i, axis=1, keepdims=False)
        newcol = jnp.where(rloc > i, v, old)
        newcol = jnp.where(rloc == i, beta, newcol)
        at = jax.lax.dynamic_update_index_in_dim(at, newcol[:, None], i,
                                                 axis=1)
        # y_i = tau (A_impl)^H v  — extends the left-update factor
        y = tj * (jnp.conj(at0.T) @ v
                  - Yp @ (jnp.conj(Vp.T) @ v) - Up @ (jnp.conj(Xp.T) @ v))
        V = V.at[:, i].set(v)
        Yh = Yh.at[:, i].set(y)
        # row i of the implicit matrix after the left reflector
        # (A' = A_impl - v y^H, and v[i] = 1 at the pivot)
        Vr = jax.lax.dynamic_index_in_dim(V, i, axis=0, keepdims=False)
        Xr = jax.lax.dynamic_index_in_dim(Xp, i, axis=0, keepdims=False)
        Vr = jnp.where(colsW[0] <= i, Vr, jnp.zeros_like(Vr))  # incl. v_i
        # row_i of (at0 - V Yh^H - X Uh^H): the update terms are
        # conj(Yh @ conj(V[i,:])) etc.
        row = jax.lax.dynamic_index_in_dim(at0, i, axis=0, keepdims=False) \
            - jnp.conj(Yh @ jnp.conj(Vr)) - jnp.conj(Uh @ jnp.conj(Xr))
        u, sj, gamma = householder(jnp.conj(row), i + 1, n_loc)
        tauQ = tauQ.at[k0 + i].set(sj)
        oldr = jax.lax.dynamic_index_in_dim(at, i, axis=0, keepdims=False)
        newrow = jnp.where(cloc > i + 1, jnp.conj(u), oldr)
        newrow = jnp.where(cloc == i + 1, jnp.conj(gamma), newrow)
        at = jax.lax.dynamic_update_index_in_dim(at, newrow[None, :], i,
                                                 axis=0)
        # x_i = conj(tau_q) A' u  — extends the right-update factor
        x = jnp.conj(sj) * (at0 @ u
                            - V @ (jnp.conj(Yh.T) @ u)
                            - Xp @ (jnp.conj(Up.T) @ u))
        X = X.at[:, i].set(x)
        Uh = Uh.at[:, i].set(u)
        return at, V, Yh, X, Uh, tauP, tauQ

    at, V, Yh, X, Uh, tauP, tauQ = jax.lax.fori_loop(
        0, w, col_step, (at, V, Yh, X, Uh, tauP, tauQ))
    return at, V, Yh, X, Uh, tauP, tauQ


@functools.partial(jax.jit, static_argnames=('blocksize',))
def Bidiag(A: DistMatrix, blocksize: Optional[int] = None
           ) -> BidiagFactorization:
    """Golub-Kahan upper bidiagonalization A = U B V^H for m >= n
    (reference: condense/Bidiag.cpp). Blocked labrd panels on static
    trailing slices: each column costs two trailing matvecs; the
    trailing block is repaired once per panel with two MXU GEMMs."""
    Am = A.redistribute(MC, MR)
    a = Am.data
    M, N = a.shape
    m, n = A.m, A.n
    if m < n:
        raise ValueError("Bidiag here requires m >= n (use the adjoint)")
    nb = blocksize or Blocksize()
    tauP = jnp.zeros((N,), a.dtype)
    tauQ = jnp.zeros((N,), a.dtype)
    nblk = (n + nb - 1) // nb

    for b in range(nblk):
        k0 = b * nb
        w = min(nb, n - k0)
        at = a[k0:, k0:]
        at0 = at
        at, V, Yh, X, Uh, tauP, tauQ = _bidiag_panel(
            at0, at, tauP, tauQ, k0, w, m - k0, n - k0)
        if k0 + w < n:
            # repair the trailing block [w:, w:] (rows/cols < w hold the
            # packed reflectors + d/e — finalized, never updated again)
            trail = at0[w:, w:] - local_gemm(V[w:], jnp.conj(Yh[w:].T)) \
                - local_gemm(X[w:], jnp.conj(Uh[w:].T))
            at = jax.lax.dynamic_update_slice(at, trail, (w, w))
        a = jax.lax.dynamic_update_slice(a, at, (k0, k0))
    dc = jnp.diagonal(a)[:N]
    ec = jnp.diagonal(a, 1)[: N - 1]
    if jnp.iscomplexobj(a):
        def sgn(z):
            az = jnp.abs(z)
            return jnp.where(az == 0, jnp.ones_like(z),
                             z / jnp.where(az == 0, 1, az))

        # phi_l[j+1] = phi_l[j] * conj(sign(e_j)) * sign(d_{j+1})
        sd, se = sgn(dc), sgn(ec)

        def rec(j, pl):
            val = pl[j] * jnp.conj(se[j]) * sd[j + 1]
            return pl.at[j + 1].set(val)

        pl0 = jnp.ones((N,), a.dtype).at[0].set(sd[0])
        phaseU = jax.lax.fori_loop(0, N - 1, rec, pl0)
        # phi_r[j] = phi_l[j] * conj(sign(d_j))
        phaseV = phaseU * jnp.conj(sd)
        d = jnp.abs(dc)
        e = jnp.abs(ec)
    else:
        phaseU = jnp.ones((N,), a.dtype)
        phaseV = jnp.ones((N,), a.dtype)
        d = dc
        e = ec
    out = Am.with_data(Am.mask_padding(a))
    return BidiagFactorization(out, d, e, tauP, tauQ, phaseU, phaseV)


# ---------------------------------------------------------------------------
# Hessenberg reduction (reference: condense/Hessenberg.cpp)
# ---------------------------------------------------------------------------


class HessenbergFactorization(NamedTuple):
    packed: DistMatrix
    tau: jax.Array


def _hess_panel(a, tau, k0, w, m):
    """lahr2-style Hessenberg panel for columns [k0, k0+w): returns
    (a, tau, V, T, Y) with the panel columns finalized in ``a`` and the
    accumulated factors for the caller's deferred block updates —
    A(:, k0+w:) -= Y V^H from the right, then the left compact-WY.
    V is indexed by local rows (global k0+1..); Y spans all rows (the
    right multiplication reaches the finished top rows too)."""
    M = a.shape[0]
    Mt = M - k0 - 1
    m_loc = m - k0 - 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    colsW = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    V = jnp.zeros((Mt, w), a.dtype)
    T = jnp.zeros((w, w), a.dtype)
    Y = jnp.zeros((M, w), a.dtype)
    at0_cols = a[:, k0 + 1:]  # static full-height strip for the matvecs

    def col_step(i, carry):
        a, tau, V, T, Y = carry
        jc = k0 + i
        mask = colsW < i
        Vp = jnp.where(mask, V, jnp.zeros_like(V))
        Yp = jnp.where(mask, Y, jnp.zeros_like(Y))
        Tp = jnp.where(mask & (colsW.T < i), T, jnp.zeros_like(T))
        bcol = jax.lax.dynamic_index_in_dim(a, jc, axis=1, keepdims=False)
        # right-update correction: (Y V^H)[:, jc] — V's row for global
        # row jc is local i-1 (zero contribution when i == 0)
        vrow = jax.lax.dynamic_index_in_dim(
            Vp, jnp.maximum(i - 1, 0), axis=0, keepdims=False)
        vrow = jnp.where(i > 0, vrow, jnp.zeros_like(vrow))
        bcol = bcol - Yp @ jnp.conj(vrow)
        # left correction on rows k0+1..: b -= V T^H (V^H b)
        blow = bcol[k0 + 1:]
        wv = jnp.conj(Vp.T) @ blow
        wv = jnp.conj(Tp.T) @ wv
        blow = blow - Vp @ wv
        v, tj, beta = householder(blow, i, m_loc)
        tau = tau.at[jc].set(tj)
        # finalize column jc: corrected head, beta at the subdiagonal,
        # reflector below
        full = bcol.at[k0 + 1:].set(blow)
        vfull = jnp.zeros((M,), a.dtype).at[k0 + 1:].set(v)
        newcol = jnp.where(rows > jc + 1, vfull, full)
        newcol = newcol.at[jc + 1].set(beta)
        a = jax.lax.dynamic_update_index_in_dim(a, newcol[:, None], jc,
                                                axis=1)
        # T column (larft recurrence) and Y column = tau (A v - Y V^H v)
        Vv = jnp.conj(Vp.T) @ v
        tcol = -tj * (Tp @ Vv)
        tcol = tcol.at[i].set(tj)
        T = T.at[:, i].set(tcol)
        y = tj * (at0_cols @ v - Yp @ Vv)
        V = V.at[:, i].set(v)
        Y = Y.at[:, i].set(y)
        return a, tau, V, T, Y

    a, tau, V, T, Y = jax.lax.fori_loop(0, w, col_step, (a, tau, V, T, Y))
    return a, tau, V, T, Y


@functools.partial(jax.jit, static_argnames=('uplo', 'blocksize'))
def Hessenberg(uplo: UpperOrLower, A: DistMatrix,
               blocksize: Optional[int] = None) -> HessenbergFactorization:
    """Reduce to upper Hessenberg form A = Q H Q^H
    (reference: condense/Hessenberg.cpp). Blocked lahr2-style panels:
    each column costs one trailing matvec; the deferred two-sided block
    update is three MXU GEMMs per panel."""
    Am = A.redistribute(MC, MR)
    a = Am.data
    M = a.shape[0]
    m = A.m
    nb = blocksize or Blocksize()
    tau = jnp.zeros((M,), a.dtype)
    ncols = max(m - 2, 0)
    nblk = (ncols + nb - 1) // nb if ncols else 0

    for b in range(nblk):
        k0 = b * nb
        w = min(nb, ncols - k0)
        a, tau, V, T, Y = _hess_panel(a, tau, k0, w, m)
        if k0 + w < M:
            # deferred right update A(:, k0+w:) -= Y V^H (V rows for
            # those columns start at local w-1)
            Vr = V[w - 1:]
            a = jax.lax.dynamic_update_slice(
                a, a[:, k0 + w:] - local_gemm(Y, jnp.conj(Vr.T)),
                (0, k0 + w))
            # deferred left update on rows k0+1.., cols k0+w..
            Asub = a[k0 + 1:, k0 + w:]
            Wl = local_gemm(jnp.conj(V.T), Asub)
            Asub = Asub - local_gemm(V, local_gemm(jnp.conj(T.T), Wl))
            a = jax.lax.dynamic_update_slice(a, Asub, (k0 + 1, k0 + w))

    out = Am.with_data(Am.mask_padding(a))
    return HessenbergFactorization(out, tau)


def hessenberg_apply_q(fact: HessenbergFactorization, B: jax.Array,
                       adjoint: bool, blocksize: Optional[int] = None
                       ) -> jax.Array:
    nb = blocksize or Blocksize()
    m = fact.packed.m
    ncols = max(m - 2, 0)
    if ncols == 0:
        return B
    return ApplyPackedReflectors(fact.packed.data, fact.tau, B, nb, ncols,
                                 adjoint=adjoint, offset=1)
