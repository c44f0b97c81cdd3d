"""Two-stage successive band reduction (SBR) tridiagonalization.

Reference: src/lapack_like/condense/HermitianTridiag.cpp:82-116 — the
square-grid panel pipeline whose role this two-stage scheme takes on
TPU — and condense/HermitianTridiag/ApplyQ.hpp (the backtransform
contract). Algorithm: Bischof-Lang-Sun SBR, as in ELPA/PLASMA:

  stage 1: full symmetric -> band(b) via blocked Householder panels.
    Each panel is a tall-skinny QR (compact WY) + a two-sided rank-2b
    GEMM update of the trailing block — ALL MXU work, no symv. This
    removes the per-column Hermitian matvec that makes the one-stage
    latrd reduction HBM-bound (PERF.md: 916 ms of the 8192 eig is that
    symv traffic at the chip's streaming roofline).

  stage 2: band(b) -> tridiagonal via rank-1 bulge chasing in plain
    column-major sweep order (sweep j fully chased before sweep j+1).
    On TPU this runs in ONE Pallas mega-kernel with the band resident
    in VMEM (kernels/sb2tr.py); off-TPU a dense jnp reference with the
    identical op order/outputs backs the tests.

  backtransform: Q = Q1 Q2 with
    Q1 = prod_k (I - V_k T_k V_k^T)   (stage-1 panels, reverse order)
    Q2 = the chase reflectors, applied as "diamond" compact-WY blocks:
    the same-chase-index reflectors of g consecutive sweeps have
    windows staggered by one row, and every op between them in
    reverse-creation order commutes (disjoint windows), so they fuse
    into (b+g-1) x g WY blocks — GEMM-rate instead of rank-1
    (validated against sequential application in scratch/proto_sbr.py).

Everything is f32 and functional; all shapes static (padded windows
with trivial-reflector guards at the edges)."""

from __future__ import annotations

import functools

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# NOTE: on this chip Precision.HIGH (bf16x3) leaves ~1e-4-grade product
# error in orthogonal applications (measured: Q2 ortho 5.6e-4 at HIGH on
# TPU vs 5.4e-6 for the identical graph on CPU); HIGHEST restores f32
# grade, so every Q-application here uses HIGHEST.
_HIGH = jax.lax.Precision.HIGHEST


class SBRFactorization(NamedTuple):
    """Two-stage reduction output. ``panels``: stage-1 (V, T) pairs
    (static python tuple; V_k is ((n - k*b - b), b)). ``vout``:
    stage-2 chase reflectors, (n, S_max, b) with sweep j's chase-s
    reflector at vout[j, s]: lane 0 holds tau, lanes 1.. hold
    v[1:] (v[0] == 1 implicit). ``d``/``e``: the real tridiagonal."""

    panels_v: Tuple[jax.Array, ...]
    panels_t: Tuple[jax.Array, ...]
    vout: jax.Array
    d: jax.Array
    e: jax.Array


def _panel_vt(slab: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(m, b) slab -> (V unit-lower, T forward-WY, R upper-tri)."""
    from .qr import _geqrf_slab

    pk, tau, T = _geqrf_slab(slab, slab.shape[1])
    r2 = jax.lax.broadcasted_iota(jnp.int32, pk.shape, 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, pk.shape, 1)
    V = jnp.where(r2 > c2, pk, jnp.zeros_like(pk))
    V = jnp.where(r2 == c2, jnp.ones((), pk.dtype), V)
    b = pk.shape[1]
    R = jnp.where(r2[:b] <= c2[:b], pk[:b], jnp.zeros_like(pk[:b]))
    return V, T, R


def band_reduce(a: jax.Array, b: int
                ) -> Tuple[jax.Array, Tuple[jax.Array, ...],
                           Tuple[jax.Array, ...]]:
    """Stage 1: full symmetric (M, M) f32 ``a`` (BOTH triangles
    populated) -> banded (bandwidth b) + the panel (V, T) factors.
    Requires M % b == 0. A_band = Q1^T A Q1 with
    Q1 = prod_k (I - V_k T_k V_k^T) acting on rows k*b+b..M."""
    M = a.shape[0]
    assert M % b == 0 and a.dtype == jnp.float32
    Vs = []
    Ts = []
    for k in range(0, M - 2 * b + 1, b):
        m = M - k - b
        P = a[k + b:, k:k + b]
        V, T, R = _panel_vt(P)
        newpan = jnp.concatenate(
            [R, jnp.zeros((m - b, b), a.dtype)], axis=0)
        a = a.at[k + b:, k:k + b].set(newpan)
        a = a.at[k:k + b, k + b:].set(newpan.T)
        # two-sided trailing update: A2 <- (I - V T V^T)^T A2 (.)
        # at HIGHEST: these GEMMs REWRITE the matrix, so their product
        # error lands directly in the spectrum (no orthogonality
        # protection) — HIGH leaves 5.7e-4 eigenvalue drift at n=512
        # where HIGHEST leaves 1.8e-6 (measured on-chip)
        HI = jax.lax.Precision.HIGHEST
        A2 = a[k + b:, k + b:]
        Y = jnp.dot(A2, jnp.dot(V, T, precision=HI), precision=HI)
        S = jnp.dot(V.T, Y, precision=HI)
        W = Y - 0.5 * jnp.dot(V, jnp.dot(T.T, S, precision=HI),
                              precision=HI)
        A2 = A2 - jnp.dot(V, W.T, precision=HI) \
            - jnp.dot(W, V.T, precision=HI)
        a = a.at[k + b:, k + b:].set(A2)
        Vs.append(V)
        Ts.append(T)
    return a, tuple(Vs), tuple(Ts)


def _apply_q1(panels_v, panels_t, Z: jax.Array, b: int,
              adjoint: bool = False) -> jax.Array:
    """Z := Q1 Z (or Q1^T Z): stage-1 panels, reverse (forward) order."""
    order = range(len(panels_v)) if adjoint else \
        reversed(range(len(panels_v)))
    for i in order:
        k = i * b
        V, T = panels_v[i], panels_t[i]
        Zs = Z[k + b:, :]
        Tm = T.T if adjoint else T
        Zs = Zs - jnp.dot(V, jnp.dot(Tm, jnp.dot(V.T, Zs,
                                                 precision=_HIGH),
                                     precision=_HIGH), precision=_HIGH)
        Z = Z.at[k + b:, :].set(Zs)
    return Z


# ---------------------------------------------------------------------------
# Stage 2 dense reference (CPU / validation; same op order & outputs as
# kernels/sb2tr.py)
# ---------------------------------------------------------------------------


def _house_padded(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Householder of a length-b window (padded semantics: zero tail ->
    tau = 0 identity). Returns (v with v[0]=1, tau, beta)."""
    alpha = x[0]
    sigma2 = jnp.sum(x[1:] * x[1:])
    norm = jnp.sqrt(alpha * alpha + sigma2)
    sgn = jnp.where(alpha < 0, jnp.float32(-1), jnp.float32(1))
    beta0 = -sgn * norm
    trivial = sigma2 == 0
    denom = jnp.where(trivial, jnp.float32(1), alpha - beta0)
    v = jnp.where(trivial, jnp.zeros_like(x), x / denom)
    v = v.at[0].set(1.0)
    tau = jnp.where(trivial, jnp.float32(0),
                    (beta0 - alpha) / jnp.where(beta0 == 0, 1.0, beta0))
    beta = jnp.where(trivial, alpha, beta0)
    return v, tau, beta


def chase_smax(n: int, b: int) -> int:
    """Padded chase-round count (multiple of 8 for the kernel's unroll)."""
    s = 1 + max(0, -(-(n - 3) // b))
    return -(-s // 8) * 8


def _sb2tr_dense(a_band: jax.Array, b: int) -> Tuple[jax.Array, jax.Array]:
    """Dense jnp reference of the band->tridiag chase (column-major
    sweeps; full-length padded windows with trivial guards — the exact
    semantics of kernels/sb2tr.py). Returns (a_tri_dense, vout)."""
    n = a_band.shape[0]
    smax = chase_smax(n, b)
    ap = jnp.zeros((n + (smax + 2) * b + b, n + (smax + 2) * b + b),
                   jnp.float32)
    ap = ap.at[:n, :n].set(a_band)
    vout = jnp.zeros((n, smax, b), jnp.float32)

    def op(ap, vout, j, s):
        ce = jnp.where(s == 0, j, j + 1 + (s - 1) * b)
        r0 = j + 1 + s * b
        x = jax.lax.dynamic_slice(ap, (r0, ce), (b, 1))[:, 0]
        # beyond the matrix the padded window is all-zero -> trivial
        v, tau, beta = _house_padded(x)
        blk = jax.lax.dynamic_slice(ap, (r0, 0), (b, ap.shape[1]))
        blk = blk - tau * v[:, None] * jnp.dot(v[None, :], blk,
                                               precision=_HIGH)
        ap = jax.lax.dynamic_update_slice(ap, blk, (r0, 0))
        blc = jax.lax.dynamic_slice(ap, (0, r0), (ap.shape[0], b))
        blc = blc - tau * jnp.dot(blc, v[:, None], precision=_HIGH) \
            * v[None, :]
        ap = jax.lax.dynamic_update_slice(ap, blc, (0, r0))
        # elimination hygiene: exact [beta, 0...] column + mirror
        newcol = jnp.zeros((b, 1), jnp.float32).at[0, 0].set(beta)
        ap = jax.lax.dynamic_update_slice(ap, newcol, (r0, ce))
        ap = jax.lax.dynamic_update_slice(ap, newcol.T, (ce, r0))
        rec = jnp.concatenate([tau[None], v[1:]])[None, None, :]
        vout = jax.lax.dynamic_update_slice(vout, rec, (j, s, 0))
        return ap, vout

    def sweep(j, carry):
        ap, vout = carry

        def chase(s, carry2):
            return op(carry2[0], carry2[1], j, s)

        sj = jnp.maximum(1, (n - 2 - j + b - 1) // b + 1)
        return jax.lax.fori_loop(0, jnp.minimum(sj, smax), chase,
                                 (ap, vout))

    ap, vout = jax.lax.fori_loop(0, max(n - 2, 0), sweep, (ap, vout))
    return ap[:n, :n], vout


def _apply_q2(vout: jax.Array, Z: jax.Array, n: int, b: int,
              g: int = 128, adjoint: bool = False) -> jax.Array:
    """Z := Q2 Z (or Q2^T Z) with diamond compact-WY blocks: the
    chase-index-s reflectors of sweeps [c0, c0+g) (windows staggered
    by 1). Blocks applied: sweep-groups descending, s ascending,
    forward-WY columns in ascending sweep order (adjoint: everything
    reversed). Zero-padded vout rows give tau = 0 -> identity columns,
    so no masking is needed."""
    from .reflect import build_wy_T

    smax = vout.shape[1]
    m = b + g  # diamond block height (g-1 stagger + b window, +1 pad)
    n2 = max(n - 2, 0)
    # forward application order: sweep-groups DESCENDING, chase index s
    # ASCENDING within each group (the reverse-creation-reachable order
    # validated in scratch/proto_sbr.py); adjoint = exact reverse
    schedule = []  # (c0, s) with base row c0 + 1 + s*b
    for c0 in reversed(range(0, n2, g)):
        s_hi = min(smax, 1 + max(0, -(-(n - 3 - c0) // b)))
        for s in range(s_hi):
            schedule.append((c0, s))
    if not schedule:
        return Z
    if adjoint:
        schedule = schedule[::-1]
    c0s = jnp.asarray([c for c, _ in schedule], jnp.int32)
    ss = jnp.asarray([s for _, s in schedule], jnp.int32)
    # pad vout and Z so edge blocks never hit dynamic_slice's start
    # clamping (a clamped slice reads the WRONG sweeps' reflectors)
    vout = jnp.concatenate(
        [vout, jnp.zeros((g, smax, b), vout.dtype)], axis=0)
    Zp = jnp.concatenate(
        [Z, jnp.zeros((2 * b + g + 8, Z.shape[1]), Z.dtype)], 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, g), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, g), 1)

    # ---- batched precompute of every diamond D and its WY T (the
    # per-step T build made the sequential scan ~6x slower: each step
    # paid a log-depth triangular inversion's dispatch chain)
    # member i = sweep c0+i; vout[c0+i, s] = [tau | v[1:]];
    # its window starts at row c0+i+1+s*b -> diamond offset i
    gather_rows = c0s[:, None] + jnp.arange(g, dtype=jnp.int32)[None, :]
    Vg_all = vout[gather_rows, ss[:, None]]          # (K, g, b)
    taus_all = Vg_all[:, :, 0]
    Vrows_all = jnp.concatenate(
        [jnp.ones((Vg_all.shape[0], g, 1), jnp.float32),
         Vg_all[:, :, 1:]], axis=2)
    idx = jnp.clip(rows - cols, 0, b - 1)
    # D[k, r, i] = Vrows_all[k, i, r - i] (0 outside [i, i+b))
    D_all = jnp.take_along_axis(
        jnp.swapaxes(Vrows_all, 1, 2), idx[None], axis=1, mode='clip')
    D_all = jnp.where((rows >= cols) & (rows < cols + b), D_all, 0.0)
    T_all = jax.vmap(build_wy_T)(D_all, taus_all)

    def step(Zp, blk):
        D, T, c0, s = blk
        base = c0 + 1 + s * b
        zero = jnp.zeros((), base.dtype)
        Zs = jax.lax.dynamic_slice(Zp, (base, zero), (m, Zp.shape[1]))
        Tm = T.T if adjoint else T
        Zs = Zs - jnp.dot(D, jnp.dot(Tm, jnp.dot(D.T, Zs,
                                                 precision=_HIGH),
                                     precision=_HIGH), precision=_HIGH)
        return jax.lax.dynamic_update_slice(Zp, Zs, (base, zero)), None

    Zp, _ = jax.lax.scan(step, Zp, (D_all, T_all, c0s, ss))
    return Zp[:Z.shape[0]]


def sbr_apply_q(fact: SBRFactorization, Z: jax.Array, b: int,
                adjoint: bool = False) -> jax.Array:
    """Backtransform Z := Q Z (Q = Q1 Q2) or Q^T Z."""
    n = fact.vout.shape[0]
    if adjoint:
        Z = _apply_q1(fact.panels_v, fact.panels_t, Z, b, adjoint=True)
        return _apply_q2(fact.vout, Z, n, b, adjoint=True)
    Z = _apply_q2(fact.vout, Z, n, b, adjoint=False)
    return _apply_q1(fact.panels_v, fact.panels_t, Z, b, adjoint=False)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def _band_to_ds(a_band: jax.Array, b: int) -> jax.Array:
    """Dense banded (n, n) -> the kernel's block-aligned dense lower
    store in SWEEP-0-READY alignment:
    DS[2b + r, l] = A[r, cb_0(r) + l] with cb_0(r) = 1 + ((r-1)//b - 2)b
    (see kernels/sb2tr.py — the store is kept pre-shifted for the next
    sweep so the kernel needs no dynamic lane rotation). Strictly-upper
    and out-of-range positions are exactly zero. Static slices only (a
    take_along_axis gather here measured 232 ms at n=8192)."""
    n = a_band.shape[0]
    assert n % b == 0
    # DS0[r, l] = A[r, (r//b - 2)*b + l] via per-block static slices
    blocks = []
    for m in range(n // b):
        lo = (m - 2) * b
        lo_c, hi_c = max(lo, 0), min(lo + 4 * b, n)
        blk = a_band[m * b:(m + 1) * b, lo_c:hi_c]
        blk = jnp.pad(blk, ((0, 0), (lo_c - lo,
                                     4 * b - (lo_c - lo) - (hi_c - lo_c))))
        blocks.append(blk)
    ds0 = jnp.concatenate(blocks, axis=0)
    r = jax.lax.broadcasted_iota(jnp.int32, (n, 4 * b), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 4 * b), 1)
    ds0 = jnp.where(lane <= (r % b) + 2 * b, ds0, 0.0)
    # pre-shift to cb_0: +1 lane everywhere, +1-b on block-start rows
    ds_a = jnp.concatenate(
        [ds0[:, 1:], jnp.zeros((n, 1), jnp.float32)], axis=1)
    ds_b = jnp.concatenate(
        [jnp.zeros((n, b - 1), jnp.float32), ds0[:, :3 * b + 1]], axis=1)
    ds = jnp.where(r % b == 0, ds_b, ds_a)
    top = jnp.zeros((2 * b, 4 * b), jnp.float32)
    bot = jnp.zeros((6 * b, 4 * b), jnp.float32)
    return jnp.concatenate([top, ds, bot], axis=0)


@functools.partial(jax.jit, static_argnames=('b', 'use_kernel'))
def sbr_tridiag(a: jax.Array, b: int = 256,
                use_kernel: bool = True) -> SBRFactorization:
    """Full symmetric (M, M) f32 (both triangles) -> SBRFactorization.
    ``use_kernel`` selects the Pallas chase (TPU); otherwise the dense
    jnp reference runs (CPU mesh / tests)."""
    M = a.shape[0]
    a_band, Vs, Ts = band_reduce(a, b)
    if use_kernel:
        from ..kernels.sb2tr import sb2tr

        ds = _band_to_ds(a_band, b)
        vout, de = sb2tr(ds, M, b)
        # de[j] = [e_j, d_{j+1}] from each sweep's s=0 op; d_0 is never
        # touched by the chase
        e = de[:M - 1, 0]
        d = jnp.concatenate([a_band[0:1, 0], de[:M - 1, 1]])
    else:
        a_tri, vout = _sb2tr_dense(a_band, b)
        d = jnp.diagonal(a_tri)
        e = jnp.diagonal(a_tri, -1)
    return SBRFactorization(Vs, Ts, vout, d, e)
