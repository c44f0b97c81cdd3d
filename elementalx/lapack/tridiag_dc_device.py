"""Device-side divide-and-conquer symmetric tridiagonal eigensolver.

Reference: spectral/HermitianTridiagEig's D&C path and BidiagSVD's
DCCtrl machinery (SecularEVD.cpp / DivideAndConquer.hpp). The host
Cuppen solver (tridiag_dc.py) orchestrates merges in numpy; this module
is the TPU-native version: a full bottom-up D&C in ONE jitted program —

 * rank-one tearing applied up front to every split boundary (each
   adjacent pair is a boundary of exactly one level of the binary tree),
 * base case: one BATCHED dense eigh over all leaf blocks,
 * per level: all pair-merges solved simultaneously under ``vmap`` —
   masked deflation (tiny z), pole-relative secular roots by fixed-trip
   octsection+Newton, Gu-Eisenstat Loewner reconstruction of z for
   orthogonal merged vectors (deflated poles cancel from the products
   automatically since their root equals their pole), and the
   eigenvector back-multiplication as one batched MXU matmul.

Everything is static-shape; data-dependent deflation is masks, so the
whole solve jits, vmaps, and shards unchanged.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _secular_roots(d: jax.Array, z2: jax.Array, rho: jax.Array,
                   gap: jax.Array, nxt_val: jax.Array,
                   nxt_idx: jax.Array, iters: int = 60):
    """Roots of 1 + rho * sum_i z2_i / (d_i - lam) = 0, one per
    NON-deflated pole j in (d_j, d_j + gap_j), where gap_j reaches the
    next non-deflated pole (value ``nxt_val[j]``; deflated poles carry
    no singularity, so the root can pass them).

    Returns (sig, origin): lam_j = origin_j + sig_j with origin the
    CLOSEST pole (the dlaed4 two-sided pole-relative representation) —
    downstream formulas need lam_j - d_i to full relative precision near
    BOTH interval endpoints, so the origin must be the exact stored pole
    value, never d_j + gap_j re-rounded."""
    m = d.shape[0]
    delta = d[:, None] - d[None, :]        # delta[i, j] = d_i - d_j

    def f(tau):
        # f[j] evaluated at lam_j = d_j + tau_j
        return 1.0 + rho * jnp.sum(z2[:, None] / (delta - tau[None, :]),
                                   axis=0)

    lo = jnp.full((m,), 1e-30, d.dtype) * gap
    hi = gap * (1.0 - 1e-15)

    def bisect(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        fm = f(mid)
        # f is increasing in tau on (0, gap): f(0+) = -inf, f(gap-) = +inf
        lo2 = jnp.where(fm < 0, mid, lo)
        hi2 = jnp.where(fm < 0, hi, mid)
        return lo2, hi2

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
    tau = 0.5 * (lo + hi)

    # switch to the CLOSEST pole as origin, then polish there: bisection
    # is only absolutely accurate; the eigenvector formula needs the
    # root-to-pole distance to near-full RELATIVE precision
    m_iota = jnp.arange(m)
    right = (tau > 0.5 * gap) & jnp.isfinite(nxt_val)
    origin = jnp.where(right, nxt_val, d)
    o_idx = jnp.where(right, nxt_idx, m_iota)
    z2o = z2[o_idx]                        # own-pole weight
    deltao = d[:, None] - origin[None, :]  # d_i - origin_j (exact diffs)
    off = d - origin                       # -gap for right roots, 0 left
    # bracket in the shifted variable: open at the ORIGIN pole (0), so
    # roots arbitrarily close to it stay reachable — bisection's
    # gap*(1-1e-15) cap must not leak in as a hard wall
    lo_s = jnp.where(right, lo + off, jnp.zeros_like(lo))
    hi_s = jnp.where(right, jnp.zeros_like(hi), hi + off)
    # the change of variable can cancel to exactly 0 (a pole); clamp
    # back inside the open bracket so the polish has a finite start
    tiny = jnp.asarray(1e-290, d.dtype)
    sig = jnp.clip(tau + off, lo_s, hi_s)
    sig = jnp.where(right, jnp.minimum(sig, -tiny),
                    jnp.maximum(sig, tiny))

    def polish(_, sig):
        doff = deltao - sig[None, :]
        terms = z2[:, None] / doff
        fv = 1.0 + rho * jnp.sum(terms, axis=0)
        fp = rho * jnp.sum(terms / doff, axis=0)
        newton = sig - fv / jnp.maximum(fp, 1e-300)
        # rational own-pole update (the dlaed4 idea): write
        # f = C(sig) - rho*z2o/sig with C the smooth part; the root of
        # the rational model is sig' = rho*z2o / C. Newton's step
        # collapses for MICROSCOPIC roots (|sig*| orders below the
        # bracket width): its correction overshoots and gets rejected,
        # while the rational update lands on the root directly.
        safe_sig = jnp.where(sig == 0, 1e-300, sig)
        C = fv + rho * z2o / safe_sig
        rat = rho * z2o / jnp.where(C == 0, 1e-300, C)
        nok = (newton > lo_s) & (newton < hi_s) & jnp.isfinite(newton)
        rok = (rat > lo_s) & (rat < hi_s) & jnp.isfinite(rat)
        return jnp.where(nok, newton, jnp.where(rok, rat, sig))

    sig = jax.lax.fori_loop(0, 8, polish, sig)
    return sig, origin


def _merge(w1, Q1, w2, Q2, b, eps_scale):
    """Merge two solved subproblems coupled by off-diagonal b.
    Returns (w, Q) of the merged problem (size m = m1 + m2).
    T = diag(w-basis) + rho z z^T with rho = |b| and
    z = [Q1 last row, sign(b) * Q2 first row]."""
    m1 = w1.shape[0]
    m2 = w2.shape[0]
    m = m1 + m2
    rho = jnp.abs(b)
    sgn = jnp.where(b >= 0, 1.0, -1.0).astype(Q1.dtype)
    z = jnp.concatenate([Q1[m1 - 1, :], sgn * Q2[0, :]])
    d = jnp.concatenate([w1, w2])
    # sort poles ascending
    order = jnp.argsort(d)
    d = d[order]
    z = z[order]
    # deflation: tiny z components and rho == 0
    nrm = jnp.sqrt(jnp.sum(z * z))
    tol = eps_scale * jnp.maximum(jnp.max(jnp.abs(d)), 1.0)
    defl = (jnp.abs(rho) * jnp.abs(z) * nrm <= tol) | (rho == 0)
    z_eff = jnp.where(defl, 0.0, z)
    z2 = z_eff * z_eff
    # bracket width per root: distance to the next NON-deflated pole
    # (deflated poles contribute no singularity, so the root may pass
    # them); the topmost bracket is the Weyl bound rho*||z||^2
    top = d[m - 1] + rho * jnp.sum(z2) + 1.0
    dinf = jnp.where(defl, jnp.inf, d)

    def _comb(a, b):
        va, ia = a
        vb, ib = b
        take_a = va <= vb
        return jnp.where(take_a, va, vb), jnp.where(take_a, ia, ib)

    iota_m = jnp.arange(m)
    nxt_pole, nxt_idx = jax.lax.associative_scan(
        _comb,
        (jnp.concatenate([dinf[1:], jnp.array([jnp.inf], d.dtype)]),
         iota_m + 1),
        reverse=True)
    nxt_idx = jnp.minimum(nxt_idx, m - 1)
    gap = jnp.where(jnp.isfinite(nxt_pole), nxt_pole, top) - d
    gap = jnp.maximum(gap, 1e-30)
    nxt_safe = jnp.where(jnp.isfinite(nxt_pole), nxt_pole, top)
    sig, origin = _secular_roots(d, z2, rho, gap, nxt_safe, nxt_idx)
    sig = jnp.where(defl, 0.0, sig)
    origin = jnp.where(defl, d, origin)
    lam = origin + sig
    # lam_j - d_i to full relative precision near BOTH interval ends:
    # (origin_j - d_i) is an exact difference of stored poles, sig_j is
    # the closest-pole offset
    delta = d[None, :] - d[:, None]          # delta[i, j] = d_j - d_i
    dist_o = origin[None, :] - d[:, None]    # origin_j - d_i
    lam_minus = dist_o + sig[None, :]        # lam_j - d_i
    iota = jnp.arange(m)
    offdiag = iota[:, None] != iota[None, :]
    # Gu-Eisenstat reconstruction:
    # |zhat_i|^2 = prod_j (lam_j - d_i) / (rho * prod_{j!=i}(d_j - d_i));
    # deflated j (lam_j = d_j) contribute ratio 1 and cancel exactly
    ratio = jnp.where(offdiag, lam_minus / jnp.where(offdiag, delta, 1.0),
                      1.0)
    prod = jnp.prod(jnp.abs(ratio), axis=1)
    tau_own = jnp.abs(lam_minus[iota, iota])   # |lam_i - d_i|
    zhat2 = jnp.where(defl | (rho == 0), 0.0,
                      prod * tau_own / jnp.maximum(rho, 1e-300))
    zhat = jnp.sqrt(jnp.maximum(zhat2, 0.0)) * jnp.where(z < 0, -1.0, 1.0)
    # eigenvectors of the secular problem: s_ij = zhat_i / (d_i - lam_j)
    denom = -lam_minus
    denom = jnp.where(jnp.abs(denom) < 1e-300,
                      jnp.where(denom < 0, -1e-300, 1e-300), denom)
    S = zhat[:, None] / denom
    cn = jnp.sqrt(jnp.sum(S * S, axis=0))
    S = S / jnp.where(cn == 0, 1.0, cn)[None, :]
    # deflated columns are exact unit vectors at their pole position
    S = jnp.where(defl[None, :], (iota[:, None] == iota[None, :])
                  .astype(S.dtype), S)
    # back-multiply: Q = blockdiag(Q1, Q2)[:, order] @ S
    Qb = jnp.zeros((m, m), Q1.dtype)
    Qb = Qb.at[:m1, :m1].set(Q1)
    Qb = Qb.at[m1:, m1:].set(Q2)
    Q = Qb[:, order] @ S
    # final ascending sort of the merged eigenvalues
    fin = jnp.argsort(lam)
    return lam[fin], Q[:, fin]


@functools.partial(jax.jit, static_argnames=("cutoff",))
def tridiag_eig_dc_device(d: jax.Array, e: jax.Array, cutoff: int = 32
                          ) -> Tuple[jax.Array, jax.Array]:
    """Full-spectrum symmetric tridiagonal eigendecomposition by
    device-side D&C. Returns (w ascending, Q columns) of the ORIGINAL
    size n (padding handled internally)."""
    n = d.shape[0]
    dt = d.dtype
    c = min(cutoff, max(4, _next_pow2(n) // 2)) if n > 4 else n
    c = _next_pow2(max(c, 2))
    P = max(_next_pow2(-(-n // c)) * c, c)
    nblk = P // c
    # pad with decoupled above-spectrum entries (they sort to the top
    # and are sliced away; zero coupling keeps them exact eigenvalues).
    # Padding magnitude is DATA-SCALED: an absolute constant would blow
    # up the deflation tolerance (eps * max|d|) and deflate everything
    emax = jnp.max(jnp.abs(e)) if n > 1 else jnp.zeros((), dt)
    big = 2.0 * (jnp.max(jnp.abs(d)) + emax) + 1.0
    dp = jnp.where(jnp.arange(P) >= n,
                   big * (1.0 + jnp.arange(P, dtype=dt) / P),
                   jnp.concatenate([d, jnp.zeros((P - n,), dt)])
                   if P > n else d)
    ep = jnp.zeros((P - 1,), dt)
    if n > 1:
        ep = ep.at[: n - 1].set(e)
    # rank-one tearing at every block boundary of every level: boundary
    # (p, p+1) belongs to exactly one merge, so adjust both diagonals
    bidx = jnp.arange(1, nblk) * c - 1 if nblk > 1 else jnp.zeros(
        (0,), jnp.int32)
    if nblk > 1:
        babs = jnp.abs(ep[bidx])
        dp = dp.at[bidx].add(-babs).at[bidx + 1].add(-babs)
    eps_scale = jnp.finfo(dt).eps * 8.0
    # base case: batched dense eigh of the leaf blocks
    ii = jnp.arange(c)
    blk_rows = jnp.arange(nblk) * c

    def leaf(k0):
        db = jax.lax.dynamic_slice(dp, (k0,), (c,))
        eb = jax.lax.dynamic_slice(jnp.concatenate(
            [ep, jnp.zeros((1,), dt)]), (k0,), (c,))
        # in-block couplings only: zero the last position
        eb = eb.at[c - 1].set(0.0)
        T = jnp.diag(db) + jnp.diag(eb[: c - 1], 1) + jnp.diag(
            eb[: c - 1], -1)
        return jnp.linalg.eigh(T)

    w, Q = jax.vmap(leaf)(blk_rows)          # (nblk, c), (nblk, c, c)
    size = c
    nb = nblk
    while nb > 1:
        w1 = w[0::2]
        w2 = w[1::2]
        Q1 = Q[0::2]
        Q2 = Q[1::2]
        # coupling of merge t at boundary (2t+1)*size - 1
        bpos = (2 * jnp.arange(nb // 2) + 1) * size - 1
        bs = ep[bpos]
        w, Q = jax.vmap(_merge, in_axes=(0, 0, 0, 0, 0, None))(
            w1, Q1, w2, Q2, bs, eps_scale)
        size *= 2
        nb //= 2
    wf, Qf = w[0], Q[0]
    # the padded HUGE entries sorted to the top: the leading n are real
    return wf[:n], Qf[:n, :n]
