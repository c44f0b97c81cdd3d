"""Device-resident f64-grade Hermitian eigen-refinement (real symmetric).

VERDICT r3 item 3 asks for f64-grade spectra ON-CHIP at scale. The host
path (`lapack/refine.RefinedHermitianEig`) orchestrates per-sweep numpy
matmuls and re-splits/re-transfers the operands on every Ozaki call —
fine on the CPU mesh, but at n=8192 over the axon tunnel the host
matmuls (~1.1 TFLOP each on one core) and ~1 GB/call transfers dominate
by minutes. This module keeps EVERYTHING resident: the matrix and the
eigenbasis live on the device as double-word f32 pairs (hi + lo, ~48-bit
mantissa — `kernels/extended.py`), the residual/Gram products run as
Ozaki exact-split matmuls on the MXU (`kernels/ozaki.py`), the
correction products as HIGHEST-precision f32 matmuls, and only scalars
leave the device.

Algorithm (same mathematics as the host path, reference target:
BASELINE.md HermitianEig 'matching residuals'):

    per sweep:  Newton orthonormalize V <- V (I - E/2 + 3/8 E^2),
                      E = V^T V - I (Ozaki Gram; twice on sweep 0)
                AV  = A V                       (Ozaki, dw result)
                lam = colsum(V .* AV) / colsum(V .* V)   (dw Rayleigh)
                R   = AV - V diag(lam)          (dw)
                S   = V^T R (f32 HIGHEST: first-order small)
                guarded corrections  D_ij = S_ij / (lam_j - lam_i) on
                      pairs with |S| <= 0.1 |gap|; exact 2x2 Jacobi
                      rotations on the adjacent unsafe pairs
                V  <- dw(V + V D) . J

    finish:     2x Newton + dw Rayleigh recompute and dw residual /
                orthogonality readbacks.

Clustered eigenvalues are handled ON DEVICE: per-pair corrections are
guarded (zeroed where the first-order step would not be small — exactly
where a naive pole sum diverges on clustered f32 spectra, measured at
n=4096 GOE where the min spacing meets the f32 residual), and the
guarded pairs are resolved by exact 2x2 Jacobi rotations on adjacent
columns in eigenvalue order with alternating parity, whose angles are
bounded by construction. See `_refine_impl`.

Real symmetric only: the axon tunnel cannot move complex buffers, and
the complex case splits into four real Ozaki products host-side already.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..kernels.extended import two_sum, two_prod
from ..kernels.ozaki import _emulated_core, _emulated_core_lean

_HIGHEST = jax.lax.Precision.HIGHEST

# above this size the refinement drives the decomposed small-jit sweep
# (the monolithic sweep program needs ~25 GB HBM at n=8192);
# ELX_REFINE_SPLIT_MIN overrides for A/B debugging
import os as _os

_SPLIT_MIN = int(_os.environ.get("ELX_REFINE_SPLIT_MIN", 6144))


def _dw_renorm(hi, lo):
    h, e = two_sum(hi, lo)
    return h, e


def _dw_colsum_prod(xh, xl, yh, yl):
    """Double-word column sums of the elementwise product of two dw
    matrices: returns (hi, lo) of shape (n,) with
    hi + lo ~= sum_i (x_i .* y_i) per column, ~2^-48 relative."""
    ph, pe = two_prod(xh, yh)
    pl = pe + xh * yl + xl * yh
    # log-depth pairwise double-word tree along axis 0
    n = ph.shape[0]
    hi, lo = ph, pl
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            z = jnp.zeros((pad, hi.shape[1]), hi.dtype)
            hi = jnp.concatenate([hi, z], axis=0)
            lo = jnp.concatenate([lo, z], axis=0)
        s, e = two_sum(hi[0::2], hi[1::2])
        lo = e + (lo[0::2] + lo[1::2])
        hi, e2 = two_sum(s, lo)
        lo = e2
        n = half
    # pin one copy per consumer (XLA fusion duplication would otherwise
    # recompute the tree with different association per consumer and
    # break downstream error-free transforms)
    return jax.lax.optimization_barrier((hi[0], lo[0]))


def _dw_div(nh, nl, dh, dl):
    """Double-word division (nh+nl)/(dh+dl), ~2^-48 relative."""
    q1 = nh / dh
    # residual r = n - q1*d computed error-free
    p, pe = two_prod(q1, dh)
    rh = (nh - p) - pe + nl - q1 * dl
    q2 = rh / dh
    return jax.lax.optimization_barrier(two_sum(q1, q2))


def _newton_ortho(vh, vl, n):
    """One Newton orthonormalization pass V <- V (I - E/2 + 3/8 E^2),
    E = V^T V - I (Ozaki Gram so E is dw-accurate; the correction is
    applied through an Ozaki product so the basis keeps ~2^-48
    orthogonality once converged)."""
    eye = jnp.eye(n, dtype=jnp.float32)
    gh, gl = _emulated_core(vh.T, vl.T, vh, vl)
    eh = gh - eye                     # Sterbenz-exact near 1
    el = gl
    e2 = jnp.dot(eh, eh, precision=_HIGHEST)
    mh, me = two_sum(-0.5 * eh, 0.375 * e2)
    ml = me - 0.5 * el
    ch, cl = _emulated_core(vh, vl, *_dw_renorm(mh, ml))
    sh, se = two_sum(vh, ch)
    return _dw_renorm(sh, vl + se + cl)


def _dw_rot_pair(ah, al, bh, bl, c, s):
    """dw rotation [a, b] <- [c a - s b, s a + c b] with f32 (c, s):
    products via two_prod so the dw words survive; c**2 + s**2 = 1 only
    to f32, which perturbs pair NORMS by ~1e-8 — the next Newton pass
    restores 2^-48 orthonormality (rotations inside a near-degenerate
    pair move vectors within the invariant subspace, where f32-grade
    angles cost only ~angle_err * gap of residual)."""
    p1h, p1e = two_prod(c, ah)
    p2h, p2e = two_prod(s, bh)
    xh, xe = two_sum(p1h, -p2h)
    xl = xe + (p1e - p2e) + (c * al - s * bl)
    q1h, q1e = two_prod(s, ah)
    q2h, q2e = two_prod(c, bh)
    yh, ye = two_sum(q1h, q2h)
    yl = ye + (q1e + q2e) + (s * al + c * bl)
    return (*_dw_renorm(xh, xl), *_dw_renorm(yh, yl))


def _window_rr(vh, vl, lam_h, qtr, off, b):
    """Windowed Rayleigh-Ritz cleanup: batched f32 eigendecomposition of
    the projected blocks S_w = diag(lam_w) + sym(qtr_w) over contiguous
    windows of ``b`` sorted columns starting at ``off``, rotating each
    window's columns by the window eigenbasis.

    This fixes ALL intra-window couplings at once regardless of
    magnitude — the coarse stage the guarded first-order corrections
    need when the input basis is f32-solver-grade (couplings ~1e-3 x
    scale exceed 0.1|gap| across the bulk, so every pair is 'unsafe'
    and the refinement otherwise freezes at the input residual —
    measured on-chip at n=4096). f32 U perturbs dw orthonormality at
    ~eps32; the next sweep's Newton pass restores 2^-48."""
    n = vh.shape[0]
    W = (n - off) // b
    lo, hi = off, off + W * b
    sub = qtr[lo:hi, lo:hi].reshape(W, b, W, b)
    diag_blocks = sub[jnp.arange(W), :, jnp.arange(W), :]   # (W, b, b)
    s_w = 0.5 * (diag_blocks + diag_blocks.transpose(0, 2, 1))
    s_w += jax.vmap(jnp.diag)(lam_h[lo:hi].reshape(W, b))
    lam_w, u_w = jnp.linalg.eigh(s_w)
    u_w = u_w.astype(jnp.float32)

    def rot(m):
        blk = m[:, lo:hi].reshape(n, W, b)
        new = jnp.einsum("nwb,wbc->nwc", blk, u_w,
                         precision=_HIGHEST).reshape(n, W * b)
        return m.at[:, lo:hi].set(new)

    lam_new = lam_h.at[lo:hi].set(lam_w.reshape(-1).astype(jnp.float32))
    return rot(vh), rot(vl), lam_new


def _refine_setup(v0, w32):
    """Enter in ascending eigenvalue order (adjacent columns = adjacent
    eigenvalues, so parity pairing sweeps real clusters)."""
    order0 = jnp.argsort(w32)
    vh = v0[:, order0].astype(jnp.float32)
    vl = jnp.zeros_like(vh)
    lam_h = jnp.sort(w32).astype(jnp.float32)
    lam_l = jnp.zeros_like(lam_h)
    scale = jnp.maximum(jnp.max(jnp.abs(w32)), 1e-30).astype(jnp.float32)
    return vh, vl, lam_h, lam_l, scale


def _sweep_head(a_hi, a_lo, vh, vl, extra_newton: bool):
    """Shared per-sweep prefix: Newton orthonormalization, dw Rayleigh
    values, dw residual R and projected couplings qtr. Returns the
    updated basis, values, qtr and the max-|R| residual scalar (the
    early-exit observable)."""
    n = a_hi.shape[0]
    vh, vl = _newton_ortho(vh, vl, n)
    if extra_newton:  # f32 input basis: one more pass to reach 2^-48
        vh, vl = _newton_ortho(vh, vl, n)
    avh, avl = _emulated_core(a_hi, a_lo, vh, vl)
    num_h, num_l = _dw_colsum_prod(vh, vl, avh, avl)
    den_h, den_l = _dw_colsum_prod(vh, vl, vh, vl)
    lam_h, lam_l = _dw_div(num_h, num_l, den_h, den_l)
    # R = AV - V*lam (dw)
    th, te = two_prod(vh, lam_h[None, :])
    tl = te + vh * lam_l[None, :] + vl * lam_h[None, :]
    rh, re = two_sum(avh, -th)
    rl = re + (avl - tl)
    rh, rl = _dw_renorm(rh, rl)
    resid = jnp.max(jnp.abs(rh + rl))
    # S_ij ~ v_i^T A v_j - delta_ij lam (V is 2^-48-orthonormal here)
    qtr = jnp.dot(vh.T, rh, precision=_HIGHEST) \
        + jnp.dot(vh.T, rl, precision=_HIGHEST)
    return vh, vl, lam_h, lam_l, qtr, resid


def _refine_rr_step(a_hi, a_lo, vh, vl, lam_h, lam_l, off: int,
                    extra_newton: bool = False, rr_b: int = 256):
    """Windowed Rayleigh-Ritz coarse sweep (offset ``off``)."""
    vh, vl, lam_h, lam_l, qtr, resid = _sweep_head(
        a_hi, a_lo, vh, vl, extra_newton)
    vh, vl, lam_h = _window_rr(vh, vl, lam_h, qtr, off, rr_b)
    return vh, vl, lam_h, jnp.zeros_like(lam_h), resid


def _refine_sweep_step(a_hi, a_lo, vh, vl, lam_h, lam_l, scale,
                       phase_idx: int, extra_newton: bool = False):
    """One guarded-correction + cyclic-2x2-Jacobi sweep.

    The guarded first-order correction is zeroed where the step
    |qtr_ij| > 0.1 |gap_ij| would not be small — exactly where a naive
    pole sum diverges on clustered f32 spectra; those pairs are handled
    by EXACT 2x2 Jacobi rotations on adjacent (odd/even parity
    alternating, offset 1 and 2) columns in eigenvalue order, whose
    angles are bounded by construction."""
    n = a_hi.shape[0]
    tiny = (8 * np.finfo(np.float32).eps) * scale
    cols = jnp.arange(n)
    vh, vl, lam_h, lam_l, qtr, resid = _sweep_head(
        a_hi, a_lo, vh, vl, extra_newton)
    gap = lam_h[:, None] - lam_h[None, :]
    safe = (jnp.abs(qtr) <= 0.1 * jnp.abs(gap)) & (jnp.abs(gap) > tiny)
    # ---- exact 2x2 Jacobi on unsafe pairs at small column offsets.
    # The schedule cycles disjoint pair classes: offset-1 pairs at
    # both parities, then offset-2 pairs at all four phases —
    # without the offset-2 classes, a cluster of >= 3 columns can
    # reach a FIXED POINT where both adjacent couplings are resolved
    # but the skip-one coupling is large (unsafe, so never corrected)
    # and never rotated (measured on planted degenerate triples).
    # distances 3-4 added in round 4: a degenerate cluster wider than
    # 3 columns has couplings the offset-1/2 classes never rotate and
    # the first-order step must skip (|gap| < tiny) — measured as a
    # permanent 2e-8 residual floor at n=8192
    dist, phase = [(1, 0), (1, 1), (2, 0), (2, 2),
                   (2, 1), (2, 3), (3, 0), (3, 3),
                   (4, 0), (4, 4), (3, 1), (3, 2),
                   (4, 2), (4, 6)][phase_idx % 14]
    a_idx = cols[phase:n - dist:2 * dist]
    b_idx = a_idx + dist
    sab = qtr[a_idx, b_idx]
    saa = lam_h[a_idx]
    sbb = lam_h[b_idx]
    # rotate only couplings above the dw noise floor: a degenerate
    # pair with |S| at noise level would otherwise rotate ~45 deg
    # EVERY sweep (tau ~ 0 -> t ~ 1) and keep re-churning its columns
    rot_tol = jnp.float32(2.0 ** -36) * scale
    need = ~safe[a_idx, b_idx] & (jnp.abs(sab) > rot_tol)
    tau_j = (sbb - saa) / jnp.where(need, 2.0 * sab, 1.0)
    tsign = jnp.where(tau_j >= 0, 1.0, -1.0)
    tj = tsign / (jnp.abs(tau_j) + jnp.sqrt(1.0 + tau_j * tau_j))
    cj = 1.0 / jnp.sqrt(1.0 + tj * tj)
    sj = tj * cj
    cj = jnp.where(need, cj, 1.0).astype(jnp.float32)
    sj = jnp.where(need, sj, 0.0).astype(jnp.float32)
    ah_, al_, bh_, bl_ = (vh[:, a_idx], vl[:, a_idx],
                          vh[:, b_idx], vl[:, b_idx])
    nh_a, nl_a, nh_b, nl_b = _dw_rot_pair(ah_, al_, bh_, bl_,
                                          cj[None, :], sj[None, :])
    vh = vh.at[:, a_idx].set(nh_a).at[:, b_idx].set(nh_b)
    vl = vl.at[:, a_idx].set(nl_a).at[:, b_idx].set(nl_b)
    # ---- separated-pair first-order correction (guarded).
    # qtr was measured BEFORE the rotations: any correction that
    # reads or writes a rotated column is stale (applying it after
    # the rotation re-injects junk every sweep — measured as a
    # self-sustaining ~1e-6 residual on degenerate clusters), so
    # block every pair touching a rotated column; those columns get
    # their correction on the next sweep, when they are not rotated.
    rotated = jnp.zeros((n,), bool).at[a_idx].set(need) \
        .at[b_idx].set(need)
    blocked = rotated[:, None] | rotated[None, :]
    # d_j = sum_i qtr_ij / (lam_j - lam_i) v_i = -V (qtr / gap)_j
    wmat = jnp.where(safe & ~blocked,
                     1.0 / jnp.where(safe, gap, 1.0), 0.0)
    d = -jnp.dot(vh, wmat * qtr, precision=_HIGHEST)
    sh, se = two_sum(vh, d)
    vh, vl = _dw_renorm(sh, vl + se)
    return vh, vl, lam_h, lam_l, resid


def _refine_finish(a_hi, a_lo, vh, vl):
    """Final Newton passes + dw diagnostics (residual, orthogonality,
    Rayleigh values)."""
    n = a_hi.shape[0]
    vh, vl = _newton_ortho(vh, vl, n)
    vh, vl = _newton_ortho(vh, vl, n)
    avh, avl = _emulated_core(a_hi, a_lo, vh, vl)
    num_h, num_l = _dw_colsum_prod(vh, vl, avh, avl)
    den_h, den_l = _dw_colsum_prod(vh, vl, vh, vl)
    lam_h, lam_l = _dw_div(num_h, num_l, den_h, den_l)
    th, te = two_prod(vh, lam_h[None, :])
    tl = te + vh * lam_l[None, :] + vl * lam_h[None, :]
    rh, re = two_sum(avh, -th)
    resid = jnp.max(jnp.abs(rh + (re + avl - tl)))
    gh, gl = _emulated_core(vh.T, vl.T, vh, vl)
    ortho = jnp.max(jnp.abs((gh - jnp.eye(n, dtype=jnp.float32)) + gl))
    return vh, vl, lam_h, lam_l, resid, ortho


_rr_jit = functools.partial(jax.jit,
                            static_argnames=("off", "extra_newton",
                                             "rr_b"))(_refine_rr_step)
_sweep_jit = functools.partial(jax.jit,
                               static_argnames=("phase_idx",
                                                "extra_newton"))(
    _refine_sweep_step)
_finish_jit = jax.jit(_refine_finish)


# ---- small-jit decomposition of the sweep (n >= ~6k): one monolithic
# sweep program holds every Ozaki split set + (n, n) f32 temporaries
# live at once — measured 25.5 GB with 64.7% fragmentation at n=8192
# against the chip's 15.75 GB HBM. Splitting the sweep into four jit
# units (Newton / A·V / Rayleigh+couplings / rotate-or-correct) caps
# the per-program peak at one Ozaki product (~2 GB of bf16 slices)
# plus the persistent state, at the price of materializing the
# intermediate avh/avl pair between calls.

@jax.jit
def _lean_jit(ah, al, bh, bl):
    return _emulated_core_lean(ah, al, bh, bl)


def _lean_cols(ah, al, bh, bl, parts: int = 2):
    """Ozaki product with the B operand column-chunked across SEPARATE
    jit programs. XLA:TPU's HBM allocator fragments the lean core's
    buffer pattern to ~87% at (8192, 8192) (17 GB allocated for 2.25 GB
    of data — 1.25 GB over the chip); per-chunk programs keep each
    allocation plan under the ceiling. The A split stack is recomputed
    per chunk (~ms of VPU work against ~100 ms of MXU products)."""
    n = bh.shape[1]
    if parts <= 1 or n % parts or n < 2048:
        return _lean_jit(ah, al, bh, bl)
    outs = [
        _lean_jit(ah, al, bh[:, i * (n // parts):(i + 1) * (n // parts)],
                  bl[:, i * (n // parts):(i + 1) * (n // parts)])
        for i in range(parts)
    ]
    return (jnp.concatenate([o[0] for o in outs], axis=1),
            jnp.concatenate([o[1] for o in outs], axis=1))


@jax.jit
def _gram_tail_jit(gh, gl):
    """Newton correction matrix M = -E/2 + 3/8 E^2 (renormed dw) from a
    precomputed Gram pair."""
    n = gh.shape[0]
    eye = jnp.eye(n, dtype=jnp.float32)
    eh = gh - eye
    el = gl
    e2 = jnp.dot(eh, eh, precision=_HIGHEST)
    mh, me = two_sum(-0.5 * eh, 0.375 * e2)
    ml = me - 0.5 * el
    return _dw_renorm(mh, ml)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _apply_tail_jit(vh, vl, ch, cl):
    sh, se = two_sum(vh, ch)
    return _dw_renorm(sh, vl + se + cl)


def _newton_jit(vh, vl):
    """One Newton pass as a host-level composition of column-chunked
    Ozaki programs + small jitted tails (one whole-pass program — and
    even one whole-PRODUCT program — fragments HBM past the chip at
    n=8192; see _lean_cols)."""
    mh, ml = _lean_cols(vh.T, vl.T, vh, vl)
    mh, ml = _gram_tail_jit(mh, ml)
    ch, cl = _lean_cols(vh, vl, mh, ml)
    return _apply_tail_jit(vh, vl, ch, cl)


def _av_jit(a_hi, a_lo, vh, vl):
    return _lean_cols(a_hi, a_lo, vh, vl)


@jax.jit
def _post_jit(vh, vl, avh, avl):
    """dw Rayleigh values, residual scalar and projected couplings from
    a precomputed AV pair."""
    num_h, num_l = _dw_colsum_prod(vh, vl, avh, avl)
    den_h, den_l = _dw_colsum_prod(vh, vl, vh, vl)
    lam_h, lam_l = _dw_div(num_h, num_l, den_h, den_l)
    th, te = two_prod(vh, lam_h[None, :])
    tl = te + vh * lam_l[None, :] + vl * lam_h[None, :]
    rh, re = two_sum(avh, -th)
    rl = re + (avl - tl)
    rh, rl = _dw_renorm(rh, rl)
    resid = jnp.max(jnp.abs(rh + rl))
    qtr = jnp.dot(vh.T, rh, precision=_HIGHEST) \
        + jnp.dot(vh.T, rl, precision=_HIGHEST)
    return lam_h, lam_l, qtr, resid


@functools.partial(jax.jit, static_argnames=("off", "rr_b"),
                   donate_argnums=(0, 1))
def _rr_rot_jit(vh, vl, lam_h, qtr, off: int, rr_b: int):
    return _window_rr(vh, vl, lam_h, qtr, off, rr_b)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _sortcols_jit(vh, vl, lam_h, qtr):
    """Re-sort columns by their (dw-accurate) Rayleigh values — the
    pairing-repair half of the mispaired-basis rescue. The f32 tridiag
    solver returns duplicated/mispaired vectors at n=8192 (dw Rayleigh
    quotients out of order by 0.1x scale, scratch/dbg_refine8192.py),
    so the 256-wide windowed RR never sees the cross-spectrum
    couplings and the refinement stalls at the f32 floor. Sorting by
    Rayleigh value makes every column's coupling partners LOCAL in
    column order (a column's Rayleigh sits at its dominant spectral
    component), after which the windowed RR sweeps can untangle them;
    each rescue buys one extra windowed sweep. (A full-space
    eigh-of-projection rescue is mathematically cleaner but XLA's
    native eigh at 8192 SIGKILLs this stack's remote compile helper —
    measured, both fused and as its own program.)"""
    order = jnp.argsort(lam_h)
    return (jnp.take(vh, order, axis=1, unique_indices=True),
            jnp.take(vl, order, axis=1, unique_indices=True),
            lam_h[order], qtr[order][:, order])


def _corr_core(vh, vl, lam_h, qtr, scale, phase_idx: int):
    """The rotate/guarded-correct tail of `_refine_sweep_step` given a
    precomputed qtr (same mathematics, no A products)."""
    n = vh.shape[0]
    tiny = (8 * np.finfo(np.float32).eps) * scale
    cols = jnp.arange(n)
    gap = lam_h[:, None] - lam_h[None, :]
    safe = (jnp.abs(qtr) <= 0.1 * jnp.abs(gap)) & (jnp.abs(gap) > tiny)
    # distances 3-4 added in round 4: a degenerate cluster wider than
    # 3 columns has couplings the offset-1/2 classes never rotate and
    # the first-order step must skip (|gap| < tiny) — measured as a
    # permanent 2e-8 residual floor at n=8192
    dist, phase = [(1, 0), (1, 1), (2, 0), (2, 2),
                   (2, 1), (2, 3), (3, 0), (3, 3),
                   (4, 0), (4, 4), (3, 1), (3, 2),
                   (4, 2), (4, 6)][phase_idx % 14]
    a_idx = cols[phase:n - dist:2 * dist]
    b_idx = a_idx + dist
    sab = qtr[a_idx, b_idx]
    saa = lam_h[a_idx]
    sbb = lam_h[b_idx]
    rot_tol = jnp.float32(2.0 ** -36) * scale
    need = ~safe[a_idx, b_idx] & (jnp.abs(sab) > rot_tol)
    tau_j = (sbb - saa) / jnp.where(need, 2.0 * sab, 1.0)
    tsign = jnp.where(tau_j >= 0, 1.0, -1.0)
    tj = tsign / (jnp.abs(tau_j) + jnp.sqrt(1.0 + tau_j * tau_j))
    cj = 1.0 / jnp.sqrt(1.0 + tj * tj)
    sj = tj * cj
    cj = jnp.where(need, cj, 1.0).astype(jnp.float32)
    sj = jnp.where(need, sj, 0.0).astype(jnp.float32)
    ah_, al_, bh_, bl_ = (vh[:, a_idx], vl[:, a_idx],
                          vh[:, b_idx], vl[:, b_idx])
    nh_a, nl_a, nh_b, nl_b = _dw_rot_pair(ah_, al_, bh_, bl_,
                                          cj[None, :], sj[None, :])
    vh = vh.at[:, a_idx].set(nh_a).at[:, b_idx].set(nh_b)
    vl = vl.at[:, a_idx].set(nl_a).at[:, b_idx].set(nl_b)
    rotated = jnp.zeros((n,), bool).at[a_idx].set(need) \
        .at[b_idx].set(need)
    blocked = rotated[:, None] | rotated[None, :]
    wmat = jnp.where(safe & ~blocked,
                     1.0 / jnp.where(safe, gap, 1.0), 0.0)
    d = -jnp.dot(vh, wmat * qtr, precision=_HIGHEST)
    sh, se = two_sum(vh, d)
    vh, vl = _dw_renorm(sh, vl + se)
    return vh, vl


_corr_jit = functools.partial(jax.jit, static_argnames=("phase_idx",),
                              donate_argnums=(0, 1))(_corr_core)


def _ortho_jit(vh, vl):
    gh, gl = _lean_cols(vh.T, vl.T, vh, vl)
    n = vh.shape[0]
    return jnp.max(jnp.abs((gh - jnp.eye(n, dtype=jnp.float32)) + gl))


def _refine_impl(a_hi, a_lo, v0, w32, iters: int = 6,
                 tol: float = 8e-14, history=None):
    """Refinement core: f32 A pair + f32 eigenbasis/values in, dw
    eigenpairs + diagnostics out. Host-DRIVEN loop of device-resident
    jitted sweeps: each sweep reads back ONE residual scalar (29 ms
    tunnel RTT — negligible against a multi-second sweep) and exits
    early once max|AV - V lam| / scale <= ``tol`` or the residual
    plateaus (VERDICT r4 item 4: the fixed iters=6 schedule was
    unexamined; the measured per-sweep curve lives in PERF.md).

    Per sweep mathematics unchanged from round 3: Newton
    orthonormalization, windowed Rayleigh-Ritz coarse sweeps first
    (f32-solver-grade entry bases), then guarded separated-pair
    corrections + exact 2x2 Jacobi on clustered pairs."""
    n = a_hi.shape[0]
    vh, vl, lam_h, lam_l, scale = _refine_setup(v0, w32)
    scale_f = float(scale)
    # large problems enter with f32-SOLVER-grade bases (couplings ~1e-3
    # x scale): two windowed Rayleigh-Ritz sweeps (offset 0, then b/2)
    # coarse-clean every intra-window coupling before the guarded
    # first-order scheme takes over (see _window_rr)
    rr_b = 256
    rr = 2 if n >= 2 * rr_b else 0
    # monolithic sweep programs OOM HBM at n=8192 (25.5 GB needed);
    # above this knee drive the decomposed small-jit sweep instead
    split = n >= _SPLIT_MIN
    prev = np.inf
    first_head = True
    if split:
        # ---- phase A: pairing repair. The f32 solver's basis at this
        # scale carries duplicated/mispaired columns (dw Rayleigh
        # values out of order by 0.1x scale — dbg_refine8192.py);
        # sort columns by Rayleigh value (mixing becomes column-local)
        # and untangle with WIDE (1024) RR windows; repeat until the
        # ordering is clean. Well-paired bases exit after one check.
        big_b = min(1024, rr_b * 4)
        for rnd in range(6):
            vh, vl = _newton_jit(vh, vl)
            if first_head:
                vh, vl = _newton_jit(vh, vl)
                first_head = False
            avh, avl = _av_jit(a_hi, a_lo, vh, vl)
            lam_h, lam_l, qtr, resid = _post_jit(vh, vl, avh, avl)
            del avh, avl
            if history is not None:
                history.append(float(resid) / scale_f)
            if float(jnp.min(jnp.diff(lam_h))) >= -1e-4 * scale_f:
                break
            # the couplings permute with the columns — no fresh head
            vh, vl, lam_h, qtr = _sortcols_jit(vh, vl, lam_h, qtr)
            off = 0 if rnd % 2 == 0 else big_b // 2
            if (a_hi.shape[0] - off) // big_b >= 1:
                vh, vl, lam_h = _rr_rot_jit(vh, vl, lam_h, qtr, off=off,
                                            rr_b=big_b)
            lam_l = jnp.zeros_like(lam_h)
        # ---- phase B: standard windowed RR sweeps
        for sweep in range(rr):
            off = 0 if sweep % 2 == 0 else rr_b // 2
            vh, vl = _newton_jit(vh, vl)
            avh, avl = _av_jit(a_hi, a_lo, vh, vl)
            lam_h, lam_l, qtr, resid = _post_jit(vh, vl, avh, avl)
            del avh, avl
            vh, vl, lam_h = _rr_rot_jit(vh, vl, lam_h, qtr, off=off,
                                        rr_b=rr_b)
            lam_l = jnp.zeros_like(lam_h)
            if history is not None:
                history.append(float(resid) / scale_f)
    else:
        for sweep in range(rr):
            off = 0 if sweep % 2 == 0 else rr_b // 2
            vh, vl, lam_h, lam_l, resid = _rr_jit(
                a_hi, a_lo, vh, vl, lam_h, lam_l, off=off,
                extra_newton=(sweep == 0), rr_b=rr_b)
            if history is not None:
                history.append(float(resid) / scale_f)
    if split:
        # corrections with adaptive RR fallback: when a guarded sweep
        # fails to shrink the residual (a few columns still carry
        # window-scale mixing the first-order step must skip), spend a
        # windowed-RR sweep instead of breaking — measured at n=8192:
        # corrections alone stall at ~1.5e-5 while an RR sweep cuts
        # x40. Bounded by rr_left extra sweeps.
        rr_left = 4
        phase = 0
        sweep = 0
        while sweep < iters + 4:
            vh, vl = _newton_jit(vh, vl)
            if sweep == 0 and rr == 0:
                vh, vl = _newton_jit(vh, vl)
            avh, avl = _av_jit(a_hi, a_lo, vh, vl)
            lam_h, lam_l, qtr, resid = _post_jit(vh, vl, avh, avl)
            del avh, avl
            rel = float(resid) / scale_f
            if history is not None:
                history.append(rel)
            if rel <= tol:
                break
            stalled = rel > 0.3 * prev
            if stalled and rr_left > 0 and sweep > 0:
                off = 0 if rr_left % 2 == 0 else rr_b // 2
                vh, vl, lam_h = _rr_rot_jit(vh, vl, lam_h, qtr,
                                            off=off, rr_b=rr_b)
                lam_l = jnp.zeros_like(lam_h)
                rr_left -= 1
            elif sweep >= 2 and rel > 0.9 * prev and rr_left == 0:
                break
            else:
                vh, vl = _corr_jit(vh, vl, lam_h, qtr, scale,
                                   phase_idx=phase % 14)
                phase += 1
            prev = rel
            sweep += 1
    else:
        for sweep in range(iters):
            vh, vl, lam_h, lam_l, resid = _sweep_jit(
                a_hi, a_lo, vh, vl, lam_h, lam_l, scale,
                phase_idx=sweep % 14,
                extra_newton=(sweep == 0 and rr == 0))
            rel = float(resid) / scale_f
            if history is not None:
                history.append(rel)
            # resid measures the basis BEFORE this sweep's correction;
            # plateau = this sweep had nothing left to fix
            if rel <= tol:
                break
            if sweep >= 2 and rel > 0.7 * prev:
                break
            prev = rel
    if split:
        vh, vl = _newton_jit(vh, vl)
        vh, vl = _newton_jit(vh, vl)
        avh, avl = _av_jit(a_hi, a_lo, vh, vl)
        lam_h, lam_l, _, resid = _post_jit(vh, vl, avh, avl)
        del avh, avl
        ortho = _ortho_jit(vh, vl)
    else:
        vh, vl, lam_h, lam_l, resid, ortho = _finish_jit(
            a_hi, a_lo, vh, vl)
    return vh, vl, lam_h, lam_l, resid, ortho, scale


def _refine_device(a_hi, a_lo, v0, w32, iters: int = 6, history=None):
    """Backend-aware dispatch of the refinement core.

    XLA:CPU HAZARD (measured, 2026-08): under jit, XLA:CPU sinks
    duplicated copies of a multiply into consumer fusions and contracts
    mul+add to FMA (the duplicated product is never rounded), so
    different consumers of a TwoProd high word see INCONSISTENT values
    and the error-free transforms silently degrade to f32 — the dw
    refinement stalls at ~eps32-grade residuals. optimization_barrier
    does not help (XLA:CPU strips barriers before fusion), and no
    available xla_cpu flag disables the contraction. XLA:TPU honors the
    EFTs under jit (validated on-chip: 5e-15 relative at n=1024), so on
    CPU backends only we run the core eagerly (per-op dispatch keeps
    every rounding point real); tests exercise exactly what the TPU
    executes, just op-by-op."""
    if jax.default_backend() == "cpu":
        with jax.disable_jit():
            return _refine_impl(a_hi, a_lo, v0, w32, iters=iters,
                                history=history)
    return _refine_impl(a_hi, a_lo, v0, w32, iters=iters, history=history)


def _dw_axpy(xh, xl, d):
    """dw x + f32 d (error-free accumulate)."""
    sh, se = two_sum(xh, d)
    return _dw_renorm(sh, xl + se)


def RefinedLinearSolveDevice(A: DistMatrix, b, iters: int = 10,
                             a_lo=None, history=None):
    """Device-resident mixed-precision iterative refinement of a general
    solve: f32 LU factors + dw (Ozaki) residuals, everything on the MXU
    (VERDICT r4 item 7 — the host `refine.RefinedLinearSolve` re-uploads
    the operands per sweep; here only the per-iteration residual scalar
    crosses the tunnel). Returns (x64 on host, scaled residual in the
    LAPACK-style metric ||r||_inf / (eps64 n (||A||max ||x||_inf +
    ||b||_inf))); on a failed (non-halving / non-finite) step the
    previous iterate is returned, never the degraded one.

    Reference: the LAPACK xGERFS contract the reference meets through
    vendor solvers (SURVEY §2.6); BASELINE.md correctness configs."""
    from ..core.types import MC, MR
    from .lu import LU, SolveAfter

    n = A.m
    F, P = LU(A)
    a_hi = A.redistribute(MC, MR).data[:n, :n].astype(jnp.float32)
    alo = jnp.zeros_like(a_hi) if a_lo is None else jnp.asarray(
        a_lo, jnp.float32)
    b64 = np.asarray(b, np.float64).reshape(n, -1)
    bh = jnp.asarray(b64.astype(np.float32))
    bl = jnp.asarray((b64 - np.asarray(bh, np.float64)).astype(np.float32))

    @jax.jit
    def resid_dw(xh, xl):
        ph, pl = _emulated_core(a_hi, alo, xh, xl)
        rh, re = two_sum(bh, -ph)
        rl = re + (bl - pl)
        rh, rl = _dw_renorm(rh, rl)
        return rh, rl, jnp.max(jnp.abs(rh + rl))

    from ..core.types import NORMAL as _N

    @jax.jit
    def step(xh, xl):
        rh, rl, res = resid_dw(xh, xl)
        Rdm = DistMatrix.from_global(rh + rl, grid=A.grid)
        d = SolveAfter(_N, F, P, Rdm).data[:n, :b64.shape[1]]
        nh, nl = _dw_axpy(xh, xl, d)
        return nh, nl, res

    xh = jnp.zeros((n, b64.shape[1]), jnp.float32)
    xl = jnp.zeros_like(xh)
    prev = np.inf
    best = (xh, xl)
    # XLA:CPU strips the EFT rounding points under jit (see
    # _refine_device) — run the dw loop eagerly there, jitted on TPU
    with jax.disable_jit(disable=jax.default_backend() == "cpu"):
        for _ in range(iters):
            nh, nl, res = step(*best)
            r = float(res)  # residual of the CURRENT best iterate
            if history is not None:
                history.append(r)
            if not np.isfinite(r) or r >= 0.5 * prev:
                # keep the previous iterate: a non-halving (or
                # non-finite) step would return a degraded/NaN update
                # (ADVICE r4) — standard iterative-refinement practice
                break
            best = (nh, nl)
            prev = r
        xh, xl = best
        _, _, res = resid_dw(xh, xl)
    x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    # LAPACK-style test ratio: ||r||_inf / (eps n (||A||_inf ||x||_inf
    # + ||b||_inf)) — the ||A|| ||x|| term keeps the metric honest for
    # near-singular systems where ||A x|| >> ||b|| (ADVICE r4)
    denom = float(jnp.max(jnp.abs(a_hi + alo))) * np.max(np.abs(x64)) \
        + np.max(np.abs(b64))
    scaled = float(res) / (np.finfo(np.float64).eps * n
                           * max(denom, 1e-300))
    return (x64 if np.asarray(b).ndim > 1 else x64[:, 0]), scaled


def _newton_ortho_cols(xh, xl):
    """Newton orthonormalization generalized to TALL dw bases (m, k)."""
    k = xh.shape[1]
    eye = jnp.eye(k, dtype=jnp.float32)
    gh, gl = _emulated_core(xh.T, xl.T, xh, xl)
    eh = gh - eye
    e2 = jnp.dot(eh, eh, precision=_HIGHEST)
    mh, me = two_sum(-0.5 * eh, 0.375 * e2)
    ml = me - 0.5 * gl
    ch, cl = _emulated_core(xh, xl, *_dw_renorm(mh, ml))
    sh, se = two_sum(xh, ch)
    return _dw_renorm(sh, xl + se + cl)


def _svd_sweep_head(a_hi, a_lo, uh, ul, vh, vl):
    """Shared SVD sweep prefix: Newton-orthonormalize both bases, dw
    AV/AtU products, dw Rayleigh singular values, dw residual blocks."""
    uh, ul = _newton_ortho_cols(uh, ul)
    vh, vl = _newton_ortho_cols(vh, vl)
    avh, avl = _emulated_core(a_hi, a_lo, vh, vl)          # (m, k)
    tuh, tul = _emulated_core(a_hi.T, a_lo.T, uh, ul)      # (n, k)
    sh, sl = _dw_colsum_prod(uh, ul, avh, avl)             # sigma (dw)
    # R = AV - U sig ; P = AtU - V sig (dw)
    th, te = two_prod(uh, sh[None, :])
    tl = te + uh * sl[None, :] + ul * sh[None, :]
    rh, re = two_sum(avh, -th)
    rl = re + (avl - tl)
    rh, rl = _dw_renorm(rh, rl)
    qh, qe = two_prod(vh, sh[None, :])
    ql = qe + vh * sl[None, :] + vl * sh[None, :]
    ph, pe = two_sum(tuh, -qh)
    pl = pe + (tul - ql)
    ph, pl = _dw_renorm(ph, pl)
    resid = jnp.maximum(jnp.max(jnp.abs(rh + rl)),
                        jnp.max(jnp.abs(ph + pl)))
    c1 = jnp.dot(uh.T, rh, precision=_HIGHEST) \
        + jnp.dot(uh.T, rl, precision=_HIGHEST)
    c2 = jnp.dot(vh.T, ph, precision=_HIGHEST) \
        + jnp.dot(vh.T, pl, precision=_HIGHEST)
    return uh, ul, vh, vl, sh, (rh, rl), c1, c2, resid


def _svd_rr_step(a_hi, a_lo, uh, ul, vh, vl, sig, off: int, b: int = 256):
    """Windowed SVD Rayleigh-Ritz coarse sweep: batched small SVDs of
    the projected blocks B_w = diag(sig_w) + C_w over contiguous windows
    of sorted singular values; rotates BOTH bases by the window factors.
    The coarse stage an f32-solver-grade entry basis needs before
    first-order corrections can act (same rationale as _window_rr)."""
    uh, ul, vh, vl, sh, _, c1, _, resid = _svd_sweep_head(
        a_hi, a_lo, uh, ul, vh, vl)
    k = uh.shape[1]
    W = (k - off) // b
    lo, hi = off, off + W * b
    sub = c1[lo:hi, lo:hi].reshape(W, b, W, b)
    diag_blocks = sub[jnp.arange(W), :, jnp.arange(W), :]
    b_w = diag_blocks + jax.vmap(jnp.diag)(sh[lo:hi].reshape(W, b))
    uw, sw, vwt = jnp.linalg.svd(b_w, full_matrices=False)
    # ascending order inside each window (global order is ascending)
    uw = uw[:, :, ::-1].astype(jnp.float32)
    vw = vwt.transpose(0, 2, 1)[:, :, ::-1].astype(jnp.float32)
    sw = sw[:, ::-1]

    def rot(m, f):
        blk = m[:, lo:hi].reshape(m.shape[0], W, b)
        new = jnp.einsum("nwb,wbc->nwc", blk, f,
                         precision=_HIGHEST).reshape(m.shape[0], W * b)
        return m.at[:, lo:hi].set(new)

    sig = sh.at[lo:hi].set(sw.reshape(-1).astype(jnp.float32))
    return rot(uh, uw), rot(ul, uw), rot(vh, vw), rot(vl, vw), sig, resid


def _svd_sweep_step(a_hi, a_lo, uh, ul, vh, vl, sig, scale):
    """One guarded first-order SVD correction sweep (the implicit
    Jordan-Wielandt form of the eigen sweep — see refine.RefinedSVD for
    the algebra; here everything device-resident in dw)."""
    uh, ul, vh, vl, sh, (rh, rl), c1, c2, resid = _svd_sweep_head(
        a_hi, a_lo, uh, ul, vh, vl)
    tiny = (8 * np.finfo(np.float32).eps) * scale
    gp = sh[:, None] - sh[None, :]
    gm = -sh[:, None] - sh[None, :]
    a_ = 0.5 * (c1 + c2)
    b_ = 0.5 * (c1 - c2)
    okp = (jnp.abs(a_) <= 0.1 * jnp.abs(gp)) & (jnp.abs(gp) > tiny)
    okm = (jnp.abs(b_) <= 0.1 * jnp.abs(gm)) & (jnp.abs(gm) > tiny)
    wp = jnp.where(okp, a_ / jnp.where(okp, gp, 1.0), 0.0)
    wm = jnp.where(okm, b_ / jnp.where(okm, gm, 1.0), 0.0)
    du = jnp.dot(uh, wp + wm, precision=_HIGHEST)
    dv = jnp.dot(vh, wp - wm, precision=_HIGHEST)
    # out-of-span left correction (m > n): (I - U U^T) R / sig
    ssafe = jnp.where(jnp.abs(sh) > tiny, sh, 1.0)
    uperp = jnp.where(jnp.abs(sh) > tiny, 1.0 / ssafe, 0.0)[None, :] * (
        (rh + rl) - jnp.dot(uh, c1, precision=_HIGHEST))
    uh, ul = _dw_axpy(uh, ul, uperp - du)
    vh, vl = _dw_axpy(vh, vl, -dv)
    return uh, ul, vh, vl, sh, resid


def _svd_finish(a_hi, a_lo, uh, ul, vh, vl):
    uh, ul = _newton_ortho_cols(uh, ul)
    uh, ul = _newton_ortho_cols(uh, ul)
    vh, vl = _newton_ortho_cols(vh, vl)
    vh, vl = _newton_ortho_cols(vh, vl)
    avh, avl = _emulated_core(a_hi, a_lo, vh, vl)
    sh, sl = _dw_colsum_prod(uh, ul, avh, avl)
    th, te = two_prod(uh, sh[None, :])
    tl = te + uh * sl[None, :] + ul * sh[None, :]
    rh, re = two_sum(avh, -th)
    resid = jnp.max(jnp.abs(rh + (re + avl - tl)))
    k = uh.shape[1]
    gh, gl = _emulated_core(uh.T, ul.T, uh, ul)
    ortho_u = jnp.max(jnp.abs((gh - jnp.eye(k, dtype=jnp.float32)) + gl))
    gh, gl = _emulated_core(vh.T, vl.T, vh, vl)
    ortho_v = jnp.max(jnp.abs((gh - jnp.eye(k, dtype=jnp.float32)) + gl))
    return uh, ul, vh, vl, sh, sl, resid, jnp.maximum(ortho_u, ortho_v)


_svd_rr_jit = functools.partial(jax.jit, static_argnames=("off", "b"))(
    _svd_rr_step)
_svd_sweep_jit = jax.jit(_svd_sweep_step)
_svd_finish_jit = jax.jit(_svd_finish)


def RefinedSVDDevice(A: DistMatrix, iters: int = 6, a_lo=None,
                     tol: float = 8e-14, history=None):
    """Device-resident dw refinement of the f32 on-chip SVD (real A,
    m >= n) to ~2^-48 residuals — the SVD face of
    `RefinedHermitianEigDevice` (VERDICT r4 item 7). Host-driven sweep
    loop with one residual scalar readback per sweep and early exit.
    Returns (U64, s64 descending, V64, relative residual
    max(|AV - U s|, |A^T U - V s|) / s_max)."""
    from ..core.types import MC, MR
    from .svd import SVD

    m, n = A.m, A.n
    Udm, s32, Vdm = SVD(A)
    a_hi = A.redistribute(MC, MR).data[:m, :n].astype(jnp.float32)
    alo = jnp.zeros_like(a_hi) if a_lo is None else jnp.asarray(
        a_lo, jnp.float32)
    s32 = jnp.asarray(s32, jnp.float32)[:n]
    order0 = jnp.argsort(s32)
    uh = Udm.redistribute(MC, MR).data[:m, :n][:, order0].astype(
        jnp.float32)
    vh = Vdm.redistribute(MC, MR).data[:n, :n][:, order0].astype(
        jnp.float32)
    ul = jnp.zeros_like(uh)
    vl = jnp.zeros_like(vh)
    sig = jnp.sort(s32)
    scale = float(jnp.maximum(jnp.max(jnp.abs(s32)), 1e-30))
    rr_b = 256
    rr = 2 if n >= 2 * rr_b else 0
    prev = np.inf
    # XLA:CPU strips the EFT rounding points under jit — run eagerly
    # there (see _refine_device)
    with jax.disable_jit(disable=jax.default_backend() == "cpu"):
        for sweep in range(rr):
            off = 0 if sweep % 2 == 0 else rr_b // 2
            uh, ul, vh, vl, sig, resid = _svd_rr_jit(
                a_hi, alo, uh, ul, vh, vl, sig, off=off, b=rr_b)
            if history is not None:
                history.append(float(resid) / scale)
        for sweep in range(iters):
            uh, ul, vh, vl, sig, resid = _svd_sweep_jit(
                a_hi, alo, uh, ul, vh, vl, sig, jnp.float32(scale))
            rel = float(resid) / scale
            if history is not None:
                history.append(rel)
            if rel <= tol:
                break
            if sweep >= 2 and rel > 0.7 * prev:
                break
            prev = rel
        uh, ul, vh, vl, sh, sl, resid, ortho = _svd_finish_jit(
            a_hi, alo, uh, ul, vh, vl)
    s64 = np.asarray(sh, np.float64) + np.asarray(sl, np.float64)
    U64 = np.asarray(uh, np.float64) + np.asarray(ul, np.float64)
    V64 = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    order = np.argsort(-s64)
    rel = float(np.asarray(resid)) / scale
    return U64[:, order], s64[order], V64[:, order], rel


def RefinedHermitianEigDevice(uplo, A: DistMatrix, iters: int = 6,
                              a_lo: Optional[np.ndarray] = None,
                              history=None
                              ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Device-resident refinement of the f32 on-chip eigendecomposition
    to ~2^-48 residuals. Returns (w ~f64 on host, V hi+lo recombined on
    host as f64, raw relative residual max|AV - V lam| / max|w|).

    ``a_lo``: optional f32 low words when the true matrix is f64 (A.data
    then holds the high words); omitted -> A.data IS the matrix.
    ``history``: optional list; appends the per-sweep relative residual
    (the accuracy-vs-sweeps observable).
    """
    from ..core.types import MC, MR
    from .hermitian_eig import HermitianEig

    w, Q = HermitianEig(uplo, A, vectors=True)
    n = A.m
    # device-resident slices — NO host round-trip of the (n, n) operands
    # (a global_array() pull costs ~2x64 MB over the tunnel at n=4096)
    a_hi = A.redistribute(MC, MR).data[:n, :n].astype(jnp.float32)
    # symmetrize from the referenced triangle like the host path
    tri = jnp.tril(a_hi) if uplo == 0 else jnp.triu(a_hi)
    off = jnp.tril(a_hi, -1) if uplo == 0 else jnp.triu(a_hi, 1)
    a_hi = tri + off.T
    alo = jnp.zeros_like(a_hi) if a_lo is None else jnp.asarray(
        a_lo, jnp.float32)
    v0 = Q.redistribute(MC, MR).data[:n, :n].astype(jnp.float32)
    vh, vl, lam_h, lam_l, resid, ortho, scale = _refine_device(
        a_hi, alo, v0, jnp.asarray(w, jnp.float32)[:n], iters=iters,
        history=history)
    w64 = np.asarray(lam_h, np.float64) + np.asarray(lam_l, np.float64)
    V64 = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    order = np.argsort(w64)
    rel = float(np.asarray(resid)) / float(np.asarray(scale))
    return w64[order], V64[:, order], rel
