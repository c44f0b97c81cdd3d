"""Equilibration scalings (reference: src/lapack_like/equilibrate/ —
Ruiz iterative scaling, geometric row/column scaling, symmetric Ruiz)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix


def _row_max(data, pad_mask):
    return jnp.max(jnp.where(pad_mask, jnp.abs(data), 0.0), axis=1)


def _col_max(data, pad_mask):
    return jnp.max(jnp.where(pad_mask, jnp.abs(data), 0.0), axis=0)


def RuizEquil(A: DistMatrix, max_iter: int = 3
              ) -> Tuple[DistMatrix, jax.Array, jax.Array]:
    """Ruiz scaling: iteratively divide rows/cols by sqrt of their max
    norms (reference: equilibrate/RuizEquil.cpp). Returns (scaled A,
    d_row, d_col) with A_orig = diag(d_row) A_scaled diag(d_col)."""
    d = A.data
    mask = A.pad_mask()
    drow = jnp.ones((d.shape[0],), jnp.real(d).dtype)
    dcol = jnp.ones((d.shape[1],), jnp.real(d).dtype)

    def body(_, carry):
        d, drow, dcol = carry
        r = jnp.sqrt(_row_max(d, mask))
        r = jnp.where(r == 0, 1.0, r)
        d = d / r[:, None].astype(d.dtype)
        drow = drow * r
        c = jnp.sqrt(_col_max(d, mask))
        c = jnp.where(c == 0, 1.0, c)
        d = d / c[None, :].astype(d.dtype)
        dcol = dcol * c
        return d, drow, dcol

    d, drow, dcol = jax.lax.fori_loop(0, max_iter, body, (d, drow, dcol))
    return A.with_data(d), drow, dcol


def GeomEquil(A: DistMatrix) -> Tuple[DistMatrix, jax.Array, jax.Array]:
    """Geometric-mean scaling (reference: equilibrate/GeomEquil.cpp):
    scale rows/cols by sqrt(min*max) of their absolute entries."""
    d = A.data
    mask = A.pad_mask()
    absd = jnp.abs(d)
    big = jnp.where(mask, absd, 0.0)
    small = jnp.where(mask & (absd > 0), absd, jnp.inf)
    rmax = jnp.max(big, axis=1)
    rmin = jnp.min(small, axis=1)
    r = jnp.sqrt(jnp.where(jnp.isfinite(rmin), rmax * rmin, rmax))
    r = jnp.where((r == 0) | ~jnp.isfinite(r), 1.0, jnp.sqrt(r))
    d = d / r[:, None].astype(d.dtype)
    absd = jnp.abs(d)
    big = jnp.where(mask, absd, 0.0)
    small = jnp.where(mask & (absd > 0), absd, jnp.inf)
    cmax = jnp.max(big, axis=0)
    cmin = jnp.min(small, axis=0)
    c = jnp.sqrt(jnp.where(jnp.isfinite(cmin), cmax * cmin, cmax))
    c = jnp.where((c == 0) | ~jnp.isfinite(c), 1.0, jnp.sqrt(c))
    d = d / c[None, :].astype(d.dtype)
    return A.with_data(d), r, c


def SymmetricRuizEquil(A: DistMatrix, max_iter: int = 3
                       ) -> Tuple[DistMatrix, jax.Array]:
    """Symmetric Ruiz (reference: equilibrate/SymmetricRuizEquil.cpp)."""
    d = A.data
    mask = A.pad_mask()
    dscale = jnp.ones((d.shape[0],), jnp.real(d).dtype)

    def body(_, carry):
        d, dscale = carry
        r = jnp.sqrt(jnp.maximum(_row_max(d, mask), _col_max(d, mask)))
        r = jnp.where(r == 0, 1.0, r)
        d = d / r[:, None].astype(d.dtype) / r[None, :].astype(d.dtype)
        return d, dscale * r

    d, dscale = jax.lax.fori_loop(0, max_iter, body, (d, dscale))
    return A.with_data(d), dscale


def SymmetricDiagonalEquil(A: DistMatrix
                           ) -> Tuple[DistMatrix, jax.Array]:
    """Diagonal equilibration (reference:
    equilibrate/SymmetricDiagonalEquil.cpp — a no-op for dense matrices
    upstream, kept for interface parity: returns A and unit scales)."""
    return A, jnp.ones((A.data.shape[0],), jnp.real(A.data).dtype)


def SymmetricGeomEquil(A: DistMatrix, min_iter: int = 3,
                       max_iter: int = 10
                       ) -> Tuple[DistMatrix, jax.Array]:
    """Symmetric geometric-mean equilibration (reference:
    equilibrate/SymmetricGeomEquil.cpp): per sweep, scale index j by
    sqrt over the damped geometric column mean sqrt(min*max) applied
    SYMMETRICALLY (rows and columns), then three max-normalization
    sweeps. Fixed-trip fori_loop (the reference's relTol early exit
    becomes a masked no-op) — returns (scaled A, d) with
    A_orig = diag(d) A_scaled diag(d)."""
    damp = 1.0 / 1000.0
    sqrt_damp = damp ** 0.5
    rel_tol = 0.9
    d = A.data
    mask = A.pad_mask()
    rdt = jnp.real(d).dtype
    dscale = jnp.ones((d.shape[0],), rdt)

    def ratio_of(d):
        absd = jnp.abs(d)
        mx = jnp.max(jnp.where(mask, absd, 0.0))
        mn = jnp.min(jnp.where(mask & (absd > 0), absd, jnp.inf))
        return jnp.where(jnp.isfinite(mn), mx / mn, 1.0)

    def body(it, carry):
        d, dscale, ratio, stop = carry
        absd = jnp.abs(d)
        cmax = jnp.max(jnp.where(mask, absd, 0.0), axis=0)
        cmin = jnp.min(jnp.where(mask & (absd > 0), absd, jnp.inf), axis=0)
        prop = jnp.sqrt(jnp.where(jnp.isfinite(cmin), cmin * cmax, cmax))
        scale = jnp.maximum(prop, sqrt_damp * cmax)
        scale = jnp.where(scale == 0, 1.0, scale)
        scale = jnp.sqrt(scale)  # SquareRootScaling after DampScaling
        dn = d / scale[:, None].astype(d.dtype) \
            / scale[None, :].astype(d.dtype)
        new_ratio = ratio_of(dn)
        # reference breaks once iter >= minIter and progress stalls
        stop_new = stop | ((it >= min_iter) & (new_ratio >= ratio * rel_tol))
        keep = stop
        d = jnp.where(keep, d, dn)
        dscale = jnp.where(keep, dscale, dscale * scale)
        ratio = jnp.where(keep, ratio, new_ratio)
        return d, dscale, ratio, stop_new

    d, dscale, _, _ = jax.lax.fori_loop(
        0, max_iter, body, (d, dscale, ratio_of(d),
                            jnp.asarray(False)))
    # normalize maximum absolute values towards one (3 sweeps)
    for _ in range(3):
        absd = jnp.abs(d)
        cmax = jnp.maximum(jnp.max(jnp.where(mask, absd, 0.0), axis=0), 1.0)
        s = jnp.sqrt(cmax)
        d = d / s[:, None].astype(d.dtype) / s[None, :].astype(d.dtype)
        dscale = dscale * s
    return A.with_data(d), dscale
