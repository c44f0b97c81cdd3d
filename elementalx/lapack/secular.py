"""Secular equation solvers for rank-one-modified eigen/SVD problems.

Reference: src/lapack_like/spectral/SecularEVD.cpp, SecularSVD.cpp,
CubicSecular.cpp — the core of the divide-and-conquer eigensolvers.

TPU-native: all n roots of the secular equation
    f(lam) = 1 + rho * sum_i z_i^2 / (d_i - lam) = 0
are bracketed by the poles and solved simultaneously with vmapped
bisection (fixed trip count, monotone f per interval), then polished
with a few Newton steps."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _f(lam, d, z2, rho):
    return 1.0 + rho * jnp.sum(z2 / (d - lam))


def SecularEVD(d: jax.Array, z: jax.Array, rho: float = 1.0,
               bisect_iters: int = 60, newton_iters: int = 3
               ) -> Tuple[jax.Array, jax.Array]:
    """Eigenvalues and eigenvectors of diag(d) + rho z z^T with d
    ascending (reference: SecularEVD.cpp). Assumes the deflated problem:
    distinct d_i and nonzero z_i (the reference's deflation preprocessing
    is the caller's job, as there)."""
    n = d.shape[0]
    z2 = z * z
    znorm2 = jnp.sum(z2)
    # root k lies in (d_k, d_{k+1}) for rho>0, last root in
    # (d_{n-1}, d_{n-1} + rho*||z||^2)
    lo = d
    hi = jnp.concatenate([d[1:], jnp.array([d[-1] + rho * znorm2 + 1.0])])
    eps = jnp.finfo(d.dtype).eps
    span = hi - lo
    lo = lo + eps * span
    hi = hi - eps * span

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        fm = jax.vmap(lambda m: _f(m, d, z2, rho))(mid)
        # f increases from -inf to +inf... for rho>0 f is increasing in
        # each interval: f<0 => root above mid
        root_above = fm < 0
        lo = jnp.where(root_above, mid, lo)
        hi = jnp.where(root_above, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, bisect_iters, bisect, (lo, hi))
    lam = 0.5 * (lo + hi)

    def newton(_, lam):
        f = jax.vmap(lambda m: _f(m, d, z2, rho))(lam)
        fp = jax.vmap(lambda m: rho * jnp.sum(z2 / (d - m) ** 2))(lam)
        step = f / jnp.where(fp == 0, 1.0, fp)
        cand = lam - step
        ok = (cand > lo) & (cand < hi)
        return jnp.where(ok, cand, lam)

    lam = jax.lax.fori_loop(0, newton_iters, newton, lam)
    # eigenvectors: v_k proportional to z / (d - lam_k)
    V = z[:, None] / (d[:, None] - lam[None, :])
    V = V / jnp.sqrt(jnp.sum(V * V, axis=0))[None, :]
    return lam, V


def SecularSVD(d: jax.Array, z: jax.Array, rho: float = 1.0,
               **kw) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Singular values/vectors of [diag(d); rho^(1/2) z^T]-type rank-one
    SVD updates via the EVD of diag(d)^2 + rho z z^T
    (reference: SecularSVD.cpp)."""
    lam, V = SecularEVD(d * d, z, rho, **kw)
    s = jnp.sqrt(jnp.maximum(lam, 0.0))
    return s, V, V


def CubicSecular(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """Root of the cubic secular subproblem (reference: CubicSecular.cpp)
    — smallest real root of x^3 + a x^2 + b x + c via companion-matrix
    eigenvalues (batched-friendly)."""
    comp = jnp.array([[-a, -b, -c], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    # eigenvalues of the 3x3 companion matrix by the closed-form cubic
    p = b - a * a / 3.0
    q = 2.0 * a ** 3 / 27.0 - a * b / 3.0 + c
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    sq = jnp.sqrt(jnp.abs(disc))
    u = jnp.cbrt(-q / 2.0 + jnp.where(disc >= 0, sq, 0.0))
    # real root for the disc>=0 branch; trig form otherwise
    root1 = u + jnp.where(u == 0, 0.0, -p / (3.0 * jnp.where(u == 0, 1.0, u)))
    r = jnp.sqrt(jnp.maximum(-p / 3.0, 0.0))
    theta = jnp.arccos(jnp.clip(jnp.where(r > 0,
                                          -q / (2.0 * jnp.maximum(r, 1e-300) ** 3),
                                          0.0), -1.0, 1.0))
    root2 = 2.0 * r * jnp.cos(theta / 3.0)
    root = jnp.where(disc >= 0, root1, root2)
    return root - a / 3.0
