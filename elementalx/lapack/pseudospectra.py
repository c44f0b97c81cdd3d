"""Pseudospectra computation.

Reference: src/lapack_like/spectral/Pseudospectra.cpp (2579 LoC) +
Pseudospectra/{Power,Lanczos,IRA,HagerHigham,Analytic}.hpp — resolvent
norms ||(A - zI)^{-1}||_2 on a grid of shifts, computed by shifted
inverse (power/Lanczos) iteration against the Schur factor, chunked over
shift grids across the MPI ranks.

TPU-native: the shift grid is pure data parallelism — one vmap over all
shifts of a fixed-iteration inverse-Lanczos loop whose core is a batched
pair of triangular solves. The embarrassingly-parallel structure the
reference chunks by hand is a single batched XLA program here (SURVEY
§7: 'trivially good on TPU')."""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import MC, MR
from .schur import Schur


class SpectralPortrait(NamedTuple):
    inv_norm_map: jax.Array   # ||(A - z I)^{-1}||_2 at each grid point
    sigma_min_map: jax.Array  # sigma_min(A - z I)
    real_grid: jax.Array
    imag_grid: jax.Array


def _tri_solve_upper(T: jax.Array, b: jax.Array) -> jax.Array:
    """Back substitution for upper-triangular T (hand-rolled fori_loop —
    XLA:TPU lacks complex TriangularSolve)."""
    n = T.shape[0]

    def body(i, x):
        k = n - 1 - i
        row = T[k, :]
        s = jnp.sum(row * x) - row[k] * x[k]
        val = (b[k] - s) / T[k, k]
        return x.at[k].set(val)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(b))


def _tri_solve_upper_adj(T: jax.Array, b: jax.Array) -> jax.Array:
    """Solve T^H x = b (forward substitution on the conjugate)."""
    n = T.shape[0]

    def body(k, x):
        col = jnp.conj(T[:, k])
        s = jnp.sum(col * x) - col[k] * x[k]
        val = (b[k] - s) / jnp.conj(T[k, k])
        return x.at[k].set(val)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(b))


def _sigma_min_shifted(T: jax.Array, z: jax.Array, iters: int,
                       key) -> jax.Array:
    """sigma_min(T - zI) for upper triangular T via inverse power
    iteration on (T-z)^H (T-z): x <- solve(T-z, solve((T-z)^H, x))
    (reference: Pseudospectra/Power.hpp InverseIteration)."""
    n = T.shape[0]
    Ts = T - z * jnp.eye(n, dtype=T.dtype)
    # guard exact-eigenvalue shifts: perturb vanishing diagonal entries by
    # ~eps*||T|| (the safe-solve convention of the reference's shifted
    # solves); sigma_min then saturates near that floor instead of NaN
    dnorm = jnp.maximum(jnp.max(jnp.abs(T)), 1.0)
    floor = jnp.finfo(jnp.abs(Ts).dtype).eps * dnorm * 1e-2
    diag = jnp.diagonal(Ts)
    mag = jnp.abs(diag)
    safe = jnp.where(mag < floor, floor.astype(Ts.dtype)
                     * jnp.where(mag == 0, 1.0, diag / jnp.where(
                         mag == 0, 1.0, mag)), diag)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    Ts = jnp.where(i2 == j2, safe[jnp.minimum(i2, n - 1)], Ts)
    x0 = jax.random.normal(key, (n,), jnp.float64).astype(T.dtype)
    x0 = x0 / jnp.sqrt(jnp.sum(jnp.abs(x0) ** 2))

    def body(_, x):
        y = _tri_solve_upper_adj(Ts, x)
        w = _tri_solve_upper(Ts, y)
        nw = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2))
        return w / jnp.where(nw == 0, 1, nw)

    x = jax.lax.fori_loop(0, iters, body, x0)
    # Rayleigh estimate: sigma_min = 1 / ||(T-z)^{-1} ((T-z)^{-H} x)||^(1/2)
    y = _tri_solve_upper_adj(Ts, x)
    w = _tri_solve_upper(Ts, y)
    lam = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2))  # approx largest eig of inv pair
    return 1.0 / jnp.sqrt(lam)


def _sigma_min_lanczos(T: jax.Array, z: jax.Array, steps: int,
                       key) -> jax.Array:
    """sigma_min(T - zI) via inverse Lanczos (reference:
    Pseudospectra/Lanczos.hpp): run k steps of Lanczos on the SPD
    operator (T-z)^{-1}(T-z)^{-H}, whose extreme Ritz value converges
    much faster than power iteration, then sigma_min = 1/sqrt(ritz_max).
    """
    n = T.shape[0]
    Ts = T - z * jnp.eye(n, dtype=T.dtype)
    dnorm = jnp.maximum(jnp.max(jnp.abs(T)), 1.0)
    floor = jnp.finfo(jnp.abs(Ts).dtype).eps * dnorm * 1e-2
    diag = jnp.diagonal(Ts)
    mag = jnp.abs(diag)
    safe = jnp.where(mag < floor, floor.astype(Ts.dtype)
                     * jnp.where(mag == 0, 1.0, diag / jnp.where(
                         mag == 0, 1.0, mag)), diag)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    Ts = jnp.where(i2 == j2, safe[jnp.minimum(i2, n - 1)], Ts)

    def op(v):
        y = _tri_solve_upper_adj(Ts, v)
        return _tri_solve_upper(Ts, y)

    v0 = jax.random.normal(key, (n,), jnp.float32).astype(T.dtype)
    v0 = v0 / jnp.sqrt(jnp.sum(jnp.abs(v0) ** 2))
    rdt = jnp.abs(z).dtype

    def step(carry, _):
        v_prev, v, beta_prev = carry
        w = op(v)
        alpha = jnp.real(jnp.vdot(v, w))
        w = w - alpha * v - beta_prev * v_prev
        # full reorthogonalisation is overkill for a few steps; one pass
        beta = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2))
        v_next = w / jnp.where(beta == 0, 1, beta)
        return (v, v_next, beta.astype(rdt)), (alpha.astype(rdt),
                                               beta.astype(rdt))

    (_, _, _), (alphas, betas) = jax.lax.scan(
        step, (jnp.zeros_like(v0), v0, jnp.zeros((), rdt)), None,
        length=steps)
    from .tridiag_eig import tridiag_eigvalsh

    ritz = tridiag_eigvalsh(alphas, betas[:-1])
    lam_max = jnp.maximum(ritz[-1], jnp.finfo(rdt).tiny)
    return 1.0 / jnp.sqrt(lam_max)


def Pseudospectra(A: DistMatrix,
                  real_bounds: Tuple[float, float],
                  imag_bounds: Tuple[float, float],
                  real_size: int = 32,
                  imag_size: int = 32,
                  iters: int = 20,
                  schur_alg: str = "qr",
                  alg: str = "power") -> SpectralPortrait:
    """Resolvent-norm portrait over a shift grid
    (reference: TriangularPseudospectra / general drivers,
    Pseudospectra.cpp; alg='power' or 'lanczos' mirroring the
    Pseudospectra/{Power,Lanczos}.hpp kernels)."""
    dec = Schur(A, want_vecs=False, alg=schur_alg)
    n = A.m
    T = dec.T.replicated()[:n, :n]
    re = jnp.linspace(real_bounds[0], real_bounds[1], real_size)
    im = jnp.linspace(imag_bounds[0], imag_bounds[1], imag_size)
    zs = (re[None, :] + 1j * im[:, None]).astype(T.dtype).reshape(-1)
    keys = jax.random.split(jax.random.key(11), zs.shape[0])
    kernel = _sigma_min_lanczos if alg == "lanczos" else _sigma_min_shifted
    smin = jax.vmap(lambda z, k: kernel(T, z, iters, k))(zs, keys)
    smin = smin.reshape(imag_size, real_size)
    return SpectralPortrait(1.0 / smin, smin, re, im)


def TriangularPseudospectra(T: DistMatrix, real_bounds, imag_bounds,
                            real_size: int = 32, imag_size: int = 32,
                            iters: int = 20) -> SpectralPortrait:
    """Portrait given an already-triangular T (reference:
    TriangularPseudospectra entry points)."""
    n = T.m
    Td = T.replicated()[:n, :n]
    re = jnp.linspace(real_bounds[0], real_bounds[1], real_size)
    im = jnp.linspace(imag_bounds[0], imag_bounds[1], imag_size)
    zs = (re[None, :] + 1j * im[:, None]).astype(
        jnp.complex128 if Td.dtype != jnp.complex64 else jnp.complex64
    ).reshape(-1)
    Tc = Td.astype(zs.dtype)
    keys = jax.random.split(jax.random.key(11), zs.shape[0])
    smin = jax.vmap(lambda z, k: _sigma_min_shifted(Tc, z, iters, k))(zs, keys)
    smin = smin.reshape(imag_size, real_size)
    return SpectralPortrait(1.0 / smin, smin, re, im)
