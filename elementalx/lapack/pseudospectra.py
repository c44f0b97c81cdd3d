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


def _sigma_min_ira(T: jax.Array, z: jax.Array, basis: int, restarts: int,
                   key) -> jax.Array:
    """sigma_min(T - zI) via implicitly restarted Arnoldi (reference:
    Pseudospectra/IRA.hpp): run `basis` fully-reorthogonalised Lanczos
    steps on the SPD operator (T-z)^{-1}(T-z)^{-H}, eigendecompose the
    small projected tridiagonal, and restart from the dominant Ritz
    vector. Each restart is an exact subspace-accelerated power step, so
    convergence is much faster than single-vector iteration near
    defective shifts. Fixed trip counts keep the whole (shift-vmapped)
    program static-shape."""
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
    rdt = jnp.abs(z).dtype

    def op(v):
        y = _tri_solve_upper_adj(Ts, v)
        return _tri_solve_upper(Ts, y)

    v0 = jax.random.normal(key, (n,), jnp.float32).astype(T.dtype)
    v0 = v0 / jnp.sqrt(jnp.sum(jnp.abs(v0) ** 2))

    def one_restart(v0, _):
        V = jnp.zeros((basis + 1, n), T.dtype).at[0].set(v0)
        Hs = jnp.zeros((basis, basis), rdt)

        def lanczos_step(j, carry):
            V, Hs = carry
            w = op(V[j])
            # full re-orthogonalisation against the whole stored basis
            # (rows > j are zero, so the masked projection is exact)
            coeffs = jnp.conj(V) @ w
            w = w - V.T @ coeffs
            coeffs2 = jnp.conj(V) @ w       # second MGS pass
            w = w - V.T @ coeffs2
            alpha = jnp.real(coeffs[j] + coeffs2[j])
            beta = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2))
            V = V.at[j + 1].set(w / jnp.where(beta == 0, 1, beta))
            Hs = Hs.at[j, j].set(alpha)
            Hs = jnp.where(j + 1 < basis,
                           Hs.at[j, j + 1].set(beta.astype(rdt))
                             .at[j + 1, j].set(beta.astype(rdt)), Hs)
            return V, Hs

        V, Hs = jax.lax.fori_loop(0, basis, lanczos_step, (V, Hs))
        evals, evecs = jnp.linalg.eigh(Hs)
        lam = jnp.maximum(evals[-1], jnp.finfo(rdt).tiny)
        y = evecs[:, -1].astype(T.dtype)        # dominant Ritz vector
        v_new = V[:basis].T @ y
        nv = jnp.sqrt(jnp.sum(jnp.abs(v_new) ** 2))
        return v_new / jnp.where(nv == 0, 1, nv), lam

    _, lams = jax.lax.scan(one_restart, v0, None, length=restarts)
    return 1.0 / jnp.sqrt(lams[-1])


def _one_norm_resolvent(T: jax.Array, z: jax.Array, iters: int
                        ) -> jax.Array:
    """||(T - zI)^{-1}||_1 via the Hager-Higham estimator (reference:
    Pseudospectra/HagerHigham.hpp): alternate x -> y=(T-z)^{-1}x,
    xi=sign(y), zv=(T-z)^{-H}xi; converged when ||zv||_inf <= Re<zv,x>,
    else restart from the e_j of the largest |zv_i|. Finishes with
    Higham's alternating-sign probe. Fixed-trip loop with a converged
    mask (shift-vmapped)."""
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
    rdt = jnp.abs(z).dtype

    x0 = jnp.full((n,), 1.0 / n, T.dtype)

    def body(k, carry):
        x, est, done = carry
        y = _tri_solve_upper(Ts, x)
        gamma = jnp.sum(jnp.abs(y)).astype(rdt)
        ay = jnp.abs(y)
        xi = jnp.where(ay == 0, jnp.ones((), T.dtype), y / jnp.where(
            ay == 0, 1.0, ay))
        zv = _tri_solve_upper_adj(Ts, xi)
        zin = jnp.max(jnp.abs(zv))
        inner = jnp.real(jnp.vdot(zv, x))
        conv = (k > 0) & (zin <= inner)
        jbig = jnp.argmax(jnp.abs(zv))
        x_new = (jnp.arange(n) == jbig).astype(T.dtype)
        est = jnp.where(done, est, jnp.maximum(est, gamma))
        return jnp.where(done | conv, x, x_new), est, done | conv

    _, est, _ = jax.lax.fori_loop(
        0, iters, body, (x0, jnp.zeros((), rdt), jnp.asarray(False)))
    # Higham's alternating probe b_i = (-1)^i (1 + i/(n-1))
    iv = jnp.arange(n, dtype=rdt)
    b = ((-1.0) ** iv * (1.0 + iv / jnp.maximum(n - 1, 1))).astype(T.dtype)
    yb = _tri_solve_upper(Ts, b)
    est_b = 2.0 * jnp.sum(jnp.abs(yb)).astype(rdt) / (3.0 * n)
    return jnp.maximum(est, est_b)


def OneNormPseudospectra(A: DistMatrix, real_bounds, imag_bounds,
                         real_size: int = 32, imag_size: int = 32,
                         iters: int = 10,
                         schur_alg: str = "qr") -> SpectralPortrait:
    """One-norm pseudospectra portrait ||(A - zI)^{-1}||_1 via the
    Hager-Higham estimator (reference: Pseudospectra/HagerHigham.hpp and
    the psCtrl.norm == PS_ONE_NORM drivers). sigma_min_map holds the
    reciprocal estimate for plotting symmetry with the 2-norm portraits."""
    dec = Schur(A, want_vecs=False, alg=schur_alg, form="complex")
    n = A.m
    T = dec.T.replicated()[:n, :n]
    re = jnp.linspace(real_bounds[0], real_bounds[1], real_size)
    im = jnp.linspace(imag_bounds[0], imag_bounds[1], imag_size)
    zs = (re[None, :] + 1j * im[:, None]).astype(T.dtype).reshape(-1)
    est = jax.vmap(lambda z: _one_norm_resolvent(T, z, iters))(zs)
    est = est.reshape(imag_size, real_size)
    return SpectralPortrait(est, 1.0 / est, re, im)


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
    dec = Schur(A, want_vecs=False, alg=schur_alg, form="complex")
    n = A.m
    T = dec.T.replicated()[:n, :n]
    re = jnp.linspace(real_bounds[0], real_bounds[1], real_size)
    im = jnp.linspace(imag_bounds[0], imag_bounds[1], imag_size)
    zs = (re[None, :] + 1j * im[:, None]).astype(T.dtype).reshape(-1)
    keys = jax.random.split(jax.random.key(11), zs.shape[0])
    if alg == "ira":
        basis = max(2, min(8, iters))
        restarts = max(1, (iters + basis - 1) // basis)
        kernel = lambda z, k: _sigma_min_ira(T, z, basis, restarts, k)  # noqa: E731
    elif alg == "lanczos":
        kernel = lambda z, k: _sigma_min_lanczos(T, z, iters, k)  # noqa: E731
    else:
        kernel = lambda z, k: _sigma_min_shifted(T, z, iters, k)  # noqa: E731
    smin = jax.vmap(kernel)(zs, keys)
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
