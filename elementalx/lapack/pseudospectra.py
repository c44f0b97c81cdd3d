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


class PseudospectraResult(NamedTuple):
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
    x0 = jax.random.normal(key, (n,), jnp.abs(T).dtype).astype(T.dtype)
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
                         schur_alg: str = "qr") -> PseudospectraResult:
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
    return PseudospectraResult(est, 1.0 / est, re, im)


def Pseudospectra(A: DistMatrix,
                  real_bounds: Tuple[float, float],
                  imag_bounds: Tuple[float, float],
                  real_size: int = 32,
                  imag_size: int = 32,
                  iters: int = 20,
                  schur_alg: str = "qr",
                  alg: str = "power") -> PseudospectraResult:
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
    return PseudospectraResult(1.0 / smin, smin, re, im)


def TriangularPseudospectra(T: DistMatrix, real_bounds, imag_bounds,
                            real_size: int = 32, imag_size: int = 32,
                            iters: int = 20) -> PseudospectraResult:
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
    return PseudospectraResult(1.0 / smin, smin, re, im)


# ---------------------------------------------------------------------------
# dense-form kernel (Hessenberg / quasi-triangular inputs): one LU per
# shift, then the same inverse power iteration with LU-backed solves
# (reference routes these forms through MultiShift{Hess,Quasi}Solve;
# one batched LU is the TPU-shaped equivalent — vmapped over shifts)
# ---------------------------------------------------------------------------


def _unit_lower_fwd(L: jax.Array, b: jax.Array) -> jax.Array:
    """Forward substitution with unit lower-triangular L (hand-rolled:
    XLA:TPU lacks complex TriangularSolve)."""
    n = L.shape[0]

    def body(k, x):
        row = L[k, :]
        s = jnp.sum(row * x) - row[k] * x[k]
        return x.at[k].set(b[k] - s)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(b))


def _unit_lower_adj_bwd(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L^H x = b for unit lower L (back substitution on conj)."""
    n = L.shape[0]

    def body(i, x):
        k = n - 1 - i
        col = jnp.conj(L[:, k])
        s = jnp.sum(col * x) - col[k] * x[k]
        return x.at[k].set(b[k] - s)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(b))


def _sigma_min_dense(Ac: jax.Array, z: jax.Array, iters: int,
                     key) -> jax.Array:
    """sigma_min(A - zI) for a general square A (used for Hessenberg and
    quasi-triangular forms): LU once, inverse power on (A-z)^H (A-z)."""
    n = Ac.shape[0]
    M = Ac - z * jnp.eye(n, dtype=Ac.dtype)
    lu, _, perm = jax.lax.linalg.lu(M)
    # guard exact-eigenvalue shifts as in _sigma_min_shifted
    dnorm = jnp.maximum(jnp.max(jnp.abs(Ac)), 1.0)
    floor = jnp.finfo(jnp.abs(M).dtype).eps * dnorm * 1e-2
    diag = jnp.diagonal(lu)
    mag = jnp.abs(diag)
    safe = jnp.where(mag < floor, floor.astype(lu.dtype)
                     * jnp.where(mag == 0, 1.0, diag / jnp.where(
                         mag == 0, 1.0, mag)), diag)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    lu = jnp.where(i2 == j2, safe[jnp.minimum(i2, n - 1)], lu)
    Lm = jnp.where(i2 > j2, lu, jnp.zeros_like(lu))
    Lm = jnp.where(i2 == j2, jnp.ones((), lu.dtype), Lm)
    U = jnp.where(i2 <= j2, lu, jnp.zeros_like(lu))

    def solveM(b):
        # M[perm] = L U  =>  M x = b  <=>  L U x = b[perm]
        y = _unit_lower_fwd(Lm, b[perm])
        return _tri_solve_upper(U, y)

    def solveMH(b):
        # M^H x = b with M = P^T L U: U^H w = b, L^H v = w, x[perm] = v
        w = _tri_solve_upper_adj(U, b)
        v = _unit_lower_adj_bwd(Lm, w)
        return jnp.zeros_like(v).at[perm].set(v)

    x0 = jax.random.normal(key, (n,), jnp.abs(Ac).dtype).astype(Ac.dtype)
    x0 = x0 / jnp.sqrt(jnp.sum(jnp.abs(x0) ** 2))

    def body(_, x):
        w = solveM(solveMH(x))
        nw = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2))
        return w / jnp.where(nw == 0, 1, nw)

    x = jax.lax.fori_loop(0, iters, body, x0)
    w = solveM(solveMH(x))
    lam = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2))
    return 1.0 / jnp.sqrt(lam)


# ---------------------------------------------------------------------------
# the reference's public driver census (spectral.hpp:1530-1660):
#   SpectralPortrait  — auto-box around the spectrum
#   SpectralWindow    — caller-specified center/width window
#   SpectralCloud     — arbitrary shift list
# each also in Triangular / QuasiTriangular / Hessenberg form
# ---------------------------------------------------------------------------


class SpectralCloudResult(NamedTuple):
    inv_norms: jax.Array   # ||(A - z_j I)^{-1}||_2 per shift
    sigma_min: jax.Array


def _complex_of(dt):
    return jnp.complex64 if dt in (jnp.float32, jnp.complex64) \
        else jnp.complex128


def _auto_box(eigs: jax.Array):
    """Portrait box: the spectrum's bounding box padded on each side by
    half its span (reference: pspec::SetBox-style auto window), with a
    norm-scaled floor for degenerate (point) spectra."""
    re, im = jnp.real(eigs), jnp.imag(eigs)
    r0, r1 = float(jnp.min(re)), float(jnp.max(re))
    i0, i1 = float(jnp.min(im)), float(jnp.max(im))
    scale = max(abs(r0), abs(r1), abs(i0), abs(i1), 1e-3)
    wr = max(r1 - r0, 0.5 * scale)
    wi = max(i1 - i0, 0.5 * scale)
    return ((r0 - 0.5 * wr, r1 + 0.5 * wr), (i0 - 0.5 * wi, i1 + 0.5 * wi))


def _grid_portrait(kern, dtype, real_bounds, imag_bounds, real_size,
                   imag_size) -> PseudospectraResult:
    re = jnp.linspace(real_bounds[0], real_bounds[1], real_size)
    im = jnp.linspace(imag_bounds[0], imag_bounds[1], imag_size)
    zs = (re[None, :] + 1j * im[:, None]).astype(dtype).reshape(-1)
    keys = jax.random.split(jax.random.key(11), zs.shape[0])
    smin = jax.vmap(kern)(zs, keys)
    smin = smin.reshape(imag_size, real_size)
    return PseudospectraResult(1.0 / smin, smin, re, im)


def _cloud(kern, dtype, shifts) -> SpectralCloudResult:
    zs = jnp.asarray(shifts).astype(dtype).reshape(-1)
    keys = jax.random.split(jax.random.key(11), zs.shape[0])
    smin = jax.vmap(kern)(zs, keys)
    return SpectralCloudResult(1.0 / smin, smin)


def _tri_kernel(Tc, iters):
    return lambda z, k: _sigma_min_shifted(Tc, z, iters, k)


def _dense_kernel(Ac, iters):
    return lambda z, k: _sigma_min_dense(Ac, z, iters, k)


def _schur_tri(A: DistMatrix, schur_alg: str):
    dec = Schur(A, want_vecs=False, alg=schur_alg, form="complex")
    n = A.m
    return dec.T.replicated()[:n, :n]


def SpectralPortrait(A: DistMatrix, real_size: int = 32,
                     imag_size: int = 32, iters: int = 20,
                     schur_alg: str = "qr") -> PseudospectraResult:
    """Auto-windowed portrait (reference: spectral.hpp:1536
    SpectralPortrait — the box is derived from the spectrum)."""
    T = _schur_tri(A, schur_alg)
    rb, ib = _auto_box(jnp.diagonal(T))
    return _grid_portrait(_tri_kernel(T, iters), T.dtype, rb, ib,
                          real_size, imag_size)


def SpectralWindow(A: DistMatrix, center, real_width: float,
                   imag_width: float, real_size: int = 32,
                   imag_size: int = 32, iters: int = 20,
                   schur_alg: str = "qr") -> PseudospectraResult:
    """Caller-windowed portrait (reference: spectral.hpp SpectralWindow:
    center + real/imag widths)."""
    c = complex(center)
    rb = (c.real - real_width / 2, c.real + real_width / 2)
    ib = (c.imag - imag_width / 2, c.imag + imag_width / 2)
    T = _schur_tri(A, schur_alg)
    return _grid_portrait(_tri_kernel(T, iters), T.dtype, rb, ib,
                          real_size, imag_size)


def SpectralCloud(A: DistMatrix, shifts, iters: int = 20,
                  schur_alg: str = "qr") -> SpectralCloudResult:
    """Resolvent norms at an arbitrary shift list (reference:
    spectral.hpp SpectralCloud)."""
    T = _schur_tri(A, schur_alg)
    return _cloud(_tri_kernel(T, iters), T.dtype, shifts)


def _tri_of(T: DistMatrix):
    n = T.m
    Td = T.replicated()[:n, :n]
    return Td.astype(_complex_of(Td.dtype))


def TriangularSpectralPortrait(T: DistMatrix, real_size: int = 32,
                               imag_size: int = 32, iters: int = 20
                               ) -> PseudospectraResult:
    Tc = _tri_of(T)
    rb, ib = _auto_box(jnp.diagonal(Tc))
    return _grid_portrait(_tri_kernel(Tc, iters), Tc.dtype, rb, ib,
                          real_size, imag_size)


def TriangularSpectralWindow(T: DistMatrix, center, real_width: float,
                             imag_width: float, real_size: int = 32,
                             imag_size: int = 32, iters: int = 20
                             ) -> PseudospectraResult:
    c = complex(center)
    Tc = _tri_of(T)
    return _grid_portrait(
        _tri_kernel(Tc, iters), Tc.dtype,
        (c.real - real_width / 2, c.real + real_width / 2),
        (c.imag - imag_width / 2, c.imag + imag_width / 2),
        real_size, imag_size)


def TriangularSpectralCloud(T: DistMatrix, shifts, iters: int = 20
                            ) -> SpectralCloudResult:
    Tc = _tri_of(T)
    return _cloud(_tri_kernel(Tc, iters), Tc.dtype, shifts)


def _quasi_eigs(Tq: jax.Array) -> jax.Array:
    """Eigenvalues of a real quasi-triangular matrix: diagonal entries
    plus conjugate pairs from the 2x2 blocks."""
    n = Tq.shape[0]
    d = jnp.diagonal(Tq)
    sub = jnp.concatenate([jnp.diagonal(Tq, -1), jnp.zeros((1,), Tq.dtype)])
    sup = jnp.concatenate([jnp.diagonal(Tq, 1), jnp.zeros((1,), Tq.dtype)])
    dn = jnp.concatenate([d[1:], jnp.zeros((1,), Tq.dtype)])
    mean = (d + dn) / 2
    disc = (d - dn) ** 2 / 4 + sup * sub
    start = sub != 0
    root = jnp.sqrt(jnp.abs(disc))
    lam_re = jnp.where(start & (disc < 0), mean, d)
    lam_im = jnp.where(start & (disc < 0), root, 0.0)
    # real-splitting 2x2 (disc >= 0) keeps its two real roots
    lam_re = jnp.where(start & (disc >= 0), mean + root, lam_re)
    prev = jnp.concatenate([jnp.zeros((1,), bool), start[:-1]])
    pm = jnp.concatenate([jnp.zeros((1,), Tq.dtype), mean[:-1]])
    pr = jnp.concatenate([jnp.zeros((1,), Tq.dtype), root[:-1]])
    pd = jnp.concatenate([jnp.zeros((1,), Tq.dtype),
                          jnp.asarray(disc)[:-1]])
    pi = jnp.concatenate([jnp.zeros((1,), Tq.dtype), lam_im[:-1]])
    lam_re = jnp.where(prev & (pd >= 0), pm - pr, lam_re)
    lam_re = jnp.where(prev & (pd < 0), pm, lam_re)
    lam_im = jnp.where(prev, -pi, lam_im)
    return lam_re + 1j * lam_im


def _quasi_of(T: DistMatrix):
    n = T.m
    Td = T.replicated()[:n, :n]
    return Td, Td.astype(_complex_of(Td.dtype))


def QuasiTriangularSpectralPortrait(T: DistMatrix, real_size: int = 32,
                                    imag_size: int = 32, iters: int = 20
                                    ) -> PseudospectraResult:
    """Portrait of a REAL quasi-triangular Schur factor (reference:
    spectral.hpp:1589 QuasiTriangularSpectralPortrait). The input stays
    real (TPU-transferable); shifts are complex internally."""
    Td, Tc = _quasi_of(T)
    rb, ib = _auto_box(_quasi_eigs(Td))
    return _grid_portrait(_dense_kernel(Tc, iters), Tc.dtype, rb, ib,
                          real_size, imag_size)


def QuasiTriangularSpectralWindow(T: DistMatrix, center,
                                  real_width: float, imag_width: float,
                                  real_size: int = 32, imag_size: int = 32,
                                  iters: int = 20) -> PseudospectraResult:
    c = complex(center)
    _, Tc = _quasi_of(T)
    return _grid_portrait(
        _dense_kernel(Tc, iters), Tc.dtype,
        (c.real - real_width / 2, c.real + real_width / 2),
        (c.imag - imag_width / 2, c.imag + imag_width / 2),
        real_size, imag_size)


def QuasiTriangularSpectralCloud(T: DistMatrix, shifts, iters: int = 20
                                 ) -> SpectralCloudResult:
    _, Tc = _quasi_of(T)
    return _cloud(_dense_kernel(Tc, iters), Tc.dtype, shifts)


def HessenbergSpectralPortrait(H: DistMatrix, real_size: int = 32,
                               imag_size: int = 32, iters: int = 20
                               ) -> PseudospectraResult:
    """Portrait of an upper-Hessenberg matrix without triangularizing
    it (reference: spectral.hpp:1625 HessenbergSpectralPortrait); the
    box needs the spectrum, so a vector-only Schur runs for the eigs."""
    n = H.m
    Hd = H.replicated()[:n, :n]
    Hc = Hd.astype(_complex_of(Hd.dtype))
    w = Schur(H, want_vecs=False, form="complex").w
    rb, ib = _auto_box(jnp.asarray(w))
    return _grid_portrait(_dense_kernel(Hc, iters), Hc.dtype, rb, ib,
                          real_size, imag_size)


def HessenbergSpectralWindow(H: DistMatrix, center, real_width: float,
                             imag_width: float, real_size: int = 32,
                             imag_size: int = 32, iters: int = 20
                             ) -> PseudospectraResult:
    c = complex(center)
    n = H.m
    Hc = H.replicated()[:n, :n]
    Hc = Hc.astype(_complex_of(Hc.dtype))
    return _grid_portrait(
        _dense_kernel(Hc, iters), Hc.dtype,
        (c.real - real_width / 2, c.real + real_width / 2),
        (c.imag - imag_width / 2, c.imag + imag_width / 2),
        real_size, imag_size)


def HessenbergSpectralCloud(H: DistMatrix, shifts, iters: int = 20
                            ) -> SpectralCloudResult:
    n = H.m
    Hc = H.replicated()[:n, :n]
    Hc = Hc.astype(_complex_of(Hc.dtype))
    return _cloud(_dense_kernel(Hc, iters), Hc.dtype, shifts)
