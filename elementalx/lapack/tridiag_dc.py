"""Divide-and-conquer symmetric tridiagonal eigensolver (Cuppen).

Reference: the reference's D&C machinery — spectral/BidiagSVD's DCCtrl
path and the SecularEVD/SecularSVD solvers (SecularEVD.cpp) — rebuilt as
a host-orchestrated solver whose merges are secular-equation solves
(vmapped, lapack/secular.py) plus eigenvector back-multiplications
(matmul-dominated; the reason D&C maps well to matrix units).

Includes the production essentials the masked bisection path does not
need: rank-one tearing, two-sided deflation (tiny z components and
near-equal poles rotated out with Givens), and Gu-Eisenstat's Loewner
z-vector reconstruction for orthogonality of the merged vectors.

Base cases use the native C++ bisection solver (native/elx_tridiag.cpp)
when built, else the batched JAX solver."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _base_eig(d: np.ndarray, e: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    try:
        from ..native import tridiag_eig_native

        return tridiag_eig_native(d, e)
    except Exception:
        import jax.numpy as jnp

        from .tridiag_eig import tridiag_eig

        w, Z = tridiag_eig(jnp.asarray(d), jnp.asarray(e))
        return np.asarray(w), np.asarray(Z)


def _secular_roots_rel(d: np.ndarray, z: np.ndarray, rho: float
                       ) -> np.ndarray:
    """Pole-relative secular roots (the dlaed4 idea): root j is computed
    as tau_j with lam_j = d_j + tau_j, bisecting
        f(tau) = 1 + rho sum_i z_i^2 / ((d_i - d_j) - tau)
    so that every pole difference lam_i - d_j = (d_i - d_j) + tau_i is
    formed without catastrophic cancellation. Returns tau (k,).
    Vectorised over all roots simultaneously."""
    k = d.shape[0]
    z2 = z * z
    delta = d[:, None] - d[None, :]          # delta[i, j] = d_i - d_j
    hi = np.empty(k)
    hi[:-1] = delta[1:, :-1].diagonal()      # d_{j+1} - d_j
    hi[-1] = rho * (z @ z) + 1.0
    lo = np.zeros(k)
    hi = hi * (1.0 - 1e-16)
    lo = lo + hi * 1e-18

    def f(tau):
        # (k_poles, k_roots): z2_i / (delta[i, j] - tau_j)
        return 1.0 + rho * np.sum(z2[:, None] / (delta - tau[None, :]),
                                  axis=0)

    for _ in range(90):
        mid = 0.5 * (lo + hi)
        val = f(mid)
        below = val < 0  # f increasing in tau: root above mid
        lo = np.where(below, mid, lo)
        hi = np.where(below, hi, mid)
    return 0.5 * (lo + hi)


def _merge(w1, Q1, w2, Q2, rho, v_coupling) -> Tuple[np.ndarray, np.ndarray]:
    """Merge two children eigensystems across a rank-one tear:
    T = diag(w) + rho z z^T in the joint eigenbasis."""
    n1 = w1.shape[0]
    d = np.concatenate([w1, w2])
    # z = [Q1^T e_last; sign(beta) Q2^T e_first] — the coupling rows; the
    # sign folds beta < 0 into z so that rho = |beta| > 0 (the secular
    # solver brackets roots for positive rho)
    z = np.concatenate([Q1[-1, :], np.sign(v_coupling) * Q2[0, :]])
    n = d.shape[0]
    Q = np.zeros((n, n))
    Q[:n1, :n1] = Q1
    Q[n1:, n1:] = Q2

    # sort poles ascending
    order = np.argsort(d)
    d = d[order]
    z = z[order]
    Q = Q[:, order]

    eps = np.finfo(np.float64).eps
    scale = max(np.max(np.abs(d)), abs(rho) * (z @ z), 1e-300)
    tol = 8 * eps * scale

    # deflation 1: negligible z components (perturbation of dropping z_j
    # is rho z_j^2; keep only what the secular solver can resolve)
    active = rho * z * z > tol * 1e-2
    active &= np.abs(z) > eps * np.sqrt(scale)
    # deflation 2: near-equal poles — rotate the pair so one z vanishes
    for i in range(n - 1):
        if not (active[i] and active[i + 1]):
            continue
        if d[i + 1] - d[i] <= tol:
            r = np.hypot(z[i], z[i + 1])
            if r == 0:
                active[i] = False
                continue
            c, s = z[i + 1] / r, z[i] / r
            # rotate columns i, i+1 of Q and zero z[i]
            qi = Q[:, i].copy()
            Q[:, i] = c * qi - s * Q[:, i + 1]
            Q[:, i + 1] = s * qi + c * Q[:, i + 1]
            z[i], z[i + 1] = 0.0, r
            active[i] = False

    idx = np.where(active)[0]
    k = idx.shape[0]
    lam = d.copy()
    if k > 0:
        dk = d[idx]
        zk = z[idx]
        tau = _secular_roots_rel(dk, zk, rho)   # lam_j = dk_j + tau_j
        lam_k = dk + tau
        delta = dk[:, None] - dk[None, :]       # d_i - d_j, exact pairs
        # stable pairwise differences: lam_i - d_j = delta[i,j] + tau_i ;
        # d_i - lam_j = delta[i,j] - tau_j
        LmD = delta + tau[:, None]              # [i, j] = (d_i-d_j)+tau_i
        # Gu-Eisenstat Loewner reconstruction of z so the eigenvectors are
        # orthogonal to working precision:
        # rho zhat_j^2 = prod_i (lam_i - d_j) / prod_{i != j} (d_i - d_j)
        zhat = np.empty(k)
        eyek = np.eye(k, dtype=bool)
        for j in range(k):
            num_terms = LmD[:, j]                         # lam_i - d_j
            den_terms = np.where(eyek[:, j], 1.0, delta[:, j])
            ratio = num_terms / den_terms                 # i = j term: tau_j
            num = np.prod(ratio)
            zhat[j] = np.sqrt(max(num / rho, 0.0)) * (1.0 if zk[j] >= 0
                                                      else -1.0)
        # V[i, j] = zhat_i / (d_i - lam_j) = zhat_i / (delta[i,j] - tau_j)
        denom = delta - tau[None, :]
        safe = np.where(denom == 0.0, np.finfo(np.float64).tiny, denom)
        V = zhat[:, None] / safe
        V /= np.linalg.norm(V, axis=0)[None, :]
        lam[idx] = lam_k
        Q[:, idx] = Q[:, idx] @ V
    # final sort
    order = np.argsort(lam)
    return lam[order], Q[:, order]


def tridiag_eig_dc(d: np.ndarray, e: np.ndarray, cutoff: int = 48
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """(w, Z) of the symmetric tridiagonal via Cuppen's D&C."""
    d = np.asarray(d, np.float64)
    e = np.asarray(e, np.float64)
    n = d.shape[0]
    if n <= cutoff:
        return _base_eig(d, e)
    m = n // 2
    beta = float(e[m - 1])
    d1 = d[:m].copy()
    d2 = d[m:].copy()
    if beta == 0.0:  # already decoupled
        w1, Q1 = tridiag_eig_dc(d1, e[: m - 1], cutoff)
        w2, Q2 = tridiag_eig_dc(d2, e[m:], cutoff)
        w = np.concatenate([w1, w2])
        Q = np.zeros((n, n))
        Q[:m, :m] = Q1
        Q[m:, m:] = Q2
        order = np.argsort(w)
        return w[order], Q[:, order]
    # rank-one tear with rho = |beta| > 0:
    # T = blkdiag(T1', T2') + |beta| (e_m + sign(beta) e_{m+1})(.)^T
    rho = abs(beta)
    d1[-1] -= rho
    d2[0] -= rho
    w1, Q1 = tridiag_eig_dc(d1, e[: m - 1], cutoff)
    w2, Q2 = tridiag_eig_dc(d2, e[m:], cutoff)
    return _merge(w1, Q1, w2, Q2, rho, beta)


def HermitianTridiagEigDC(d, e):
    """El-style driver (the DCCtrl path of the reference's spectral
    solvers)."""
    import jax.numpy as jnp

    w, Z = tridiag_eig_dc(np.asarray(d), np.asarray(e))
    return jnp.asarray(w), jnp.asarray(Z)
