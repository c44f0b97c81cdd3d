"""Householder reflector machinery.

Reference: src/lapack_like/reflect/ (ApplyPackedReflectors,
ExpandPackedReflectors, Householder/Hyperbolic reflector kernels) and the
compact-WY T-matrix construction used by factor/QR/.

TPU-native form: reflectors are packed below the diagonal exactly like
LAPACK/the reference; application is blocked compact-WY —
A := A - V T (V^H A) — so the hot path is three MXU matmuls per block
instead of rank-1 sweeps."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _sign(x):
    """Complex-safe sign with sign(0) = 1."""
    ax = jnp.abs(x)
    return jnp.where(ax == 0, jnp.ones((), x.dtype), x / jnp.where(ax == 0, 1, ax))


def householder(x: jax.Array, j, m: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compute a Householder reflector for column vector x, pivot row j,
    active rows [j, m) (reference: reflect/Householder.cpp semantics:
    H x = beta e_j with H = I - tau v v^H, v[j] = 1).

    Returns (v, tau, beta); v is zero outside (j, m)."""
    M = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    active_below = (rows > j) & (rows < m)
    alpha = jax.lax.dynamic_index_in_dim(x, j, keepdims=False)
    xb = jnp.where(active_below, x, jnp.zeros_like(x))
    sigma2 = jnp.sum(jnp.abs(xb) ** 2)
    norm = jnp.sqrt(jnp.abs(alpha) ** 2 + sigma2)
    # Hermitian-reflector convention: beta = -sign(alpha)*norm (complex
    # sign), which makes tau REAL and H = I - tau v v^H Hermitian unitary.
    # Phases that LAPACK's real-beta convention would absorb into complex
    # tau are instead handled by the drivers' diagonal phase vectors (the
    # reference's 'd' vector idiom in QR/condense).
    beta = (-_sign(alpha) * norm.astype(x.dtype))
    denom = alpha - beta
    trivial = sigma2 == 0
    safe_denom = jnp.where(trivial, jnp.ones((), x.dtype), denom)
    v = jnp.where(active_below, xb / safe_denom, jnp.zeros_like(x))
    v = v.at[j].set(jnp.ones((), x.dtype))
    # tau = (beta - alpha) / beta  (real-valued under this convention)
    tau = jnp.where(trivial, jnp.zeros((), x.dtype),
                    (beta - alpha) / jnp.where(beta == 0, 1, beta))
    beta = jnp.where(trivial, alpha, beta)
    return v, tau, beta


def build_wy_T(V: jax.Array, tau: jax.Array) -> jax.Array:
    """Upper-triangular T with H_1 ... H_nb = I - V T V^H
    (the compact-WY form the reference stores per panel in its
    'T matrices', factor/QR/Householder.hpp).

    Closed form instead of larft's column recurrence:
    T^{-1} = diag(1/tau) + triu(V^H V, 1), so T is one batched
    log-depth triangular inversion (blas/trinv.py) — the recurrence
    was a latency-bound fori_loop of ~nb small ops (~0.5-1 ms per
    panel on TPU). Columns with tau_j = 0 (H_j = I: padding or
    already-zero panel columns) are decoupled by zeroing their row
    and column of the Gram coupling before inversion, then masked to
    zero in T, matching the recurrence exactly."""
    nb = V.shape[1]
    f32ish = V.dtype in (jnp.float32, jnp.complex64)
    hi = jax.lax.Precision.HIGHEST if f32ish else None
    # Gram at HIGHEST: at DEFAULT the TPU runs this single-pass bf16,
    # which puts ~1e-5-grade error into T and costs the compact-WY Q
    # its orthogonality (||Q'Q-I|| 2.6e-5 vs geqrf's 5e-7 — measured,
    # the dominant backward-error term of the SBR band reduction)
    G = jnp.dot(jnp.conj(V.T), V, precision=hi)  # (nb, nb) gram
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    live = tau != 0
    safe_tau = jnp.where(live, tau, jnp.ones((), tau.dtype))
    couple = live[:, None] & live[None, :] & (cols > rows)
    Tinv = jnp.where(couple, G, jnp.zeros((), G.dtype))
    Tinv = jnp.where(rows == cols,
                     (1.0 / safe_tau)[None, :].astype(G.dtype)
                     * jnp.ones((nb, nb), G.dtype), Tinv)
    from ..blas.trinv import tri_inv_upper

    T = tri_inv_upper(Tinv, precision=jax.lax.Precision.HIGH
                      if Tinv.dtype in (jnp.float32, jnp.complex64)
                      else None)
    if f32ish:
        # one Newton polish against the accurate Tinv squares the
        # inversion error (~1e-5 -> Gram-limited ~1e-7); two (nb, nb)
        # GEMMs — negligible against any panel
        eye2 = 2.0 * jnp.eye(nb, dtype=T.dtype)
        T = jnp.dot(T, eye2 - jnp.dot(Tinv, T, precision=hi),
                    precision=hi)
        T = jnp.where(cols >= rows, T, jnp.zeros((), T.dtype))
    return jnp.where(live[:, None] & live[None, :], T,
                     jnp.zeros((), T.dtype))


def apply_block_reflector(V: jax.Array, T: jax.Array, A: jax.Array,
                          adjoint: bool, precision=None) -> jax.Array:
    """A := (I - V T V^H) A   (adjoint=False, applies Q_b)
       A := (I - V T^H V^H) A (adjoint=True, applies Q_b^H).
    ``precision`` governs the two large MXU matmuls (the hot trailing
    updates of QR/condense pass `hot_precision`); the small (nb, nb) x
    (nb, N) T-multiply stays at library default."""
    from ..blas.gemm import local_gemm

    W = local_gemm(jnp.conj(V.T), A, precision=precision)  # (nb, N)
    Tm = jnp.conj(T.T) if adjoint else T
    return A - local_gemm(V, local_gemm(Tm, W), precision=precision)


def extract_panel_V(a: jax.Array, k0: int, nb: int, offset: int = 0
                    ) -> jax.Array:
    """Unpack the unit-lower-trapezoidal V of panel columns [k0, k0+nb)
    from the packed factorization (reference: the 'packed reflectors'
    storage convention). ``offset`` shifts the unit row below the
    diagonal (offset=1 for tridiag/Hessenberg reflectors)."""
    M = a.shape[0]
    panel = jax.lax.dynamic_slice(a, (0, k0), (M, nb))
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (M, nb), 1) + k0 + offset
    V = jnp.where(rows > cols, panel, jnp.zeros_like(panel))
    return jnp.where(rows == cols, jnp.ones((), a.dtype), V)


def ApplyPackedReflectors(packed: jax.Array, tau: jax.Array, A: jax.Array,
                          nb: int, ncols: int, adjoint: bool,
                          offset: int = 0) -> jax.Array:
    """Apply Q (or Q^H) held as packed reflectors to A from the left
    (reference: reflect/ApplyPackedReflectors.hpp, vertical-forward-lower
    case used by QR; offset=1 is the condense/ApplyQ storage). ncols =
    number of reflector columns (static)."""
    from ..blas.gemm import hot_precision

    hp = hot_precision(packed.dtype)
    nblk = (ncols + nb - 1) // nb
    order = range(nblk) if adjoint else range(nblk - 1, -1, -1)
    for b in order:
        k0 = b * nb
        w = min(nb, ncols - k0)
        # rows above k0+offset of this panel's V are identically zero:
        # run the block reflector on the static row slice [r0, M) only
        r0 = min(k0 + offset, A.shape[0])
        V = extract_panel_V(packed, k0, w, offset)[r0:]
        t = jax.lax.dynamic_slice(tau, (k0,), (w,))
        T = build_wy_T(V, t)
        upd = apply_block_reflector(V, T, A[r0:], adjoint, precision=hp)
        A = jax.lax.dynamic_update_slice(A, upd, (r0, 0))
    return A


def ExpandPackedReflectors(packed: jax.Array, tau: jax.Array, nb: int,
                           ncols: int, out_cols: int) -> jax.Array:
    """Materialise Q's first out_cols columns
    (reference: reflect/ExpandPackedReflectors.hpp)."""
    M = packed.shape[0]
    eye = jnp.eye(M, out_cols, dtype=packed.dtype)
    return ApplyPackedReflectors(packed, tau, eye, nb, ncols, adjoint=False)


def LeftHyperbolicReflector(chi, x: jax.Array):
    """Hyperbolic Householder: returns (tau, new_chi, v) with
        (I - (1/tau) w w^H Sigma) [chi; x] = -lambda e_0,
    w = [1; v], Sigma = diag(1, -1, ..., -1)
    (reference: reflect/Hyperbolic.cpp:20-80 — the up/downdating
    kernel of van de Geijn & van Zee). chi must be real with
    chi^2 > ||x||^2 (else the result is NaN, the traced analogue of
    the reference's LogicError)."""
    x = jnp.asarray(x)
    alpha = jnp.real(jnp.asarray(chi))
    xnrm2 = jnp.sum(jnp.abs(x) ** 2)
    delta = alpha * alpha - xnrm2
    lam = jnp.where(alpha >= 0, jnp.sqrt(delta), -jnp.sqrt(delta))
    kappa = alpha + lam
    zero_kappa = kappa == 0
    safe = jnp.where(zero_kappa, jnp.ones_like(kappa), kappa)
    v = jnp.where(zero_kappa, jnp.zeros_like(x), x / safe.astype(x.dtype))
    tau = jnp.where(zero_kappa, jnp.ones_like(delta),
                    (delta + alpha * lam) / (safe * safe))
    return tau, -lam, v


def RightHyperbolicReflector(chi, x: jax.Array):
    """Row form (reference: Hyperbolic.cpp:132): the left kernel with
    the vector conjugated on exit."""
    tau, new_chi, v = LeftHyperbolicReflector(chi, x)
    return tau, new_chi, jnp.conj(v)


def LeftReflector(chi, x: jax.Array):
    """Public reflector kernel (reference: Householder.cpp:40
    LeftReflector): returns (tau, beta, v) with
    (I - tau [1; v] [1; v]^H) [chi; x] = [beta; 0]. The x = 0 special
    case returns the VALID reflector tau = 2, v = 0 mapping chi to
    -chi, as the reference does (never H = I)."""
    x = jnp.asarray(x)
    full = jnp.concatenate([jnp.asarray(chi, x.dtype).reshape(1), x])
    v, tau, beta = householder(full, 0, full.shape[0])
    trivial = jnp.sum(jnp.abs(x) ** 2) == 0
    # x = 0: the reference uses tau=2, v=0, beta=-chi
    tau = jnp.where(trivial, jnp.asarray(2.0, tau.dtype), tau)
    beta = jnp.where(trivial, -jnp.asarray(chi, beta.dtype), beta)
    v = jnp.where(trivial, jnp.zeros_like(v), v)
    return tau, beta, v[1:]


def RightReflector(chi, x: jax.Array):
    """Row form (reference: Householder.cpp RightReflector): the left
    kernel with the vector conjugated on exit."""
    tau, beta, v = LeftReflector(chi, x)
    return tau, beta, jnp.conj(v)
