"""Batched recursive triangular inversion.

XLA:TPU lowers ``TriangularSolve`` to sequential substitution, so an
``nb x nb`` solve against the identity costs ~nb dependent steps of
latency-bound work. This module computes triangular inverses as a
log-depth tree of *batched* MXU matmuls instead:

    inv([[A, B], [0, C]]) = [[inv(A), -inv(A) B inv(C)], [0, inv(C)]]

All diagonal blocks at one granularity invert simultaneously (one
batched base solve at 16x16, then two batched gemms per doubling
level). The inner-loop consumers — compact-WY T construction
(lapack/reflect.build_wy_T), the LU panel's inv(L11), trsm's
partitioned-inverse base — were measured at ~0.5-1.3 ms per call
through XLA's substitution at nb=128-512; this path is ~an order of
magnitude cheaper (a handful of batched ops).

Reference role: the partitioned-inverse idiom replaces the vendor
``trtri``/``larft`` calls of the reference's panel algorithms
(src/core/imports/blas, factor/QR/Householder.hpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BASE = 16


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def tri_inv_upper(U: jax.Array, base: int = _BASE,
                  precision=None) -> jax.Array:
    """Inverse of an upper-triangular matrix via batched recursive
    2x2 block partitioning. Entries below the diagonal are ignored.
    The diagonal must be nonzero (callers guard padding with 1s).

    ``precision`` governs the doubling-level matmuls (None = the
    library default, 6-pass HIGHEST for f32). Hot factorization tails
    pass their panel precision: HIGH (bf16x3, f32-grade) for f32
    carriers, DEFAULT for bf16-storage paths whose consumer matmuls
    truncate to bf16 anyway — the inverse feeds a DEFAULT-precision
    gemm, so extra inverse passes buy nothing."""
    n = U.shape[-1]
    P = max(_next_pow2(n), base)
    i = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    Up = jnp.zeros((P, P), U.dtype)
    Up = jax.lax.dynamic_update_slice(Up, U, (0, 0))
    # mask to the strict triangle and embed an identity in the padding
    Up = jnp.where(j >= i, Up, jnp.zeros((), U.dtype))
    Up = jnp.where((i == j) & (i >= n), jnp.ones((), U.dtype), Up)

    nblk = P // base
    ks = jnp.arange(nblk) * base
    blocks = jax.vmap(
        lambda k0: jax.lax.dynamic_slice(Up, (k0, k0), (base, base)))(ks)
    eye = jnp.broadcast_to(jnp.eye(base, dtype=U.dtype), blocks.shape)
    L = jax.lax.linalg.triangular_solve(blocks, eye, left_side=True,
                                        lower=False)

    s = base
    while s < P:
        npair = P // (2 * s)
        A = L[0::2]
        C = L[1::2]
        ks = jnp.arange(npair)
        B = jax.vmap(lambda t: jax.lax.dynamic_slice(
            Up, (2 * t * s, (2 * t + 1) * s), (s, s)))(ks)
        TR = -jnp.matmul(A, jnp.matmul(B, C, precision=precision),
                         precision=precision)
        top = jnp.concatenate([A, TR], axis=2)
        bot = jnp.concatenate([jnp.zeros_like(TR), C], axis=2)
        L = jnp.concatenate([top, bot], axis=1)
        s *= 2

    return L[0][:n, :n]


def tri_inv_lower(Lm: jax.Array, base: int = _BASE,
                  precision=None) -> jax.Array:
    """Inverse of a lower-triangular matrix (entries above the diagonal
    ignored)."""
    return tri_inv_upper(Lm.T, base, precision=precision).T


def tri_inv_lower_unit(Lm: jax.Array, base: int = _BASE,
                       precision=None) -> jax.Array:
    """Inverse of a UNIT lower-triangular matrix (stored diagonal and
    upper entries ignored)."""
    n = Lm.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    Lu = jnp.where(i == j, jnp.ones((), Lm.dtype), Lm)
    return tri_inv_lower(Lu, base, precision=precision)
