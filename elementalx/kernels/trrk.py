"""Fused triangular-masked rank-k update kernel.

The LocalTrrk workhorse of the blocked factorizations (reference:
src/blas_like/level3/Trrk.cpp + the LocalTrrk calls inside
factor/Cholesky/UpperVariant3.hpp:76-124). Computing the full product
and masking in the epilogue keeps the MXU at 100% while skipping the
separate select pass XLA would emit for triangle merges."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .common import on_tpu


def _trrk_kernel(a_ref, b_ref, c_ref, out_ref, acc_ref, *, n_k: int,
                 lower: bool, alpha: float, beta: float, bm: int, bn: int):
    from jax.experimental import pallas as pl

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        i = pl.program_id(0)
        j = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0) + i * bm
        cols = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1) + j * bn
        keep = (cols <= rows) if lower else (cols >= rows)
        updated = (alpha * acc_ref[:].astype(out_ref.dtype)
                   + beta * c_ref[:])
        out_ref[:] = jnp.where(keep, updated, c_ref[:])


def masked_rank_k(lower: bool, alpha, a: jax.Array, b: jax.Array,
                  beta, c: jax.Array, *, bm: int = 256, bn: int = 256,
                  bk: int = 512) -> jax.Array:
    """C_tri := alpha A B + beta C on the triangle; rest of C unchanged."""
    M, K = a.shape
    N = b.shape[1]
    if not (on_tpu() and M % 128 == 0 and N % 128 == 0 and K % 128 == 0
            and not jnp.iscomplexobj(a)):
        prod = jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        i = jax.lax.broadcasted_iota(jnp.int32, (M, N), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (M, N), 1)
        keep = (j <= i) if lower else (j >= i)
        return jnp.where(keep, jnp.asarray(alpha, c.dtype)
                         * prod.astype(c.dtype)
                         + jnp.asarray(beta, c.dtype) * c, c)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
    while M % bm:
        bm //= 2
    while N % bn:
        bn //= 2
    while K % bk:
        bk //= 2
    n_k = K // bk
    return pl.pallas_call(
        functools.partial(_trrk_kernel, n_k=n_k, lower=lower,
                          alpha=float(alpha), beta=float(beta), bm=bm, bn=bn),
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), c.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(a, b, c)
