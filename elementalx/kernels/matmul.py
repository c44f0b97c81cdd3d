"""Pallas MXU matmul kernel.

The centerpiece local kernel (SURVEY §2.6: replaces cuBLAS/CUTLASS local
GEMM, src/hydrogen/blas/cutlass_blas/cutlassBLAS.cu). Classic tiled
schedule: grid (M/bm, N/bn, K/bk) with the K axis innermost ("arbitrary"
semantics), f32 VMEM accumulator, bf16/f32 inputs feeding the 128x128
systolic array.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .common import cdiv, on_tpu


def _matmul_kernel(a_ref, b_ref, out_ref, acc_ref, *, n_k: int):
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
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def matmul_pallas(a: jax.Array, b: jax.Array, *, bm: int = 512,
                  bn: int = 512, bk: int = 512,
                  out_dtype=None) -> jax.Array:
    """C = A @ B with explicit MXU tiling. Shapes must be tile-divisible
    (the DistMatrix padding quantum guarantees 128-divisibility for
    realistic sizes; callers fall back to jnp otherwise)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = a.shape
    K2, N = b.shape
    assert K == K2
    bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
    if M % bm or N % bn or K % bk:
        raise ValueError(f"matmul_pallas: {(M, K, N)} not divisible by "
                         f"{(bm, bk, bn)}")
    n_k = K // bk
    out_dtype = out_dtype or a.dtype
    grid = (M // bm, N // bn, n_k)
    return pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N) * a.dtype.itemsize + M * N * 4,
            transcendentals=0),
    )(a, b)


def matmul(a: jax.Array, b: jax.Array, out_dtype=None) -> jax.Array:
    """Local matmul: Pallas kernel on TPU when tiles divide, jnp (XLA)
    otherwise."""
    if (on_tpu() and a.ndim == 2 and b.ndim == 2
            and not jnp.iscomplexobj(a)):
        M, K = a.shape
        N = b.shape[1]
        if M % 128 == 0 and N % 128 == 0 and K % 128 == 0:
            bm = 512 if M % 512 == 0 else (256 if M % 256 == 0 else 128)
            bn = 512 if N % 512 == 0 else (256 if N % 256 == 0 else 128)
            bk = 512 if K % 512 == 0 else (256 if K % 256 == 0 else 128)
            return matmul_pallas(a, b, bm=bm, bn=bn, bk=bk,
                                 out_dtype=out_dtype)
    acc = jnp.float32 if a.dtype in (jnp.bfloat16, jnp.float16) else None
    out = jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=acc)
    return out.astype(out_dtype or a.dtype)
