"""Pallas VPU elementwise + transpose kernels.

Reference parity (SURVEY §2.6): src/hydrogen/blas/gpu/{Axpy,Copy,Fill,
Scale,Hadamard,Transpose}.cu. XLA fuses these patterns by itself in
jitted graphs; the explicit kernels exist for the shard_map inner loops
and as the demonstration that every reference CUDA kernel has a Pallas
equivalent. All fall back to jnp off-TPU or on awkward shapes."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .common import on_tpu


def _tileable(x, want=(8, 128)) -> bool:
    return (x.ndim == 2 and x.shape[0] % want[0] == 0
            and x.shape[1] % want[1] == 0 and not jnp.iscomplexobj(x))


def _ew_call(kernel, out_dtype, *arrays, block=(512, 512)):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, N = arrays[0].shape
    bm, bn = min(block[0], M), min(block[1], N)
    while M % bm:
        bm //= 2
    while N % bn:
        bn //= 2
    grid = (M // bm, N // bn)
    spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * len(arrays),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )(*arrays)


def _static_scalar(alpha):
    """Pallas kernels cannot close over traced values; only a concrete
    python scalar may be baked into the kernel body."""
    try:
        return float(alpha)
    except (TypeError, jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return None


def axpy(alpha, x: jax.Array, y: jax.Array) -> jax.Array:
    """y + alpha*x (reference: Axpy_GPU_impl)."""
    a = _static_scalar(alpha)
    if on_tpu() and _tileable(x) and a is not None:
        def k(x_ref, y_ref, o_ref):
            o_ref[:] = y_ref[:] + jnp.asarray(a, x_ref.dtype) * x_ref[:]

        return _ew_call(k, y.dtype, x, y)
    return y + jnp.asarray(alpha, y.dtype) * x


def scale(alpha, x: jax.Array) -> jax.Array:
    """alpha * x (reference: Scale_GPU_impl)."""
    a = _static_scalar(alpha)
    if on_tpu() and _tileable(x) and a is not None:
        def k(x_ref, o_ref):
            o_ref[:] = jnp.asarray(a, x_ref.dtype) * x_ref[:]

        return _ew_call(k, x.dtype, x)
    return jnp.asarray(alpha, x.dtype) * x


def hadamard(x: jax.Array, y: jax.Array) -> jax.Array:
    """x * y entrywise (reference: Hadamard_GPU_impl)."""
    if on_tpu() and _tileable(x):
        def k(x_ref, y_ref, o_ref):
            o_ref[:] = x_ref[:] * y_ref[:]

        return _ew_call(k, x.dtype, x, y)
    return x * y


def fill(shape, value, dtype) -> jax.Array:
    """Constant fill (reference: Fill_GPU_impl)."""
    v = _static_scalar(value)
    if on_tpu() and len(shape) == 2 and shape[0] % 8 == 0 \
            and shape[1] % 128 == 0 and v is not None:
        def k(o_ref):
            o_ref[:] = jnp.full(o_ref.shape, v, dtype)

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        M, N = shape
        bm, bn = min(512, M), min(512, N)
        while M % bm:
            bm //= 2
        while N % bn:
            bn //= 2
        return pl.pallas_call(
            k,
            grid=(M // bm, N // bn),
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), dtype),
        )()
    return jnp.full(shape, value, dtype)


def transpose(x: jax.Array) -> jax.Array:
    """Tiled transpose (reference: Transpose_GPU_impl). Reads (bm, bn)
    tiles, writes transposed (bn, bm) tiles — VMEM-local shuffles instead
    of a strided HBM walk."""
    if on_tpu() and _tileable(x, (128, 128)):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        M, N = x.shape
        b = 256
        while M % b or N % b:
            b //= 2

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:].T

        return pl.pallas_call(
            k,
            grid=(N // b, M // b),
            in_specs=[pl.BlockSpec((b, b), lambda i, j: (j, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((b, b), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, M), x.dtype),
        )(x)
    return x.T
