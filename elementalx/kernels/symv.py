"""Pallas symmetric matvec reading only the lower triangle.

The blocked Householder tridiagonalization (lapack/condense.py) is
bandwidth-bound on its per-column Hermitian matvec: `at0 @ v` reads the
full (Mt, Mt) trailing block, n^3/3 * 4 B of HBM traffic over the whole
reduction (PERF.md). A symmetric matrix only needs its lower triangle:
this kernel walks the nblk(nblk+1)/2 lower-triangular blocks once,
emitting each block's contribution to BOTH out[i] (A[i,j] @ v[j]) and
out[j] (A[i,j]^T @ v[i]) — halving the dominant traffic.

Per-step partial rows are written to (T, bs) buffers and segment-summed
outside the kernel (a revisited accumulator output would need
non-contiguous block revisits, which Pallas TPU forbids; the partials
are tiny).

Reference role: the symv kernels of the reference's panel algorithms
(src/blas_like/level2/Symv, used by HermitianTridiag's panels).

Measured on v5e (n=8192, bs=1024): at the tridiagonalization's
per-column grain this kernel is 2.4x SLOWER than the plain full-read
matvec (~8k pallas_call launches of 36 grid steps each — per-call and
per-step overheads swamp the halved DMA). It is kept as a library
primitive (one-shot symv on large matrices, where one launch amortizes);
the tridiag panel uses the plain matvec.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .common import on_tpu


def _symv_kernel(ii_ref, jj_ref, a_ref, vj_ref, vi_ref, o1_ref, o2_ref,
                 *, bs: int):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    i = ii_ref[t]
    j = jj_ref[t]
    diag = i == j
    a = a_ref[...]
    r = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    zero = jnp.zeros((), a.dtype)
    # diagonal blocks: split into tril (-> out[i]) and strict-tril
    # transposed (-> out[j] == out[i], summed later)
    a1 = jnp.where(diag & (r < c), zero, a)
    a2 = jnp.where(diag & (r <= c), zero, a)
    vj = vj_ref[0, :]
    vi = vi_ref[0, :]
    o1_ref[0, 0, :] = jnp.dot(a1, vj, precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32
                              ).astype(o1_ref.dtype)
    o2_ref[0, 0, :] = jnp.dot(a2.T, vi, precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32
                              ).astype(o2_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bs',))
def _symv_lower_tpu(A: jax.Array, v: jax.Array, bs: int) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = A.shape[0]
    nblk = M // bs
    ii, jj = np.tril_indices(nblk)
    T = ii.shape[0]
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)
    v2 = v[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((bs, bs), lambda t, ii, jj: (ii[t], jj[t])),
            pl.BlockSpec((1, bs), lambda t, ii, jj: (0, jj[t])),
            pl.BlockSpec((1, bs), lambda t, ii, jj: (0, ii[t])),
        ],
        out_specs=[
            # (T, 1, bs) with (1, 1, bs) blocks: Pallas TPU requires the
            # trailing two block dims to divide (8, 128) or equal the
            # array dims — the singleton middle axis satisfies that
            pl.BlockSpec((1, 1, bs), lambda t, ii, jj: (t, 0, 0)),
            pl.BlockSpec((1, 1, bs), lambda t, ii, jj: (t, 0, 0)),
        ],
    )
    o1, o2 = pl.pallas_call(
        functools.partial(_symv_kernel, bs=bs),
        grid_spec=grid_spec,
        # partials stay f32 so the cross-block segment_sum accumulates
        # in f32 even for bf16 A (ADVICE r1: bf16 partial accumulation
        # was less accurate than the plain A @ v fallback)
        out_shape=[jax.ShapeDtypeStruct((T, 1, bs), jnp.float32)] * 2,
    )(ii, jj, A, v2, v2)
    s1 = jax.ops.segment_sum(o1[:, 0, :], ii, num_segments=nblk)
    s2 = jax.ops.segment_sum(o2[:, 0, :], jj, num_segments=nblk)
    return (s1 + s2).reshape(M).astype(A.dtype)


def symv_lower(A: jax.Array, v: jax.Array, bs: int = 1024) -> jax.Array:
    """out = H @ v where H = tril(A) + tril(A, -1)^H, touching only the
    lower triangle of A on TPU. Off-TPU (or for complex/odd shapes) A is
    assumed fully Hermitian-stored and a plain matvec is used."""
    M = A.shape[0]
    if (not on_tpu() or jnp.iscomplexobj(A) or M % bs != 0
            or A.dtype == jnp.float64):
        return A @ v
    return _symv_lower_tpu(A, v, bs)


def symv_lower_trailing(a: jax.Array, v: jax.Array, k0: int,
                        bs: int = 1024) -> jax.Array:
    """Hermitian matvec over the trailing block ``a[k0:, k0:]`` (lower
    triangle authoritative) given the LOCAL vector v of length M - k0.
    Rounds the slice origin down to a multiple of ``bs`` and zero-pads v
    so the kernel's block shapes stay in a handful of buckets (the
    columns added on the left are junk — finished panel reflectors — but
    their zero v entries annihilate every contribution)."""
    M = a.shape[0]
    if not on_tpu() or jnp.iscomplexobj(a) or a.dtype == jnp.float64 \
            or M % bs != 0:
        return a[k0:, k0:] @ v
    k0r = (k0 // bs) * bs
    pad = k0 - k0r
    vp = jnp.concatenate([jnp.zeros((pad,), v.dtype), v]) if pad else v
    out = _symv_lower_tpu(a[k0r:, k0r:], vp, bs)
    return out[pad:]
