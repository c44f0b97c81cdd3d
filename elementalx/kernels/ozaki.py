"""f64-emulated matrix multiplication on the MXU (Ozaki splitting).

SURVEY §7 hard-part #1: the TPU MXU computes in bf16/f32 only, while the
reference's LAPACK-grade contracts assume f64. This module provides the
"f64-emulation correctness mode" of BASELINE.md.

Scheme (Ozaki error-free transformation):
 * scale each row of A (column of B) by a power of two so its slices are
   small integers: slice i holds beta=8 bits aligned at the row's
   exponent — extracted exactly with the (r + sigma) - sigma trick;
 * every bf16 x bf16 partial matmul over a K-block of 256 sums integers
   bounded by 2^24, so the f32 MXU result is EXACT;
 * partials are rescaled by powers of two (exact) and combined with
   compensated (TwoSum) f32-pair accumulation.

Total relative error ~ 2^-48 (f64-grade), at roughly s^2/2 ~ 25x the
bf16 matmul cost — all MXU work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

_KBLOCK = 256       # 8 + 8 + log2(256) = 24 <= f32 mantissa: exact partials
_BETA = 8           # bits per slice
_SLICES = 7         # 7 x 8 = 56 >= 53-bit f64 mantissa coverage


def _pow2_scale(x32: jax.Array, axis: int) -> jax.Array:
    """EXACT power-of-two >= max|x| along axis (keepdims); 1 for zero
    vectors. (jnp.exp2/log2 are approximate — frexp/ldexp are exact.)"""
    mx = jnp.max(jnp.abs(x32), axis=axis, keepdims=True)
    _, ex = jnp.frexp(jnp.where(mx == 0, 1.0, mx))  # mx = m * 2^ex, m in [0.5,1)
    e = jnp.ldexp(jnp.ones_like(mx), ex)
    return jnp.where(mx == 0, jnp.ones_like(e), e)


def _split_aligned(hi32: jax.Array, lo32: jax.Array, axis: int, s: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Split x = hi + lo (f32 pair covering a f64 mantissa) into s bf16
    integer slices aligned at the per-vector power-of-two exponent.

    Returns (slices (s, *shape) bf16 holding integers < 2^BETA,
             ulp (s, keepdims-shape) power-of-two scale per slice)."""
    e = _pow2_scale(hi32, axis)
    slices = []
    ulps = []
    # work in the f32 pair (r_hi, r_lo); extract from the top
    r_hi, r_lo = hi32, lo32
    for i in range(s):
        ulp = e * jnp.float32(2.0 ** (-_BETA * (i + 1)))  # exact pow-2
        # 1.5 * 2^23 * ulp keeps r + sigma inside one binade whose f32
        # spacing is exactly ulp, for r of either sign
        sigma = ulp * jnp.float32(3 << 22)
        t = (r_hi + sigma) - sigma       # r_hi rounded to a multiple of ulp
        r_hi = r_hi - t                  # exact (Sterbenz)
        q = t / ulp                      # exact: power-of-two division
        slices.append(q.astype(jnp.bfloat16))
        ulps.append(ulp)
        # after the high f32 is drained (~3 slices), absorb the low word
        if i == 2:
            r_hi = r_hi + r_lo
            r_lo = jnp.zeros_like(r_lo)
    return jnp.stack(slices), jnp.stack(ulps)


def _two_sum(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Error-free addition: a + b = s + e exactly (Knuth TwoSum)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


@functools.partial(jax.jit, static_argnames=("s",))
def _emulated_core(a_hi32, a_lo32, b_hi32, b_lo32, s: int = _SLICES):
    M, K = a_hi32.shape
    N = b_hi32.shape[1]
    kb = min(_KBLOCK, K)
    while K % kb:
        kb -= 1
    nb_k = K // kb

    A_sl, A_ulp = _split_aligned(a_hi32, a_lo32, axis=1, s=s)  # (s,M,K),(s,M,1)
    B_sl, B_ulp = _split_aligned(b_hi32, b_lo32, axis=0, s=s)  # (s,K,N),(s,1,N)

    A_b = A_sl.reshape(s, M, nb_k, kb)
    B_b = B_sl.reshape(s, nb_k, kb, N)

    C_hi = jnp.zeros((M, N), jnp.float32)
    C_lo = jnp.zeros((M, N), jnp.float32)
    order = sorted(((i, j) for i in range(s) for j in range(s)),
                   key=lambda t: t[0] + t[1])
    for (i, j) in order:
        if i + j > s:   # below ~2^-64 relative: negligible
            continue
        scale = A_ulp[i] * B_ulp[j]       # power of two: exact rescale

        # the K-block matmul runs INSIDE the scan so only ONE (M, N)
        # product is live at a time (materializing all nb_k blocks is
        # (nb_k, M, N) f32 — 8 GB at n=8192, an HBM OOM on one chip)
        def red(carry, ab):
            hi, lo = carry
            a_blk, b_blk = ab
            p = jnp.dot(a_blk, b_blk, preferred_element_type=jnp.float32)
            hi, e = _two_sum(hi, p * scale)
            return (hi, lo + e), None

        (p_hi, p_lo), _ = jax.lax.scan(
            red, (jnp.zeros((M, N), jnp.float32),
                  jnp.zeros((M, N), jnp.float32)),
            (jnp.moveaxis(A_b[i], 1, 0), B_b[j]))
        C_hi, e1 = _two_sum(C_hi, p_hi)
        C_lo = C_lo + e1 + p_lo
    return C_hi, C_lo


@functools.partial(jax.jit, static_argnames=("s",))
def _emulated_core_lean(a_hi32, a_lo32, b_hi32, b_lo32, s: int = _SLICES):
    """Memory-lean variant of `_emulated_core`: only the A slice stack
    is materialized; B slices are extracted ON DEMAND by carrying the
    drain cascade through the j-loop, so at most one B slice is live.

    Rationale (measured at n=8192 on v5e): the two-stack form's ~15
    interleaved 128-896 MB buffers fragment XLA:TPU's HBM allocator to
    85% (17 GB allocated for 2.5 GB of data — a compile-time OOM on a
    16 GB chip). Product order becomes j-major instead of (i+j)-sorted;
    the compensated (TwoSum-carried) accumulation keeps ~2^-48 results
    for either order (validated against `_emulated_core` in tests)."""
    M, K = a_hi32.shape
    N = b_hi32.shape[1]
    kb = min(_KBLOCK, K)
    while K % kb:
        kb -= 1
    nb_k = K // kb

    A_sl, A_ulp = _split_aligned(a_hi32, a_lo32, axis=1, s=s)
    A_b = A_sl.reshape(s, M, nb_k, kb)

    eB = _pow2_scale(b_hi32, 0)                    # (1, N)
    r_hi, r_lo = b_hi32, b_lo32
    C_hi = jnp.zeros((M, N), jnp.float32)
    C_lo = jnp.zeros((M, N), jnp.float32)
    for j in range(s):
        ulp = eB * jnp.float32(2.0 ** (-_BETA * (j + 1)))
        sigma = ulp * jnp.float32(3 << 22)
        t = (r_hi + sigma) - sigma
        r_hi = r_hi - t
        q = (t / ulp).astype(jnp.bfloat16)         # B slice j
        if j == 2:
            r_hi = r_hi + r_lo
            r_lo = jnp.zeros_like(r_lo)
        B_bj = q.reshape(nb_k, kb, N)
        for i in range(s):
            if i + j > s:
                continue
            scale = A_ulp[i] * ulp

            def red(carry, ab, scale=scale):
                hi, lo = carry
                a_blk, b_blk = ab
                p = jnp.dot(a_blk, b_blk,
                            preferred_element_type=jnp.float32)
                hi, e = _two_sum(hi, p * scale)
                return (hi, lo + e), None

            (p_hi, p_lo), _ = jax.lax.scan(
                red, (jnp.zeros((M, N), jnp.float32),
                      jnp.zeros((M, N), jnp.float32)),
                (jnp.moveaxis(A_b[i], 1, 0), B_bj))
            C_hi, e1 = _two_sum(C_hi, p_hi)
            C_lo = C_lo + e1 + p_lo
    return C_hi, C_lo


def matmul_f64_emulated(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """C = a @ b for f64 inputs via exact bf16 partial products on the
    MXU + compensated accumulation. Relative error ~2^-48 vs f64."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a_hi = a.astype(np.float32)
    a_lo = (a - a_hi).astype(np.float32)
    b_hi = b.astype(np.float32)
    b_lo = (b - b_hi).astype(np.float32)
    C_hi, C_lo = _emulated_core(jnp.asarray(a_hi), jnp.asarray(a_lo),
                                jnp.asarray(b_hi), jnp.asarray(b_lo))
    return (np.asarray(C_hi, np.float64) + np.asarray(C_lo, np.float64))
