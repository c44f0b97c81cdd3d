"""Extended-precision accumulation (double-word arithmetic).

Reference role: the reference's extended-precision Element tiers
(BigFloat/Quad via MPFR/QD, include/El/core/Element + limits) give
users accumulation beyond the working precision. Arbitrary-precision
scalars are hostile to an accelerator, so the TPU-native tier is
double-word (compensated) arithmetic built from error-free transforms:
every value is an unevaluated pair hi + lo with |lo| <= ulp(hi)/2,
doubling the effective mantissa (f32 -> ~48 bits, f64 -> ~106 bits —
the Quad role). This complements kernels/ozaki.py, which covers
matmuls; here are the reductions (sum/dot/norm).

Design: TwoSum / TwoProd (Dekker split — jax exposes no fma primitive)
are elementwise VPU ops; the reduction is a PAIRWISE log-depth tree of
TwoSum nodes carrying (hi, lo) pairs — vectorized across each level, so
the whole reduction is ~2*log2(n) vector ops instead of a sequential
compensated scan (Ogita-Rump-Oishi SumK's serial VecSum would be
latency-bound on TPU).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def two_sum(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Error-free sum: a + b = s + e exactly (Knuth TwoSum, branchless)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def _split_const(dtype) -> float:
    # Dekker splitter: 2^ceil(p/2) + 1 for p mantissa bits
    if jnp.dtype(dtype) == jnp.float64:
        return 134217729.0          # 2^27 + 1
    return 4097.0                   # f32: 2^12 + 1


def two_prod(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Error-free product: a * b = p + e exactly (Dekker split TwoProd)."""
    p = a * b
    c = jnp.asarray(_split_const(a.dtype), a.dtype)
    aa = c * a
    ahi = aa - (aa - a)
    alo = a - ahi
    bb = c * b
    bhi = bb - (bb - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _pairwise_dd(hi: jax.Array, lo: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """Reduce (hi, lo) pair vectors to one pair by a log-depth tree of
    TwoSum nodes (each level one vectorized pass)."""
    n = hi.shape[0]
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            z = jnp.zeros((pad,), hi.dtype)
            hi = jnp.concatenate([hi, z])
            lo = jnp.concatenate([lo, z])
        s, e = two_sum(hi[0::2], hi[1::2])
        lo = e + (lo[0::2] + lo[1::2])
        hi = s
        # renormalise so lo stays small relative to hi
        hi, e2 = two_sum(hi, lo)
        lo = e2
        n = half
    return hi[0], lo[0]


def sum_extended(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Double-word sum of a vector: returns (hi, lo) with
    hi + lo ~= sum(x) at twice the working precision."""
    x = x.ravel()
    return _pairwise_dd(x, jnp.zeros_like(x))


def dot_extended(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Double-word dot product (Dot2-style: TwoProd per element, then
    the pairwise double-word reduction)."""
    x = x.ravel()
    y = y.ravel()
    p, e = two_prod(x, y)
    return _pairwise_dd(p, e)


def _pairwise_dd_axis1(hi: jax.Array, lo: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
    """Log-depth double-word tree reduction along axis 1 of a 3-D pair."""
    n = hi.shape[1]
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            z = jnp.zeros((hi.shape[0], pad, hi.shape[2]), hi.dtype)
            hi = jnp.concatenate([hi, z], axis=1)
            lo = jnp.concatenate([lo, z], axis=1)
        s, e = two_sum(hi[:, 0::2], hi[:, 1::2])
        lo = e + (lo[:, 0::2] + lo[:, 1::2])
        hi, e2 = two_sum(s, lo)
        lo = e2
        n = half
    return hi[:, 0], lo[:, 0]


def matmul_extended(a: jax.Array, b: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """Double-word matmul: (hi, lo) with hi + lo ~= a @ b at twice the
    working precision (f64 inputs -> ~106-bit mantissa, the Quad-GEMM
    role of the reference's QD tier; f32 -> ~48 bits). Every entry is a
    TwoProd followed by the log-depth double-word tree — pure VPU work,
    a correctness tier (use kernels/ozaki.py for fast f64-emulated
    matmuls on the MXU)."""
    m, K = a.shape
    K2, n = b.shape
    if K != K2:
        raise ValueError("matmul_extended: inner dimensions differ")
    if K == 0:
        z = jnp.zeros((m, n), a.dtype)
        return z, z
    # bound the (rb, K, n) intermediate to ~2^24 elements
    rb = max(1, min(m, (1 << 24) // max(K * n, 1) or 1))
    outs_hi, outs_lo = [], []
    for r0 in range(0, m, rb):
        ph, pe = two_prod(a[r0:r0 + rb, :, None], b[None, :, :])
        h, low = _pairwise_dd_axis1(ph, pe)
        outs_hi.append(h)
        outs_lo.append(low)
    return jnp.concatenate(outs_hi), jnp.concatenate(outs_lo)


def norm2_extended(x: jax.Array) -> jax.Array:
    """Euclidean norm with double-word accumulation of the squares."""
    hi, lo = dot_extended(x, x)
    # sqrt(hi + lo) to working precision via one Newton-ish correction
    r = jnp.sqrt(hi)
    safe = jnp.where(r > 0, r, jnp.ones((), r.dtype))
    return jnp.where(r > 0, r + (lo + (hi - r * r)) / (2 * safe), r)
