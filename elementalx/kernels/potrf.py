"""Fused Pallas Cholesky panel-tail (potrf) kernel.

Reference: src/lapack_like/factor/Cholesky/UpperVariant3.hpp:76-124 /
LowerVariant3.hpp — the blocked variant-3 panel step
(chol(A11) -> trsm(A21)). In the flat left-looking single-chip driver
(`lapack/cholesky.py:_chol_lower_left`) the panel tail is three XLA
dispatches per panel — ``cholesky(A11)`` + ``tri_inv_lower`` + the
``A21 @ inv(L11)^H`` matmul — whose fixed costs and small-matrix
sequential phases are the residual gap to MXU peak (VERDICT r4 item 1).
This kernel fuses the whole tail into ONE pallas_call.

Design (carries over kernels/getrf.py's transposed-panel scheme, minus
pivoting):

  * grid iteration 0 factors the SYMMETRIZED (w, w) diagonal block in
    VMEM via the no-pivot LDL elimination in the "columns as sublanes"
    layout (A11 symmetric => the transposed working copy IS A11):
    rank-1 eliminations confined to 8-column sublane groups, group ->
    mid-block updates through one-hot MXU gathers + an 8-wide
    product-form inverse, mid-block -> trailing mid-blocks through the
    blocked 128-wide unit-upper inversion;
  * the elimination leaves row j holding d_j at lane j and the unit-L
    multipliers L[i, j] at lanes i > j, so the unit-upper matrix
    M = I + triu(tp, 1) IS L_unit^T; the Cholesky solve operator is
    inv(L^H) = inv_unit_upper(M) * rsqrt(d) (columns scaled);
  * every grid iteration then computes its (tile, w) slice of the
    factor column as ONE MXU matmul ``out = src @ inv(L^H)`` — tile 0
    uses the symmetrized diagonal block (A11 inv(L^H) = L11 exactly)
    masked to its lower triangle, later tiles stream the raw panel
    rows (L21 = A21 inv(L11)^H, the partitioned-inverse trsm).

f32 only (the bf16-storage driver runs its panels through f32 carriers
already).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .getrf import _dot, _inv_unit_upper

_MID = 128             # mid-level block = lane width
_SUB = 8               # inner group = f32 sublane tile height


def _factor_block(a11_ref, tp, inv_ref, w):
    """No-pivot LDL elimination of the symmetric (w, w) block in the
    transposed layout, then inv(L_chol^H) into ``inv_ref``."""
    nmid = w // _MID
    tp[:, :] = a11_ref[:, :]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB), 1)
    sub128 = jax.lax.broadcasted_iota(jnp.int32, (_MID, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _MID), 1)

    for mid in range(nmid):
        m0 = mid * _MID

        def group(g, _):
            j0 = pl.multiple_of(m0 + g * _SUB, _SUB)
            B = tp[pl.ds(j0, _SUB), :]                   # (8, w)

            for t in range(_SUB):                        # static unroll
                j = j0 + t
                rmask = sub8 == t                        # (8, 1)
                col = jnp.sum(jnp.where(rmask, B, 0.0), axis=0,
                              keepdims=True)             # (1, w)
                isp = lanes == j
                d = jnp.sum(jnp.where(isp, col, 0.0))
                safe = jnp.where(d == 0, jnp.float32(1), d)
                elim = lanes > j
                l = jnp.where(elim, col / safe, 0.0)     # LDL multipliers
                # value of each later group column at lane j (symmetric
                # trailing block: = column j's value at that lane)
                uvals = jnp.sum(jnp.where(isp, B, 0.0), axis=1,
                                keepdims=True)           # (8, 1)
                Bupd = B - jnp.where(sub8 > t, uvals, 0.0) * l
                B = jnp.where(rmask, jnp.where(elim, l, col), Bupd)

            tp[pl.ds(j0, _SUB), :] = B

            # group compound update to the rest of the mid-block (see
            # kernels/getrf.py — identical structure, pivots static)
            Oh = (jax.lax.broadcasted_iota(jnp.int32, (w, _SUB), 0)
                  == j0 + jax.lax.broadcasted_iota(
                      jnp.int32, (w, _SUB), 1)).astype(jnp.float32)
            lmask = lanes > j0 + sub8                    # multipliers
            Lg = jnp.where(lmask, B, 0.0)                # (8, w)
            L8 = _dot(Lg, Oh)                            # (8, 8)
            R = -jnp.where(sub8 < lane8, L8, 0.0)        # -(strict upper)
            inv8 = jnp.eye(_SUB, dtype=jnp.float32) + R
            for _ in range(2):                           # (I+R)(I+R^2)(I+R^4)
                R = _dot(R, R)
                inv8 = _dot(inv8, jnp.eye(_SUB, dtype=jnp.float32) + R)
            Tm = tp[m0:m0 + _MID, :]                     # (128, w)
            Gall = _dot(Tm, Oh)                          # (128, 8)
            after = sub128 >= (j0 - m0 + _SUB)
            U = _dot(jnp.where(after, Gall, 0.0), inv8)  # (128, 8)
            tp[m0:m0 + _MID, :] = Tm - _dot(U, Lg)
            return 0

        jax.lax.fori_loop(0, _MID // _SUB, group, 0)

        # mid-level compound update to the trailing mid-blocks
        if mid + 1 < nmid:
            Ohm = (jax.lax.broadcasted_iota(jnp.int32, (w, _MID), 0)
                   == m0 + jax.lax.broadcasted_iota(
                       jnp.int32, (w, _MID), 1)).astype(jnp.float32)
            lmaskM = lanes > m0 + sub128
            Lm = jnp.where(lmaskM, tp[m0:m0 + _MID, :], 0.0)  # (128, w)
            L11 = _dot(Lm, Ohm)                          # (128, 128)
            invm = _inv_unit_upper(jnp.where(sub128 < lane128, L11, 0.0))
            for mid2 in range(mid + 1, nmid):            # static
                k0 = mid2 * _MID
                G = _dot(tp[k0:k0 + _MID, :], Ohm)       # (128, 128)
                U = _dot(G, invm)
                tp[k0:k0 + _MID, :] = tp[k0:k0 + _MID, :] - _dot(U, Lm)

    # tp row j now holds: lane j = d_j, lanes > j = L_unit[i, j].
    # M = I + triu(tp, 1) is L_unit^T; inv(L^H) = inv(M) * rsqrt(d) cols.
    subw = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    lanew = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    Mu = jnp.where(subw < lanew, tp[:, :], 0.0)
    inv_u = _inv_unit_upper(Mu)
    dvec = jnp.sum(jnp.where(subw == lanew, tp[:, :], 0.0), axis=0,
                   keepdims=True)                        # (1, w)
    safe_d = jnp.where(dvec <= 0, jnp.float32(1), dvec)
    rs = jax.lax.rsqrt(safe_d)
    # non-HPD: poison the operator so the driver's NaN check fires
    rs = jnp.where(dvec <= 0, jnp.float32(jnp.nan), rs)
    inv_ref[:, :] = inv_u * rs


def _apply_dot(src, inv, low_apply):
    """Streaming trsm apply: in bf16-storage mode the factor is kept in
    bf16 anyway, so the operands truncate to bf16 for a single-pass MXU
    dot (matches the XLA path's DEFAULT-precision matmul); the f32 mode
    keeps the full-precision dot. Mosaic rejects bf16 operands with an
    f32 accumulator type ("Bad lhs type"), so the low mode asks for a
    bf16 result — the MXU still accumulates f32 internally and the
    driver casts the panel to bf16 storage anyway."""
    if low_apply:
        # f32 refs, one-pass bf16 MXU contraction: this Mosaic build
        # rejects bf16 operand/acc vectors outright; the precision
        # attribute is the supported way to drop to a single pass
        return jax.lax.dot_general(
            src, inv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    return _dot(src, inv)


def _potrf_kernel(a11_ref, pan_ref, out_ref, tp, inv_ref, *,
                  low_apply: bool):
    i = pl.program_id(0)
    w = a11_ref.shape[0]

    @pl.when(i == 0)
    def _():
        _factor_block(a11_ref, tp, inv_ref, w)
        L11 = _dot(a11_ref[:, :], inv_ref[:, :])
        subw = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        lanew = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        out_ref[:, :] = jnp.where(subw >= lanew, L11, 0.0)

    @pl.when(i > 0)
    def _():
        out_ref[:, :] = _apply_dot(pan_ref[:, :], inv_ref[:, :], low_apply)


def _potrf_kernel_full(kidx_ref, a11_ref, pan_ref, out_ref, tp, inv_ref,
                       *, low_apply: bool):
    """Shape-uniform variant: the panel is the FULL-HEIGHT (M, w)
    column; ``kidx_ref[0]`` is the diagonal block's tile index. Tiles
    above the diagonal write zeros; the diagonal tile factors; tiles
    below stream the trsm apply. One Mosaic compile serves every panel
    of the factorization (the (Mt, w) form compiles once per trailing
    height — 32 distinct kernels at N=16384)."""
    i = pl.program_id(0)
    k = kidx_ref[0]
    w = a11_ref.shape[0]

    @pl.when(i < k)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(i == k)
    def _():
        _factor_block(a11_ref, tp, inv_ref, w)
        L11 = _dot(a11_ref[:, :], inv_ref[:, :])
        subw = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        lanew = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        out_ref[:, :] = jnp.where(subw >= lanew, L11, 0.0)

    @pl.when(i > k)
    def _():
        out_ref[:, :] = _apply_dot(pan_ref[:, :], inv_ref[:, :], low_apply)


@functools.partial(jax.jit, static_argnames=("interpret", "low_apply"))
def potrf_panel_tail_full(sym_a11: jax.Array, pan_full: jax.Array,
                          kidx, interpret: bool = False,
                          low_apply: bool = False) -> jax.Array:
    """Shape-uniform fused panel tail: ``pan_full`` is the full-height
    (M, w) history-updated column with the diagonal block at tile
    ``kidx`` (= k0 // w); rows above k0 are ignored and returned as
    zeros. One compiled kernel serves every panel."""
    M, w = pan_full.shape
    assert pan_full.dtype == jnp.float32 and sym_a11.dtype == jnp.float32
    assert sym_a11.shape == (w, w)
    assert w % _MID == 0 and M % w == 0
    kv = jnp.atleast_1d(jnp.asarray(kidx, jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // w,),
        in_specs=[
            pl.BlockSpec((w, w), lambda i, k: (0, 0)),
            pl.BlockSpec((w, w), lambda i, k: (i, 0)),
        ],
        out_specs=pl.BlockSpec((w, w), lambda i, k: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((w, w), jnp.float32),
            pltpu.VMEM((w, w), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_potrf_kernel_full, low_apply=low_apply),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, w), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=w * w * w + 2 * M * w * w, bytes_accessed=2 * M * w * 4,
            transcendentals=w),
    )(kv, sym_a11, pan_full)


def _potrf_diag_kernel(a11_ref, l11_ref, inv_ref, tp):
    """Diagonal-block-only tail: factor + inv(L^H), NO panel streaming.
    The full-tail kernels above lose to the XLA tail because their
    `_apply_dot` streams the (Mt, w) panel through VMEM at VPU-ish
    rates (measured NULL, scratch/ab_chol7/10.py); this variant keeps
    only the part where fusion wins — replacing the ~15 small XLA
    dispatches of cholesky + log-depth tri_inv per panel with ONE
    launch — and leaves the L21 matmul to XLA's MXU."""
    w = a11_ref.shape[0]
    _factor_block(a11_ref, tp, inv_ref, w)
    L11 = _dot(a11_ref[:, :], inv_ref[:, :])
    subw = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    lanew = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    l11_ref[:, :] = jnp.where(subw >= lanew, L11, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def potrf_block_inv(sym_a11: jax.Array, interpret: bool = False):
    """One-launch (w, w) Cholesky block factor + transposed-inverse:
    returns ``(l11, invLH)`` with ``l11`` the lower Cholesky factor and
    ``invLH = inv(l11)^H`` (so L21 = pan @ invLH — one MXU matmul).
    Non-HPD blocks poison both outputs with NaN (driver check).
    f32, w % 128 == 0."""
    w = sym_a11.shape[0]
    assert sym_a11.dtype == jnp.float32 and sym_a11.shape == (w, w)
    assert w % _MID == 0
    return pl.pallas_call(
        _potrf_diag_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((w, w), jnp.float32),
            jax.ShapeDtypeStruct((w, w), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((w, w), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * w * w * w, bytes_accessed=3 * w * w * 4,
            transcendentals=w),
    )(sym_a11)


@functools.partial(jax.jit, static_argnames=("interpret", "low_apply"))
def potrf_panel_tail(sym_a11: jax.Array, pan: jax.Array,
                     interpret: bool = False,
                     low_apply: bool = False) -> jax.Array:
    """Fused Cholesky panel tail: ``sym_a11`` the SYMMETRIZED (w, w)
    diagonal block, ``pan`` the full (Mt, w) history-updated panel
    (rows [0, w) may hold garbage above the diagonal — the symmetrized
    block is what iteration 0 consumes). Returns the (Mt, w) factor
    column [L11; L21]. Requires Mt % w == 0, w % 128 == 0, f32.
    ``low_apply``: run the L21 streaming dot with bf16 operands
    (single-pass MXU — for bf16-storage drivers)."""
    Mt, w = pan.shape
    assert pan.dtype == jnp.float32 and sym_a11.dtype == jnp.float32
    assert sym_a11.shape == (w, w)
    assert w % _MID == 0 and Mt % w == 0
    return pl.pallas_call(
        functools.partial(_potrf_kernel, low_apply=low_apply),
        grid=(Mt // w,),
        out_shape=jax.ShapeDtypeStruct((Mt, w), jnp.float32),
        in_specs=[
            pl.BlockSpec((w, w), lambda i: (0, 0)),
            pl.BlockSpec((w, w), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((w, w), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((w, w), jnp.float32),
            pltpu.VMEM((w, w), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=w * w * w + 2 * Mt * w * w, bytes_accessed=2 * Mt * w * 4,
            transcendentals=w),
    )(sym_a11, pan)
