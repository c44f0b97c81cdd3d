"""Fused Pallas pivoted-panel LU (getrf) kernel.

Reference: src/lapack_like/factor/LU/Panel.hpp:68-158 — the distributed
pivoted panel (per-column MaxLoc + row-swap broadcast). XLA:TPU's own
LuDecompositionBlock custom call charges ~0.56 ns per panel ELEMENT
(PERF.md: (4096,512) 1.18 ms, (8192,512) 2.94 ms), and the invariant
N^2/2 panel area puts a ~150 ms floor under the N=16384 factorization.
This kernel factors the whole chunk out of VMEM instead.

TPU-native design (rows never move — the same physical-rows scheme as
the LU driver itself):

  * the (Mt, w) chunk is DMA'd HBM -> VMEM once and factored in place;
  * partial pivoting per column is an on-device masked argmax; elected
    rows are MARKED (a per-row ``used_step`` stamp), never swapped —
    the multiplier/U-row structure lives under the implicit permutation
    and one gather outside the kernel produces the LAPACK packed layout;
  * columns are processed in inner blocks of ``ib``: rank-1 elimination
    confined to the block (VPU), then one (Mt, ib) x (ib, w) MXU matmul
    applies the block's compound update to the trailing columns — the
    U rows of the block are reconstructed by an ib-step forward
    substitution on the gathered pivot rows.

f32 only (pivot selection in low precision is unstable and bf16 inputs
are upcast by the LU driver already).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_BIG = float(2 ** 30)  # plain float: a jnp scalar would be a captured const


def _getrf_kernel(ib: int, a_hbm, out_hbm, piv_ref, scratch, used, gbuf,
                  ubuf, sem):
    """scratch: (Mt, w) VMEM working copy; used: (Mt, 1) elimination-step
    stamps (+BIG = never elected); gbuf/ubuf: (ib, w) gathered pivot rows
    and reconstructed U rows; piv_ref: (w,) SMEM pivot row per column."""
    Mt, w = scratch.shape
    nblk = w // ib

    cp_in = pltpu.make_async_copy(a_hbm, scratch, sem)
    cp_in.start()
    cp_in.wait()

    used[:, :] = jnp.full((Mt, 1), _BIG, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (Mt, 1), 0)
    ib_ids = jax.lax.broadcasted_iota(jnp.int32, (1, ib), 1)
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def outer(blk, _):
        j0 = blk * ib

        def col_step(t, _):
            j = j0 + t
            col = scratch[:, pl.ds(j, 1)]                    # (Mt, 1)
            stamp = used[:, :]
            unused = stamp >= _BIG
            mag = jnp.where(unused, jnp.abs(col), jnp.float32(-1))
            p = jnp.argmax(mag).astype(jnp.int32)  # (Mt,1): flat == row
            piv_ref[j] = p
            isp = rows == p                              # (Mt, 1)
            pivval = jnp.sum(jnp.where(isp, col, jnp.zeros_like(col)))
            safe = jnp.where(pivval == 0, jnp.float32(1), pivval)
            elim = unused & ~isp
            l = jnp.where(elim, col / safe, jnp.zeros_like(col))
            # store multipliers in column j (pivot/used rows keep theirs)
            scratch[:, pl.ds(j, 1)] = jnp.where(elim, l, col)
            # rank-1 update confined to this inner block's later columns
            blkcols = scratch[:, pl.ds(j0, ib)]          # (Mt, ib)
            urow = jnp.sum(jnp.where(isp, blkcols, jnp.zeros_like(blkcols)),
                           axis=0, keepdims=True)        # (1, ib)
            cmask = ib_ids > t
            scratch[:, pl.ds(j0, ib)] = blkcols - l * jnp.where(
                cmask, urow, jnp.zeros_like(urow))
            used[:, :] = jnp.where(isp, jnp.full((Mt, 1), j, jnp.float32),
                                   stamp)
            return 0

        jax.lax.fori_loop(0, ib, col_step, 0, unroll=True)

        @pl.when(j0 + ib < w)
        def _trailing():
            # gather the block's pivot rows (in elimination order)
            def gather(t, _):
                p = piv_ref[j0 + t]
                gbuf[pl.ds(t, 1), :] = scratch[pl.ds(p, 1), :]
                return 0

            jax.lax.fori_loop(0, ib, gather, 0, unroll=True)

            # reconstruct the block's U rows on the trailing columns:
            # Ub[t] = G[t] - sum_{t'<t} L11[t,t'] Ub[t'], where
            # L11[t,t'] = G[t, j0+t'] (the pivot rows' stored
            # multipliers). Left-of-trailing columns are zeroed so the
            # compound matmul cannot touch finalized columns.
            tmask = w_ids >= j0 + ib                         # (1, w)
            ubuf[:, :] = jnp.zeros((ib, w), jnp.float32)

            def subst(t, _):
                coeff = gbuf[pl.ds(t, 1), pl.ds(j0, ib)]     # (1, ib)
                coeff = jnp.where(ib_ids < t, coeff,
                                  jnp.zeros_like(coeff))
                row = gbuf[pl.ds(t, 1), :] - jnp.dot(
                    coeff, ubuf[:, :], preferred_element_type=jnp.float32)
                ubuf[pl.ds(t, 1), :] = jnp.where(
                    tmask, row, jnp.zeros_like(row))
                return 0

            jax.lax.fori_loop(0, ib, subst, 0, unroll=True)

            # compound trailing update: rows eliminated at step > j0+t
            # carry their multiplier in Lb column t; everything else 0
            lb = scratch[:, pl.ds(j0, ib)]
            lmask = used[:, :] > (j0 + ib_ids).astype(jnp.float32)
            lb = jnp.where(lmask, lb, jnp.zeros_like(lb))
            scratch[:, :] = scratch[:, :] - jnp.dot(
                lb, ubuf[:, :], preferred_element_type=jnp.float32)

        return 0

    jax.lax.fori_loop(0, nblk, outer, 0)

    cp_out = pltpu.make_async_copy(scratch, out_hbm, sem)
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("ib", "interpret"))
def getrf_panel(a: jax.Array, ib: int = 16, interpret: bool = False):
    """Pivoted LU of an f32 panel (Mt, w) with Mt*w*4 <~ 12 MB (VMEM).

    Returns ``(out, piv)``: ``out`` has rows in their ORIGINAL positions
    (each elected pivot row holds its U row from its pivot column on and
    multipliers before; never-elected rows hold w multipliers), ``piv``
    is the pivot row index per column. ``pallas_getrf`` converts to the
    LAPACK packed layout."""
    Mt, w = a.shape
    assert a.dtype == jnp.float32
    assert w % ib == 0
    kern = functools.partial(_getrf_kernel, ib)
    out, piv = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Mt, w), jnp.float32),
            jax.ShapeDtypeStruct((w,), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Mt, w), jnp.float32),
            pltpu.VMEM((Mt, 1), jnp.float32),
            pltpu.VMEM((ib, w), jnp.float32),
            pltpu.VMEM((ib, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mt * w * w // 2, bytes_accessed=2 * Mt * w * 4,
            transcendentals=0),
    )(a)
    return out, piv


def pallas_getrf(sl: jax.Array, ib: int = 16, interpret: bool = False):
    """LAPACK-packed pivoted LU of a VMEM-sized f32 panel: returns
    ``(packed, lperm)`` with the `_getrf` contract of lapack/lu.py —
    ``packed`` rows in pivoted order (U on/above the diagonal in the
    first w rows, unit-L multipliers below), ``lperm`` the logical ->
    original row map."""
    Mt, w = sl.shape
    out, piv = getrf_panel(sl, ib=ib, interpret=interpret)
    inP = jnp.zeros((Mt,), bool).at[piv].set(True)
    rest = jnp.nonzero(~inP, size=Mt - w, fill_value=Mt - 1)[0]
    lperm = jnp.concatenate([piv, rest.astype(piv.dtype)])
    packed = jnp.take(out, lperm, axis=0, unique_indices=True)
    return packed, lperm
