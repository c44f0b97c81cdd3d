"""Fused Pallas pivoted-panel LU (getrf) kernel.

Reference: src/lapack_like/factor/LU/Panel.hpp:68-158 — the distributed
pivoted panel (per-column MaxLoc + row-swap broadcast). XLA:TPU's own
LuDecompositionBlock custom call charges ~0.56 ns per panel ELEMENT
(PERF.md: (4096,512) 1.18 ms, (8192,512) 2.94 ms), and the invariant
N^2/2 panel area puts a ~150 ms floor under the N=16384 factorization.
This kernel factors the whole chunk out of VMEM instead.

TPU-native design — the panel lives TRANSPOSED in VMEM (tp = A^T of
shape (w, Mt)): panel columns are SUBLANES, original rows are LANES.
Per-column elimination work then runs on (8, Mt) sublane groups (a few
lane-tile passes per column) instead of (Mt, ib) tall slabs (hundreds
of sublane-tile passes) — ~16x fewer VPU cycles per column, and every
slice is statically 8-/128-aligned so Mosaic never sees a sub-tile
dynamic slice:

  * partial pivoting per column is an on-device masked argmax over the
    LANE axis; elected rows (lanes) are MARKED with a per-lane
    ``used`` stamp, never swapped — one gather outside the kernel
    produces the LAPACK packed layout;
  * three-level updates: rank-1 eliminations confined to the current
    8-column sublane group; each finished group updates the rest of
    its 128-column mid-block through an 8-step substitution + k=8
    matmuls; each finished mid-block updates the trailing mid-blocks
    through a 128-step substitution + full k=128 MXU matmuls;
  * the "gather pivot rows" primitive is a one-hot MXU matmul
    (G = T_block @ Oh with Oh[r, t] = (r == p_t)) — no dynamic lane
    indexing anywhere.

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
_MID = 128             # mid-level block = lane width
_SUB = 8               # inner group = f32 sublane tile height
_TRAIL_ROWS = 32       # trailing-update sub-slice (bounds VMEM temporaries)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _inv_unit_upper(M):
    """Inverse of a unit UPPER-triangular (n, n) matrix, n a power of
    two >= 8. Blocked 2x2 partitioned inversion down to an 8-wide
    product-form base: inv([[A, C], [0, B]]) = [[iA, -iA C iB],
    [0, iB]]. The naive product form prod_k (I + (-R)^(2^k)) at n=128
    squares a nilpotent with |entries| <= 1 into ~C(126, 63) ~ 2^120
    magnitudes — catastrophic in f32; the blocked form only ever forms
    entries of the TRUE inverse (growth bounded by the factor's real
    conditioning)."""
    n = M.shape[0]
    if n == _SUB:
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB), 1)
        S = -jnp.where(sub < lane, M, 0.0)
        inv = jnp.eye(_SUB, dtype=jnp.float32) + S
        for _ in range(2):                  # (I+S)(I+S^2)(I+S^4)
            S = _dot(S, S)
            inv = _dot(inv, jnp.eye(_SUB, dtype=jnp.float32) + S)
        return inv
    h = n // 2
    iA = _inv_unit_upper(jax.lax.slice(M, (0, 0), (h, h)))
    iB = _inv_unit_upper(jax.lax.slice(M, (h, h), (n, n)))
    C = jax.lax.slice(M, (0, h), (h, n))
    top = jnp.concatenate([iA, -_dot(_dot(iA, C), iB)], axis=1)
    bot = jnp.concatenate([jnp.zeros((h, h), jnp.float32), iB], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _getrf_kernel(at_hbm, out_hbm, piv_hbm, tp, used, pivrow, sem):
    """tp: (w, Mt) VMEM transposed working copy; used: (1, Mt) per-lane
    elimination-step stamps (+BIG = never elected); pivrow: (1, w) pivot
    lane per column (f32, copied to piv_hbm)."""
    w, Mt = tp.shape
    nmid = w // _MID

    cp_in = pltpu.make_async_copy(at_hbm, tp, sem)
    cp_in.start()
    cp_in.wait()

    used[:, :] = jnp.full((1, Mt), _BIG, jnp.float32)
    pivrow[:, :] = jnp.zeros((1, w), jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, Mt), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB), 1)
    sub128 = jax.lax.broadcasted_iota(jnp.int32, (_MID, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _MID), 1)
    wl = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    for mid in range(nmid):
        m0 = mid * _MID

        def group(g, _):
            j0 = pl.multiple_of(m0 + g * _SUB, _SUB)
            B = tp[pl.ds(j0, _SUB), :]                   # (8, Mt)
            pg = jnp.zeros((1, _SUB), jnp.float32)

            for t in range(_SUB):                        # static unroll
                j = j0 + t
                rmask = sub8 == t                        # (8, 1)
                col = jnp.sum(jnp.where(rmask, B, 0.0), axis=0,
                              keepdims=True)             # (1, Mt)
                st = used[:, :]
                unused = st >= _BIG
                mag = jnp.where(unused, jnp.abs(col), jnp.float32(-1))
                p = jnp.argmax(mag).astype(jnp.int32)    # lane id
                isp = lanes == p
                pivval = jnp.sum(jnp.where(isp, col, 0.0))
                safe = jnp.where(pivval == 0, jnp.float32(1), pivval)
                elim = unused & ~isp
                l = jnp.where(elim, col / safe, 0.0)     # (1, Mt)
                # this column's value at the pivot lane, per group row
                uvals = jnp.sum(jnp.where(isp, B, 0.0), axis=1,
                                keepdims=True)           # (8, 1)
                # rank-1 on the group's later columns; multipliers into
                # row t (pivot/used lanes keep their value)
                Bupd = B - jnp.where(sub8 > t, uvals, 0.0) * l
                B = jnp.where(rmask, jnp.where(elim, l, col), Bupd)
                jf = (j * jnp.ones((), jnp.int32)).astype(jnp.float32)
                used[:, :] = jnp.where(isp, jf, st)
                pf = p.astype(jnp.float32)
                pg = jnp.where(lane8 == t, pf, pg)
                pivrow[:, :] = jnp.where(wl == j, pf, pivrow[:, :])

            tp[pl.ds(j0, _SUB), :] = B

            # ---- group compound update to the rest of the mid-block.
            # U-substitution is a PRODUCT-FORM inverse: the pivot-lane
            # matrix L8[t', t] = B[t', p_t] is nonzero only for t > t'
            # (strictly upper), so R = SU(L8) is nilpotent and
            # inv(I + R) = prod_k (I + (-R)^(2^k)) — log2(8) = 3 small
            # matmuls instead of an 8-step latency-bound substitution.
            Oh = (jax.lax.broadcasted_iota(jnp.int32, (Mt, _SUB), 0)
                  == pg.astype(jnp.int32)).astype(jnp.float32)
            # multipliers of lanes eliminated after each group column
            lmask = used[:, :] > (j0 + sub8).astype(jnp.float32)
            Lg = jnp.where(lmask, B, 0.0)                # (8, Mt)
            L8 = _dot(Lg, Oh)                            # (8, 8)
            R = -jnp.where(sub8 < lane8, L8, 0.0)        # -(strict upper)
            inv8 = jnp.eye(_SUB, dtype=jnp.float32) + R
            for _ in range(2):                           # (I+R)(I+R^2)(I+R^4)
                R = _dot(R, R)
                inv8 = _dot(inv8, jnp.eye(_SUB, dtype=jnp.float32) + R)

            # ONE gather matmul for the whole mid-block's trailing rows
            # (values at the group's pivot lanes), one masked solve, one
            # (128, 8) x (8, Mt) MXU update — replaces the former
            # per-trailing-group loop of K=Mt matmuls with 8x8 outputs.
            Tm = tp[m0:m0 + _MID, :]                     # (128, Mt)
            Gall = _dot(Tm, Oh)                          # (128, 8)
            after = sub128 >= (j0 - m0 + _SUB)           # rows past group
            U = _dot(jnp.where(after, Gall, 0.0), inv8)  # (128, 8)
            tp[m0:m0 + _MID, :] = Tm - _dot(U, Lg)
            return 0

        jax.lax.fori_loop(0, _MID // _SUB, group, 0)

        # ---- mid-level compound update to the trailing mid-blocks:
        # blocked unit-upper inversion at width 128 (a handful of small
        # matmuls, once per mid-block) in place of a 128-step
        # substitution per trailing block. NOT the naive product form —
        # see _inv_unit_upper for why that is catastrophic at this width.
        if mid + 1 < nmid:
            pvm = pivrow[:, m0:m0 + _MID]                # (1, 128)
            Ohm = (jax.lax.broadcasted_iota(jnp.int32, (Mt, _MID), 0)
                   == pvm.astype(jnp.int32)).astype(jnp.float32)
            lmaskM = used[:, :] > (m0 + sub128).astype(jnp.float32)
            Lm = jnp.where(lmaskM, tp[m0:m0 + _MID, :], 0.0)  # (128, Mt)
            L11 = _dot(Lm, Ohm)                          # (128, 128)
            # keep only the strictly-upper coupling; diagonal is unit
            invm = _inv_unit_upper(jnp.where(sub128 < lane128, L11, 0.0))

            for mid2 in range(mid + 1, nmid):            # static
                k0 = mid2 * _MID
                G = _dot(tp[k0:k0 + _MID, :], Ohm)       # (128, 128)
                U = _dot(G, invm)
                # apply in sub-slices to bound VMEM temporaries
                for r0 in range(0, _MID, _TRAIL_ROWS):
                    rows = slice(k0 + r0, k0 + r0 + _TRAIL_ROWS)
                    # static value slice (lax.slice): a dynamic_slice
                    # primitive has no Pallas TPU lowering
                    Usub = jax.lax.slice(
                        U, (r0, 0), (r0 + _TRAIL_ROWS, _MID))
                    tp[rows, :] = tp[rows, :] - _dot(Usub, Lm)

    cp_out = pltpu.make_async_copy(tp, out_hbm, sem)
    cp_out.start()
    cp_piv = pltpu.make_async_copy(pivrow, piv_hbm, sem)
    cp_piv.start()
    cp_out.wait()
    cp_piv.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def getrf_panel(a: jax.Array, interpret: bool = False):
    """Pivoted LU of an f32 panel (Mt, w) with Mt*w*4 <= 8 MB (VMEM:
    the transposed working copy + mid-level temporaries must fit the
    16 MB scoped limit; Mt % 128 == 0, w % 128 == 0).

    Returns ``(out, piv)``: ``out`` has rows in their ORIGINAL positions
    (each elected pivot row holds its U row from its pivot column on and
    multipliers before; never-elected rows hold w multipliers), ``piv``
    is the pivot row index per column. ``pallas_getrf`` converts to the
    LAPACK packed layout."""
    Mt, w = a.shape
    assert a.dtype == jnp.float32
    assert w % _MID == 0 and Mt % _MID == 0
    outT, pivf = pl.pallas_call(
        _getrf_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((w, Mt), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((w, Mt), jnp.float32),
            pltpu.VMEM((1, Mt), jnp.float32),
            pltpu.VMEM((1, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        # the transposed working copy (Mt*w*4 <= 8 MB) + the mid-level
        # one-hot/L/G temporaries exceed the 16 MB default scoped-VMEM
        # budget (~23 MB at (4096, 512)); v5e has 128 MB physical VMEM
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mt * w * w // 2, bytes_accessed=2 * Mt * w * 4,
            transcendentals=0),
    )(a.T)
    return outT.T, pivf[0].astype(jnp.int32)


def pallas_getrf(sl: jax.Array, interpret: bool = False):
    """LAPACK-packed pivoted LU of a VMEM-sized f32 panel: returns
    ``(packed, lperm)`` with the `_getrf` contract of lapack/lu.py —
    ``packed`` rows in pivoted order (U on/above the diagonal in the
    first w rows, unit-L multipliers below), ``lperm`` the logical ->
    original row map."""
    Mt, w = sl.shape
    out, piv = getrf_panel(sl, interpret=interpret)
    inP = jnp.zeros((Mt,), bool).at[piv].set(True)
    rest = jnp.nonzero(~inP, size=Mt - w, fill_value=Mt - 1)[0]
    lperm = jnp.concatenate([piv, rest.astype(piv.dtype)])
    packed = jnp.take(out, lperm, axis=0, unique_indices=True)
    return packed, lperm
