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

            # ---- group compound update to the rest of the mid-block
            Oh = (jax.lax.broadcasted_iota(jnp.int32, (Mt, _SUB), 0)
                  == pg.astype(jnp.int32)).astype(jnp.float32)
            # multipliers of lanes eliminated after each group column
            lmask = used[:, :] > (j0 + sub8).astype(jnp.float32)
            Lg = jnp.where(lmask, B, 0.0)                # (8, Mt)
            # L8[t', t] = B[t', p_t] (pivot rows' stored multipliers)
            L8 = _dot(Lg, Oh)                            # (8, 8)

            def g2body(g2, _):
                k0 = pl.multiple_of(m0 + g2 * _SUB, _SUB)
                Ts = tp[pl.ds(k0, _SUB), :]              # (8, Mt)
                G2 = _dot(Ts, Oh)                        # (8, 8)
                # U[c, t] = G2[c, t] - sum_{t'<t} L8[t', t] U[c, t']
                U = jnp.zeros((_SUB, _SUB), jnp.float32)
                for t in range(_SUB):                    # static unroll
                    lt = lane8 == t
                    cvec = jnp.sum(jnp.where(lt, L8, 0.0), axis=1,
                                   keepdims=True)        # (8,1) L8[:,t]
                    cvec = jnp.where(sub8 < t, cvec, 0.0)
                    gcol = jnp.sum(jnp.where(lt, G2, 0.0), axis=1,
                                   keepdims=True)        # (8, 1)
                    ucol = gcol - _dot(U, cvec)          # (8, 1)
                    U = jnp.where(lt, ucol, U)
                tp[pl.ds(k0, _SUB), :] = Ts - _dot(U, Lg)
                return 0

            jax.lax.fori_loop(g + 1, _MID // _SUB, g2body, 0)
            return 0

        jax.lax.fori_loop(0, _MID // _SUB, group, 0)

        # ---- mid-level compound update to the trailing mid-blocks
        if mid + 1 < nmid:
            pvm = pivrow[:, m0:m0 + _MID]                # (1, 128)
            Ohm = (jax.lax.broadcasted_iota(jnp.int32, (Mt, _MID), 0)
                   == pvm.astype(jnp.int32)).astype(jnp.float32)
            lmaskM = used[:, :] > (m0 + sub128).astype(jnp.float32)
            Lm = jnp.where(lmaskM, tp[m0:m0 + _MID, :], 0.0)  # (128, Mt)
            L11 = _dot(Lm, Ohm)                          # (128, 128)

            for mid2 in range(mid + 1, nmid):            # static
                k0 = mid2 * _MID
                G = _dot(tp[k0:k0 + _MID, :], Ohm)       # (128, 128)

                def subst(t, U):
                    lt = lane128 == t
                    cvec = jnp.sum(jnp.where(lt, L11, 0.0), axis=1,
                                   keepdims=True)        # (128, 1)
                    cvec = jnp.where(sub128 < t, cvec, 0.0)
                    gcol = jnp.sum(jnp.where(lt, G, 0.0), axis=1,
                                   keepdims=True)
                    ucol = gcol - _dot(U, cvec)
                    return jnp.where(lt, ucol, U)

                U = jax.lax.fori_loop(
                    0, _MID, subst, jnp.zeros((_MID, _MID), jnp.float32))
                # apply in sub-slices to bound VMEM temporaries
                for r0 in range(0, _MID, _TRAIL_ROWS):
                    rows = slice(k0 + r0, k0 + r0 + _TRAIL_ROWS)
                    Usub = jax.lax.dynamic_slice(
                        U, (r0, 0), (_TRAIL_ROWS, _MID))
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
            vmem_limit_bytes=64 * 1024 * 1024),
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
