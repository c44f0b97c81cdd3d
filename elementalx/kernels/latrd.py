"""Panel-fused Pallas latrd: the Hermitian-tridiagonalization panel with
lower-triangle-only symv streaming.

Reference: src/lapack_like/condense/HermitianTridiag/LPan.hpp — the
latrd-style panel whose per-column Hermitian matvec is the reduction's
HBM roofline (PERF.md: 955 ms of the 1.38 s HermitianEig 8192 is the
tridiag stage, ~n^3/3 * 4 B of symv traffic at ~the chip's bandwidth).

A symmetric matrix only needs its LOWER triangle read: streaming tril
tiles halves the dominant traffic (n^3/6 * 4 B). kernels/symv.py proved
the arithmetic but lost 2.4x at per-column grain (~8k pallas_call
launches); this kernel runs the WHOLE PANEL (nb sequential columns:
correction, Householder, symv, W-column) in ONE pallas_call, so the
launch cost amortizes over nb columns and the tile stream is double-
buffered manual DMA.

Memory-layout design (everything dynamic-index-friendly, NO lane-axis
dynamic slicing and NO relayouts):
  * the matrix stays in HBM (ANY); tril tiles (TS, TS) stream through a
    2-slot VMEM double buffer;
  * every length-M vector lives as (S, 1, TS) with the SEGMENT as the
    leading (untiled) dimension — segment reads/writes are dynamic
    leading-dim indexing;
  * the V/W panels live TRANSPOSED per segment: (S, nb, TS) — a panel
    row extraction is a masked lane reduction, panel matvecs are
    dot_generals against the (nb, TS) blocks, and column writes are
    dynamic SUBLANE stores;
  * the kernel works in the GLOBAL frame with a scalar k0: one kernel
    shape serves every panel of the reduction (junk lanes in
    [k0_rounded, k0) are annihilated by v's zeros and masked outputs).

f32, real symmetric, no padding (the driver gates; complex and padded
cases keep the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dotg(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _latrd_kernel(scal, a_hbm, P3, W3, tau_out,
                  V3, acur, vv3, y3, bufs, arow8, sems, rsems, *, S, nb, TS):
    k0 = scal[0]
    w = scal[1]
    s0 = k0 // TS

    P3[...] = jnp.zeros((S, nb, TS), jnp.float32)
    W3[...] = jnp.zeros((S, nb, TS), jnp.float32)
    V3[...] = jnp.zeros((S, nb, TS), jnp.float32)
    tau_out[...] = jnp.zeros((1, nb), jnp.float32)

    seg3 = jax.lax.broadcasted_iota(jnp.int32, (S, 1, TS), 0)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (S, 1, TS), 2)
    gidx = seg3 * TS + lane3                       # global index per slot
    lane_nbTS = jax.lax.broadcasted_iota(jnp.int32, (nb, TS), 1)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    rT = jax.lax.broadcasted_iota(jnp.int32, (TS, TS), 0)
    cT = jax.lax.broadcasted_iota(jnp.int32, (TS, TS), 1)

    def col_body(jl, _):
        gj = k0 + jl
        gp = gj + 1
        sg = gj // TS
        lg = gj - sg * TS

        # ---- frozen column gj (= row gj by symmetry): segment DMAs.
        # Mosaic requires HBM slices sublane-aligned (8), so stream the
        # 8-row slab containing gj and pick the row by masked reduction.
        # All segment DMAs start before any waits (per-sem pipelining).
        gj8 = (gj // 8) * 8
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, TS), 0)

        def row_cp(s):
            return pltpu.make_async_copy(
                a_hbm.at[pl.ds(gj8, 8), pl.ds(s * TS, TS)],
                arow8.at[s], rsems.at[s])

        def row_start(s, _):
            row_cp(s).start()
            return 0

        def row_wait(s, _):
            row_cp(s).wait()
            acur[s] = jnp.sum(
                jnp.where(sub8 == gj - gj8, arow8[s], 0.0),
                axis=0, keepdims=True)
            return 0
        jax.lax.fori_loop(s0, S, row_start, 0)
        jax.lax.fori_loop(s0, S, row_wait, 0)

        # ---- corrections: acur -= V wrow^T + W vrow^T (row gj of W/V
        # panels via masked lane reduction; columns >= jl are still zero
        # so no column masking is needed)
        lmask = lane_nbTS == lg
        wrow = jnp.sum(jnp.where(lmask, W3[sg], 0.0), axis=1,
                       keepdims=True)              # (nb, 1)
        vrow = jnp.sum(jnp.where(lmask, V3[sg], 0.0), axis=1,
                       keepdims=True)

        def corr_body(s, _):
            c1 = _dotg(wrow, V3[s], ((0,), (0,)))  # (1, TS)
            c2 = _dotg(vrow, W3[s], ((0,), (0,)))
            acur[s] = acur[s] - (c1 + c2)
            return 0
        jax.lax.fori_loop(s0, S, corr_body, 0)

        # ---- Householder (reflect.householder semantics, real)
        below = gidx > gp
        ac = acur[...]
        alpha = jnp.sum(jnp.where(gidx == gp, ac, 0.0))
        xb = jnp.where(below, ac, 0.0)
        sigma2 = jnp.sum(xb * xb)
        norm = jnp.sqrt(alpha * alpha + sigma2)
        sgn = jnp.where(alpha < 0, jnp.float32(-1), jnp.float32(1))
        beta = -sgn * norm
        trivial = sigma2 == 0
        denom = jnp.where(trivial, jnp.float32(1), alpha - beta)
        v = jnp.where(below, xb / denom, jnp.zeros_like(xb))
        v = jnp.where(gidx == gp, jnp.float32(1), v)
        tj = jnp.where(trivial, jnp.float32(0),
                       (beta - alpha) / jnp.where(beta == 0, 1.0, beta))
        beta = jnp.where(trivial, alpha, beta)
        vv3[...] = v

        # ---- symv y = A_trailing v, streaming ONLY tril tiles (i >= jb)
        y3[...] = jnp.zeros((S, 1, TS), jnp.float32)
        nseg = S - s0
        T = nseg * (nseg + 1) // 2

        def tile_copy(i, jb, slot):
            return pltpu.make_async_copy(
                a_hbm.at[pl.ds(i * TS, TS), pl.ds(jb * TS, TS)],
                bufs.at[slot], sems.at[slot])

        tile_copy(s0, s0, 0).start()

        def tile_body(t, carry):
            i, jb = carry
            nx_i = jnp.where(i + 1 < S, i + 1, jb + 1)
            nx_jb = jnp.where(i + 1 < S, jb, jb + 1)
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < T)
            def _():
                tile_copy(nx_i, nx_jb, 1 - slot).start()

            tile_copy(i, jb, slot).wait()
            diag = i == jb

            # y[i rows] += tril(tile) @ v[jb]; y[jb cols] += tile^T v[i].
            # Only diagonal tiles need the triangle masks — guarding with
            # pl.when keeps the two full-tile VPU selects off the ~S/2x
            # more numerous off-diagonal tiles.
            @pl.when(diag)
            def _():
                tile = bufs[slot]
                t1 = jnp.where(rT < cT, 0.0, tile)
                t2 = jnp.where(rT <= cT, 0.0, tile)
                y3[i] = y3[i] + _dotg(vv3[jb], t1, ((1,), (1,)))
                y3[jb] = y3[jb] + _dotg(vv3[i], t2, ((1,), (0,)))

            @pl.when(jnp.logical_not(diag))
            def _():
                tile = bufs[slot]
                y3[i] = y3[i] + _dotg(vv3[jb], tile, ((1,), (1,)))
                y3[jb] = y3[jb] + _dotg(vv3[i], tile, ((1,), (0,)))
            return nx_i, nx_jb

        jax.lax.fori_loop(0, T, tile_body, (s0, s0))

        # ---- w-column: p = tau (Av - V (W^T v) - W (V^T v));
        #      w = p - (tau/2 (v^T p)) v
        wv = jnp.zeros((nb, 1), jnp.float32)
        vv = jnp.zeros((nb, 1), jnp.float32)

        def dots_body(s, carry):
            wv, vv = carry
            wv = wv + _dotg(W3[s], vv3[s], ((1,), (1,)))
            vv = vv + _dotg(V3[s], vv3[s], ((1,), (1,)))
            return wv, vv
        wv, vv = jax.lax.fori_loop(s0, S, dots_body, (wv, vv))

        vp = jnp.zeros((), jnp.float32)

        def p_body(s, vp):
            ps = tj * (y3[s] - _dotg(wv, V3[s], ((0,), (0,)))
                       - _dotg(vv, W3[s], ((0,), (0,))))
            y3[s] = ps                             # reuse y3 as p
            return vp + jnp.sum(vv3[s] * ps)
        vp = jax.lax.fori_loop(s0, S, p_body, vp)

        coef = tj * 0.5 * vp

        # ---- stores: V/W columns (dynamic sublane), P column, tau
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)

        def store_body(s, _):
            g_s = s * TS + lane2                   # (1, TS) global idx
            V3[s, pl.ds(jl, 1), :] = vv3[s]
            W3[s, pl.ds(jl, 1), :] = y3[s] - coef * vv3[s]
            newc = jnp.where(g_s > gp, vv3[s], acur[s])
            newc = jnp.where(g_s == gp, beta, newc)
            P3[s, pl.ds(jl, 1), :] = newc
            return 0
        jax.lax.fori_loop(s0, S, store_body, 0)
        tau_out[...] = jnp.where(lane_w == jl, tj, tau_out[...])
        return 0

    jax.lax.fori_loop(0, w, col_body, 0)


@functools.partial(jax.jit, static_argnames=("nb", "ts", "interpret"))
def latrd_panel(a: jax.Array, k0, w, nb: int = 128, ts: int = 1024,
                interpret: bool = False):
    """One latrd panel on the trailing block of the GLOBAL (M, M) f32
    symmetric array ``a`` (lower triangle authoritative on the trailing
    block), columns [k0, k0+w), w <= nb. Returns ``(P, W, tau)``:
    ``P`` (M, nb) the finalized panel columns in latrd layout (diagonal
    value at row k0+j, beta at the subdiagonal, reflector below; rows
    < k0 are junk), ``W`` (M, nb) the rank-2 update vectors (rows < k0
    junk), ``tau`` (nb,) the reflector scalars."""
    M = a.shape[0]
    assert a.dtype == jnp.float32 and M % ts == 0
    S = M // ts
    scal = jnp.asarray(jnp.stack([jnp.asarray(k0, jnp.int32),
                                  jnp.asarray(w, jnp.int32)]))
    kern = functools.partial(_latrd_kernel, S=S, nb=nb, TS=ts)
    P3, W3, tau = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, nb, ts), jnp.float32),
            jax.ShapeDtypeStruct((S, nb, ts), jnp.float32),
            jax.ShapeDtypeStruct((1, nb), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, nb, ts), jnp.float32),   # V panel
            pltpu.VMEM((S, 1, ts), jnp.float32),    # acur
            pltpu.VMEM((S, 1, ts), jnp.float32),    # v
            pltpu.VMEM((S, 1, ts), jnp.float32),    # y / p
            pltpu.VMEM((2, ts, ts), jnp.float32),   # tile double buffer
            pltpu.VMEM((S, 8, ts), jnp.float32),    # 8-row slab for acur
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((S,)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * M * nb, bytes_accessed=nb * M * M * 2,
            transcendentals=0),
    )(scal, a)
    P = P3.transpose(0, 2, 1).reshape(M, nb)
    W = W3.transpose(0, 2, 1).reshape(M, nb)
    return P, W, tau[0]
