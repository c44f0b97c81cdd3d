"""Pallas band->tridiagonal bulge-chase mega-kernel (SBR stage 2).

Reference: the band-to-tridiagonal role of
src/lapack_like/condense/HermitianTridiag.cpp (whose one-stage panel
algorithm the two-stage scheme replaces; see lapack/sbr.py).

The whole chase runs in ONE pallas_call with the band resident in VMEM
(~41 MB at n=8192, b=256, vs ~275 GB of HBM streaming if each sweep
re-read the band). Persistent store DS: block-aligned dense lower rows,
kept PRE-SHIFTED for the next sweep:

    after sweep j retires, DS[2b + r, l] = A[r, cb_{j+1}(r) + l]
    with  cb_{j'}(r) = j'+1 + ((r - j' - 1)//b - 2) * b,  l in [0, 4b)

Because consecutive sweeps' alignments differ by exactly one column,
the retire can write that shift as a STATIC slice (+1 lane for all
rows, +1-b for each block's first row, which becomes the last row of
the next sweep's block above) — so NO dynamic lane rotation exists
anywhere: arrivals are pure aligned loads. (A previous revision
converted through a skewed store with per-op dynamic rotations; those
were 87%% of the kernel's runtime — measured split in PERF.md.)

Per sweep j, the active diagonal neighborhood lives in an 8x8 ring of
(b x b) strip blocks:

  row block k  <-> abs rows [j+1 + (k-2)*b, +b)  at strip rows  (k%8)*b
  lane block k <-> abs cols [j+1 + (k-2)*b, +b)  at strip lanes (k%8)*b

The chase loop is unrolled 8-fold, so every ring slot is STATIC in the
body (s = 8m+u => slot (u+c)%8). Op s (window rows W = [r0, r0+b),
r0 = j+1+s*b) uses
  L1 = (row k=s+2, lane s+1)    x = L1 lane 0 (s>=1) / lane b-1 (s=0)
  S  = (row s+2, lane s+2)      symmetric dense (symmetrized at arrival)
  B  = (row s+3, lane s+2)      the bulge block
The "L0" block (cols [r0-2b, r0-b)) is identically ZERO at op time
(proved in scratch/proto_sbr.py instrumentation) and is neither stored
nor updated. Updates are rank-1 broadcast outer products (faster than
K=1 MXU matmuls, scratch/mb_chase.py); Householder division/rsqrt get
one Newton step each (the TPU's approximate transcendentals otherwise
amplify to 1e-3-grade drift over the n^2/(2b) sequential chase).

Outputs: vout[j, s] = [tau | v[1:]] (v[0] == 1 implicit), double-
buffered per sweep and DMA'd to HBM; de[j] = [e_j, d_{j+1}] emitted by
each sweep's s=0 op (whose window pivot/S[0,0] finalize exactly those
tridiagonal entries). Padded windows beyond the matrix produce tau = 0
(identity) so no edge clipping exists anywhere; op order and outputs
are validated against lapack/sbr._sb2tr_dense.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sb2tr_kernel(ds, ds_out, vout_hbm, de_out, strip, vsweep, sems,
                  *, n, b, smax, sync_vout=True, no_vout=False):
    SYNC_VOUT = sync_vout
    NO_VOUT = no_vout  # debug: skip the reflector DMA entirely
    # ds is aliased onto ds_out (input_output_aliases): one VMEM buffer

    lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    sub_b = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    sub_b8 = jax.lax.broadcasted_iota(jnp.int32, (b + 8, 1), 0)
    sub_g = jax.lax.broadcasted_iota(jnp.int32, (b, 4 * b), 0)
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (b, 4 * b), 1)
    lane_128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    diag_mask = (jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (b, b), 1))

    def _load_slab(base):
        """ds_out rows [base, base+b) (8-aligned slab + sublane roll)."""
        off = jax.lax.rem(base, 8)
        a8 = pl.multiple_of(base - off, 8)
        s8 = ds_out[pl.ds(a8, b + 8), :]
        rolled = pltpu.roll(s8, (b + 8) - off, 0)
        return rolled[:b, :]

    def _store_slab(base, val):
        """Masked RMW of ds_out rows [base, base+b)."""
        off = jax.lax.rem(base, 8)
        a8 = pl.multiple_of(base - off, 8)
        s8 = ds_out[pl.ds(a8, b + 8), :]
        vp = jnp.concatenate(
            [val, jnp.zeros((8, 4 * b), jnp.float32)], axis=0)
        rolled = pltpu.roll(vp, off, 0)
        mask = (sub_b8 >= off) & (sub_b8 < off + b)
        ds_out[pl.ds(a8, b + 8), :] = jnp.where(mask, rolled, s8)

    def arrival(j, k, slot):
        """Load row block k (abs rows [j+1+(k-2)b, +b)) into the strip:
        lane slot k-1 (dense lower) + symmetrized diag at slot k. The
        store is pre-shifted for this sweep, so this is a PURE aligned
        load; the L0 lane slot (k-2) is identically zero and skipped."""
        dense4 = _load_slab(j + 1 + k * b)        # DS row = abs + 2b
        rs = (slot % 8) * b
        strip[pl.ds(rs, b), pl.ds(((slot - 1) % 8) * b, b)] = \
            dense4[:, b:2 * b]
        dl = dense4[:, 2 * b:3 * b]
        dfull = dl + jnp.transpose(dl) - jnp.where(diag_mask, dl, 0.0)
        strip[pl.ds(rs, b), pl.ds((slot % 8) * b, b)] = dfull

    def retire(j, k, slot):
        """Write row block k's lower band back, PRE-SHIFTED for sweep
        j+1 (static +1 lane; the block's first row shifts +1-b, being
        the last row of the next sweep's block above). One triangular
        mask enforces both the dense-lower cut and the store's
        zero-upper invariant (identical conditions)."""
        rs = (slot % 8) * b
        g = jnp.concatenate(
            [jnp.zeros((b, b), jnp.float32),      # L0 region: zero
             strip[pl.ds(rs, b), pl.ds(((slot - 1) % 8) * b, b)],
             strip[pl.ds(rs, b), pl.ds((slot % 8) * b, b)],
             jnp.zeros((b, b), jnp.float32)], axis=1)
        val_a = jnp.concatenate(
            [g[:, 1:], jnp.zeros((b, 1), jnp.float32)], axis=1)
        val_b = jnp.concatenate(
            [jnp.zeros((b, b - 1), jnp.float32), g[:, :3 * b + 1]],
            axis=1)
        val = jnp.where(sub_g == 0, val_b, val_a)
        # (bool-valued where is unsupported in Mosaic — use logic ops)
        keep = ((sub_g == 0) & (lane_g <= 3 * b - 1)) \
            | ((sub_g > 0) & (lane_g <= 2 * b + sub_g - 1))
        _store_slab(j + 1 + k * b, jnp.where(keep, val, 0.0))

    def op(j, s, u, bufoff):
        """One chase op at unroll position u (ring slots static)."""
        rs2 = ((u + 2) % 8) * b
        rs3 = ((u + 3) % 8) * b
        ls1 = ((u + 1) % 8) * b
        ls2 = ((u + 2) % 8) * b

        L1 = strip[pl.ds(rs2, b), pl.ds(ls1, b)]
        # x: elimination column — L1 lane 0 for s >= 1, lane b-1 at s=0
        x1 = L1[:, 0:1]
        x0 = L1[:, b - 1:b]
        is0 = s == 0
        xc = jnp.where(is0, x0, x1)
        # Householder (padded semantics: zero tail -> identity);
        # Newton-corrected rsqrt/reciprocal — the TPU's approximate
        # transcendentals otherwise leave ~1e-5/op reflector error
        alpha = jnp.sum(jnp.where(sub_b == 0, xc, 0.0))
        tail = jnp.where(sub_b > 0, xc, 0.0)
        sigma2 = jnp.sum(tail * tail)
        t2 = alpha * alpha + sigma2
        tsafe = jnp.where(t2 == 0, jnp.float32(1), t2)
        rq = jax.lax.rsqrt(tsafe)
        rq = rq * (1.5 - 0.5 * tsafe * rq * rq)
        rq = rq * (1.5 - 0.5 * tsafe * rq * rq)
        norm = jnp.where(t2 == 0, jnp.float32(0), tsafe * rq)
        sgn = jnp.where(alpha < 0, jnp.float32(-1), jnp.float32(1))
        beta0 = -sgn * norm
        trivial = sigma2 == 0
        denom = jnp.where(trivial, jnp.float32(1), alpha - beta0)
        rd = 1.0 / denom
        rd = rd * (2.0 - denom * rd)
        vc = jnp.where(sub_b > 0, tail * rd, jnp.float32(1))
        vc = jnp.where(trivial & (sub_b > 0), jnp.float32(0), vc)
        bden = jnp.where(beta0 == 0, jnp.float32(1), beta0)
        rb_ = 1.0 / bden
        rb_ = rb_ * (2.0 - bden * rb_)
        tau = jnp.where(trivial, jnp.float32(0), (beta0 - alpha) * rb_)
        beta = jnp.where(trivial, alpha, beta0)
        vr = jnp.transpose(vc)                                   # (1,b)

        S = strip[pl.ds(rs2, b), pl.ds(ls2, b)]
        Bb = strip[pl.ds(rs3, b), pl.ds(ls2, b)]
        # matvecs as VPU broadcast+reduce (exact f32 multiplies)
        u_col = jnp.sum(S * vr, axis=1, keepdims=True)
        u_row = jnp.sum(S * vc, axis=0, keepdims=True)
        y1 = jnp.sum(L1 * vc, axis=0, keepdims=True)
        z_col = jnp.sum(Bb * vr, axis=1, keepdims=True)
        vtu = jnp.sum(vc * u_col)
        coef = tau * 0.5 * vtu
        w_col = tau * (u_col - coef * vc)
        w_row = tau * (u_row - coef * vr)
        Snew = S - vc * w_row - w_col * vr
        strip[pl.ds(rs2, b), pl.ds(ls2, b)] = Snew
        newx = jnp.where(sub_b == 0, beta, jnp.float32(0))       # (b,1)
        L1n = L1 - (tau * vc) * y1
        xlane = jnp.where(is0, b - 1, 0)
        L1n = jnp.where(lane_b == xlane, newx, L1n)
        strip[pl.ds(rs2, b), pl.ds(ls1, b)] = L1n
        strip[pl.ds(rs3, b), pl.ds(ls2, b)] = Bb - (tau * z_col) * vr
        # reflector record: [tau | v[1:]]
        rec = jnp.where(lane_b == 0, tau, vr)
        vsweep[pl.ds(bufoff + s, 1)] = rec[None]

        # s=0 finalizes e[j] (the window pivot beta) and d[j+1]
        # (S[0,0] after this update — nothing later touches it)
        @pl.when(is0)
        def _():
            s00 = jnp.sum(jnp.where(lane_b == 0, Snew[0:1, :], 0.0))
            de = jnp.where(lane_128 == 0, beta,
                           jnp.where(lane_128 == 1, s00, 0.0))
            de_out[pl.ds(j, 1)] = de[None]

    def vcopy(j, bufoff):
        return pltpu.make_async_copy(
            vsweep.at[pl.ds(bufoff, smax)],
            vout_hbm.at[j], sems.at[jax.lax.rem(j, 2)])

    def sweep_body(j, carry):
        bufoff = jax.lax.rem(j, 2) * smax

        if not SYNC_VOUT:
            @pl.when(j >= 2)
            def _():
                vcopy(j - 2, bufoff).wait()

        vsweep[pl.ds(bufoff, smax)] = jnp.zeros((smax, 1, b),
                                                jnp.float32)
        arrival(j, 2, 2)
        arrival(j, 3, 3)
        # sj = number of real ops; run retires to sj+3 on static slots
        sj = jnp.maximum(1, (n - 2 - j + b - 1) // b + 1)
        sj = jnp.minimum(sj, smax)
        trips = (sj + 3 + 7) // 8

        def chunk(m, _):
            s0 = m * 8
            for uu in range(8):
                s = s0 + uu

                @pl.when(s < sj)
                def _():
                    op(j, s, uu, bufoff)

                # op s+1's bulge lives in row block s+4
                @pl.when(s + 1 < sj)
                def _():
                    arrival(j, s + 4, uu + 4)

                @pl.when((s >= 2) & (s < sj + 3))
                def _():
                    retire(j, s, uu)
            return 0

        jax.lax.fori_loop(0, trips, chunk, 0)
        if NO_VOUT:
            return 0
        cp = vcopy(j, bufoff)
        cp.start()
        if SYNC_VOUT:
            # synchronous per-sweep drain: the overlapped double-buffered
            # scheme nondeterministically corrupts the CHASE STATE at
            # sizes where vout spills to HBM (n >= 4096 at b=256: de/DS
            # differ run-to-run on identical input, scratch/
            # dbg_sb2tr_det.py) — an in-flight VMEM->HBM copy racing
            # compute. ~24 KB/sweep, so the exposed DMA latency is small
            # against the sweep's chase work.
            cp.wait()
        return 0

    # scratch hygiene: the strip MUST start zeroed — sweep 0's ops read
    # ring slots whose blocks lie beyond the band (trivial-guard windows
    # expect zeros); uninitialized VMEM leaks the PREVIOUS invocation's
    # state (measured: identical corruption sequences across process
    # restarts at n=4096, scratch/dbg_sb2tr_det.py)
    strip[...] = jnp.zeros((8 * b, 8 * b), jnp.float32)
    jax.lax.fori_loop(0, n, sweep_body, 0)
    if not SYNC_VOUT and not NO_VOUT:
        # drain the last two reflector copies
        vcopy(n - 2, jax.lax.rem(n - 2, 2) * smax).wait()
        vcopy(n - 1, jax.lax.rem(n - 1, 2) * smax).wait()


@functools.partial(jax.jit,
                   static_argnames=("n", "b", "interpret", "sync_vout",
                                    "no_vout"))
def sb2tr(ds: jax.Array, n: int, b: int, interpret: bool = False,
          sync_vout: bool = True, no_vout: bool = False):
    """Band->tridiag chase. ``ds``: block-aligned dense lower store
    from lapack/sbr._band_to_ds (rows = 2b top margin + n + 6b bottom
    margin, lanes 4b; sweep-0-ready pre-shifted alignment; aliased
    in-place through the kernel). Returns (vout (n, smax, b), de
    (n, 128)) with vout[j, s] = [tau | v[1:]], de[j] = [e_j, d_{j+1}].
    Requires b %% 128 == 0."""
    from ..lapack.sbr import chase_smax

    assert b % 128 == 0
    smax = chase_smax(n, b)
    assert ds.shape == (n + 8 * b, 4 * b), ds.shape
    kern = functools.partial(_sb2tr_kernel, n=n, b=b, smax=smax,
                             sync_vout=sync_vout, no_vout=no_vout)
    _, vout, de = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(ds.shape, jnp.float32),
                   jax.ShapeDtypeStruct((n, smax, 1, b), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, 128), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((8 * b, 8 * b), jnp.float32),     # strip
            pltpu.VMEM((2 * smax, 1, b), jnp.float32),   # vsweep x2
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * n * b, bytes_accessed=4 * n * smax * b,
            transcendentals=n * n // b),
    )(ds)
    return vout.reshape(n, smax, b), de.reshape(n, 128)
