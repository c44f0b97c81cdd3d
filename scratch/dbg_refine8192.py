"""Instrument the 8192 refinement stall: band structure of the
projected couplings |qtr| before/after the windowed-RR sweeps.

Run: python -u scratch/dbg_refine8192.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER
from elementalx.lapack.hermitian_eig import HermitianEig
from elementalx.lapack import refine_device as RD


@jax.jit
def band_stats(qtr, lam):
    n = qtr.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = jnp.abs(i - j)
    a = jnp.abs(qtr)
    outs = []
    for lo, hi in ((1, 4), (5, 16), (17, 64), (65, 256), (257, 1024),
                   (1025, 1 << 30)):
        m = (d >= lo) & (d <= hi)
        outs.append(jnp.max(jnp.where(m, a, 0.0)))
    gapmin = jnp.min(jnp.diff(lam))
    return jnp.stack(outs), gapmin


def show(tag, qtr, lam, scale):
    s, gmin = band_stats(qtr, lam)
    s = np.asarray(s) / scale
    print(f"{tag}: bands(1-4,5-16,17-64,65-256,257-1k,>1k)/scale = "
          + " ".join(f"{x:.2e}" for x in s)
          + f"  min gap/scale {float(gmin)/scale:.2e}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(3)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    grid = El.Grid(devices=jax.devices())
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    w, Q = HermitianEig(LOWER, A, vectors=True)
    float(jnp.sum(w))
    a_hi = jnp.asarray(a)
    a_lo = jnp.zeros_like(a_hi)
    v0 = Q.data[:n, :n].astype(jnp.float32)
    w32 = jnp.asarray(w, jnp.float32)[:n]
    del Q
    vh, vl, lam_h, lam_l, scale = RD._refine_setup(v0, w32)
    del v0
    scale_f = float(scale)
    vh, vl = RD._newton_jit(vh, vl)
    vh, vl = RD._newton_jit(vh, vl)
    avh, avl = RD._av_jit(a_hi, a_lo, vh, vl)
    lam_h, lam_l, qtr, resid = RD._post_jit(vh, vl, avh, avl)
    del avh, avl
    print(f"entry resid/scale {float(resid)/scale_f:.2e}", flush=True)
    show("pre-RR ", qtr, lam_h, scale_f)
    for sweep, off in ((0, 0), (1, 128)):
        vh, vl, lam_h = RD._rr_rot_jit(vh, vl, lam_h, qtr, off=off,
                                       rr_b=256)
        vh, vl = RD._newton_jit(vh, vl)
        avh, avl = RD._av_jit(a_hi, a_lo, vh, vl)
        lam_h, lam_l, qtr, resid = RD._post_jit(vh, vl, avh, avl)
        del avh, avl
        print(f"post-RR{sweep} resid/scale {float(resid)/scale_f:.2e}",
              flush=True)
        show(f"post-RR{sweep}", qtr, lam_h, scale_f)
    # one guarded-correction sweep
    vh, vl = RD._corr_jit(vh, vl, lam_h, qtr, scale, phase_idx=0)
    vh, vl = RD._newton_jit(vh, vl)
    avh, avl = RD._av_jit(a_hi, a_lo, vh, vl)
    lam_h, lam_l, qtr, resid = RD._post_jit(vh, vl, avh, avl)
    print(f"post-corr resid/scale {float(resid)/scale_f:.2e}", flush=True)
    show("post-corr", qtr, lam_h, scale_f)


if __name__ == "__main__":
    main()
