"""On-chip measurement of the device-resident refined eigensolver
(lapack/refine_device.py) at scale — VERDICT r3 item 3 evidence.

Reads back ONLY scalars (the tunnel's large readbacks are slow and
block_until_ready does not block): resid/ortho/scale come out of the
jitted core as device scalars.

Run from repo root:  python scratch/refine_onchip.py [n ...]
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


def run(n, iters=6):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    grid = El.Grid(devices=jax.devices())
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)

    t0 = time.perf_counter()
    w, Q = HermitianEig(LOWER, A, vectors=True)
    # force completion with a scalar readback
    s_eig = float(jnp.sum(w) + jnp.sum(Q.data[0, :8]))
    t1 = time.perf_counter()

    a_hi = jnp.asarray(a)
    a_lo = jnp.zeros_like(a_hi)
    # device-resident slice: Q.global_array() would pull the (n, n)
    # basis to host and re-upload (~64 MB each way at n=4096 over the
    # tunnel) — ADVICE r3
    v0 = Q.data[:n, :n].astype(jnp.float32)
    w32 = jnp.asarray(w, jnp.float32)[:n]
    del Q
    # warm the refine compile separately from the timed run
    t2 = time.perf_counter()
    hist = []
    vh, vl, lam_h, lam_l, resid, ortho, scale = RD._refine_device(
        a_hi, a_lo, v0, w32, iters=iters, history=hist)
    rel = float(resid) / float(scale)
    orel = float(ortho)
    # free run-1's (n, n) results before run 2 — at n=8192 the chip
    # cannot hold two full refinement states plus transients
    del vh, vl, lam_h, lam_l, resid, ortho, scale
    t3 = time.perf_counter()
    # second (compile-warm) refine run for the time
    t4 = time.perf_counter()
    hist2 = []
    out = RD._refine_device(a_hi, a_lo, v0, w32,
                            iters=iters, history=hist2)
    rel2 = float(out[4]) / float(out[6])
    t5 = time.perf_counter()
    print(f"n={n}: eig(f32) {t1-t0:.2f}s (incl compile)  "
          f"refine cold {t3-t2:.2f}s  warm {t5-t4:.2f}s  "
          f"scaled resid {rel:.2e}/{rel2:.2e}  ortho {orel:.2e}",
          flush=True)
    print(f"n={n}: accuracy-vs-sweeps (pre-sweep rel resid): "
          + " ".join(f"{r:.2e}" for r in hist2), flush=True)


if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [4096]
    print("devices:", jax.devices(), flush=True)
    for n in sizes:
        run(n)
