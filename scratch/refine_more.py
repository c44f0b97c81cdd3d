"""On-chip rows for the refined SOLVE and SVD tiers at n >= 4096
(VERDICT r4 item 7): device-resident dw machinery, scalars-only
readbacks for the residuals.

Run from repo root: python -u scratch/refine_more.py [n]
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
from elementalx.lapack.refine_device import (
    RefinedLinearSolveDevice,
    RefinedSVDDevice,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(2)

    # ---- refined linear solve ----
    a = (rng.standard_normal((n, n)) / np.sqrt(n)).astype(np.float32)
    a = a + 2.0 * np.eye(n, dtype=np.float32)
    b = rng.standard_normal(n)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    t0 = time.perf_counter()
    hist = []
    x, scaled = RefinedLinearSolveDevice(A, b, history=hist)
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    hist2 = []
    x, scaled = RefinedLinearSolveDevice(A, b, history=hist2)
    t3 = time.perf_counter()
    print(f"refined solve n={n}: cold {t1-t0:.2f}s warm {t3-t2:.2f}s  "
          f"scaled resid {scaled:.2e}  per-iter "
          + " ".join(f"{r:.1e}" for r in hist2), flush=True)
    # relative error vs an f64 oracle on the host
    xref = np.linalg.solve(a.astype(np.float64), b)
    rel = np.max(np.abs(x - xref)) / max(np.max(np.abs(xref)), 1e-300)
    print(f"refined solve n={n}: rel err vs f64 {rel:.2e}", flush=True)

    # ---- refined SVD ----
    g = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    G = DistMatrix.from_global(jnp.asarray(g), grid=grid)
    t0 = time.perf_counter()
    hist = []
    U, s, V, relr = RefinedSVDDevice(G, history=hist)
    t1 = time.perf_counter()
    print(f"refined svd n={n}: cold {t1-t0:.2f}s  rel resid {relr:.2e}  "
          f"sweeps " + " ".join(f"{r:.1e}" for r in hist), flush=True)
    sref = np.linalg.svd(g.astype(np.float64), compute_uv=False)
    serr = np.max(np.abs(s - sref)) / sref[0]
    print(f"refined svd n={n}: sigma err vs f64 {serr:.2e}", flush=True)


if __name__ == "__main__":
    main()
