"""SVD / HermitianEig timing refresh after the precision work.
Run: python -u scratch/svd_and_qrlayout.py
"""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import elementalx as El
from elementalx import DistMatrix


def chain_time(mk, args, k1=1, k2=3, reps=3):
    f1, f2 = mk(k1), mk(k2)
    float(f1(*args)); float(f2(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(*args))
        t1 = time.perf_counter(); float(f2(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    HI = jax.lax.Precision.HIGH

    # ---- SVD / HermitianEig refresh ----
    from elementalx.lapack import SVD, HermitianEig
    from elementalx.core.types import LOWER
    grid = El.Grid(devices=jax.devices())
    for n in (4096, 8192):
        a = rng.standard_normal((n, n)).astype(np.float32)
        A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
        t0 = time.perf_counter()
        U, s, V = SVD(A)
        float(jnp.sum(s))
        t1 = time.perf_counter()
        float(jnp.sum(s))
        print(f"SVD f32 {n} (QDWH, warm incl. compile): {t1-t0:.2f} s",
              flush=True)
        t0 = time.perf_counter()
        U, s, V = SVD(A)
        float(jnp.sum(s))
        t1 = time.perf_counter()
        print(f"SVD f32 {n} (QDWH, cached): {t1-t0:.2f} s", flush=True)

    n = 8192
    h = rng.standard_normal((n, n)).astype(np.float32)
    h = (h + h.T) / 2
    H = DistMatrix.from_global(jnp.asarray(h), grid=grid)
    wv, Q = HermitianEig(LOWER, H)
    float(jnp.sum(wv))
    t0 = time.perf_counter()
    wv, Q = HermitianEig(LOWER, H)
    float(jnp.sum(wv))
    t1 = time.perf_counter()
    print(f"HermitianEig f32 {n} (cached): {t1-t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
