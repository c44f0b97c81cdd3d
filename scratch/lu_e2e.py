"""End-to-end LU 16384 f32 on the TPU: XLA getrf vs fused Pallas getrf.

Run from repo root: python -u scratch/lu_e2e.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(mk, args, k1=1, k2=3, reps=3):
    f1, f2 = mk(k1), mk(k2)
    float(f1(*args))
    float(f2(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f1(*args))
        t1 = time.perf_counter()
        float(f2(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    import elementalx as El
    from elementalx import DistMatrix

    N = int(os.environ.get("N", 16384))
    NB = int(os.environ.get("NB", 0)) or None
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32)
    grid = El.Grid(devices=jax.devices())
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)

    def mk(k):
        def f(Ad):
            def body(_, X):
                F, P = El.LU(A.with_data(X), blocksize=NB)
                s = (jnp.sum(F.data) * 1e-30
                     + jnp.sum(P.perm).astype(jnp.float32) * 1e-30)
                return X + s.astype(X.dtype)
            X = jax.lax.fori_loop(0, k, body, Ad)
            return jnp.sum(X[0])
        return jax.jit(f)

    t = chain_time(mk, (A.data,))
    tf = 2 * N ** 3 / 3 / t / 1e12
    mode = "xla" if os.environ.get("ELX_NO_PALLAS_GETRF") else "pallas"
    print(f"LU {N} f32 nb={NB or 'auto'} [{mode}]: {t*1e3:.1f} ms  "
          f"({tf:.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
