"""A/B: (a) scatter-after-gemm LU driver (now in lu.py), (b) _SLAB_INNER
256 vs 512, at N=16384 f32 on the attached TPU.

Run from repo root: python -u scratch/ab_lu4.py
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
from elementalx.lapack import lu as lumod


def chain_time(make_chain, args, k1=1, k2=3, reps=3):
    f1, f2 = make_chain(k1), make_chain(k2)
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
    N = int(os.environ.get("N", 16384))
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)

    # correctness: reordered driver still factors correctly (small n)
    ns = 1024
    asml = jnp.asarray(rng.standard_normal((ns, ns)).astype(np.float32))
    Asml = DistMatrix.from_global(asml, grid=grid)
    F, P = jax.jit(El.LU)(Asml)
    f = F.data[:ns, :ns]
    Lf = jnp.tril(f, -1) + jnp.eye(ns, dtype=f.dtype)
    res = jnp.linalg.norm(Lf @ jnp.triu(f) - jnp.take(asml, P.perm[:ns],
                                                      axis=0)) \
        / jnp.linalg.norm(asml)
    print(f"LU reordered residual (n={ns}): {float(res):.2e}", flush=True)

    def mk(k):
        def f(A):
            def body(_, X):
                F, P = El.LU(X)
                s = jnp.sum(F.data.astype(jnp.float32)) * 1e-30
                return X.with_data(X.data.at[0, 0].add(s))
            X = jax.lax.fori_loop(0, k, body, A)
            return jnp.sum(X.data[0])
        return jax.jit(f)

    for inner in (512, 256):
        lumod._SLAB_INNER = inner
        t = chain_time(mk, (A,))
        print(f"reordered inner={inner}: {t*1e3:.1f} ms  "
              f"{(2/3)*N**3/t/1e12:.1f} TF/s", flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
