"""nb sweep of the lookahead left-looking Cholesky at N=16384
(the lookahead moved the big history gemms off the critical path, so
the serial floor is now per-panel tail latency x panel count — the
optimum nb may have moved up from 512).

Run: python scratch/ab_chol9.py [N]
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


def chain_time(make_chain, args, k1=1, k2=5, reps=3):
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


def run(label, A, nb, k2):
    def mk(k):
        def f(A):
            def body(_, X):
                L = El.Cholesky(LOWER, X, blocksize=nb)
                s = jnp.sum(jnp.real(L.data).astype(jnp.float32)) * 1e-30
                return X.with_data(X.data.at[0, 0].add(s.astype(X.dtype)))
            X = jax.lax.fori_loop(0, k, body, A)
            return jnp.sum(X.data.astype(jnp.float32))
        return jax.jit(f)

    t = chain_time(mk, (A,), k1=1, k2=k2)
    N = A.m
    tf = (N ** 3 / 3) / t / 1e12
    print(f"{label} nb={nb:5d}: {t*1e3:8.2f} ms  {tf:6.1f} TF/s",
          flush=True)
    return t


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32) / np.sqrt(N)
    a = a @ a.T + 2.0 * np.eye(N, dtype=np.float32)

    for dtype, k2 in ((jnp.bfloat16, 8), (jnp.float32, 4)):
        A = DistMatrix.from_global(jnp.asarray(a, dtype), grid=grid)
        name = "bf16" if dtype == jnp.bfloat16 else "f32"
        for nb in (512, 768, 1024, 256):
            run(f"{name} N={N}", A, nb, k2)


if __name__ == "__main__":
    main()
