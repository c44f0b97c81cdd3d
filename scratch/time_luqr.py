"""End-to-end LU and QR (DistMatrix path) on the attached TPU.
Differential chained-jit timing. Run: python -u scratch/time_luqr.py
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
    which = os.environ.get("OP", "lu,qr").split(",")
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)

    if "lu" in which:
        def mk_lu(k):
            def f(A):
                def body(_, X):
                    F, P = El.LU(X)
                    s = jnp.sum(F.data.astype(jnp.float32)) * 1e-30
                    return X.with_data(X.data.at[0, 0].add(s))
                X = jax.lax.fori_loop(0, k, body, A)
                return jnp.sum(X.data[0])
            return jax.jit(f)

        t = chain_time(mk_lu, (A,))
        print(f"LU f32 N={N}: {t*1e3:.1f} ms  "
              f"{(2/3)*N**3/t/1e12:.1f} TF/s", flush=True)

    if "qr" in which:
        def mk_qr(k):
            def f(A):
                def body(_, X):
                    F = El.QR(X)
                    s = jnp.sum(F.packed.data.astype(jnp.float32)) * 1e-30
                    return X.with_data(X.data.at[0, 0].add(s))
                X = jax.lax.fori_loop(0, k, body, A)
                return jnp.sum(X.data[0])
            return jax.jit(f)

        t = chain_time(mk_qr, (A,))
        print(f"QR f32 N={N}: {t*1e3:.1f} ms  "
              f"{(4/3)*N**3/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
