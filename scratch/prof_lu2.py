"""Decompose full-LU time at 16384 f32 by monkeypatching components:
V0 full | V1 dummy panel | V2 dummy gemms | V3 both (movement only).
Run: python -u scratch/prof_lu2.py
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


real_slab = lumod._lu_slab
real_gemm = lumod.local_gemm


def dummy_slab(sl):
    return sl, jnp.arange(sl.shape[0], dtype=jnp.int32)


def dummy_gemm(a, b, *, precision=None):
    return jnp.zeros((a.shape[0], b.shape[1]), a.dtype)


def main():
    N = 16384
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)

    def run(tag, slab, gemm):
        lumod._lu_slab = slab
        lumod.local_gemm = gemm

        def mk(k):
            def f(A):
                def body(_, X):
                    # bypass LU's own jit cache (monkeypatched internals
                    # must retrace every variant)
                    F, P = lumod.LU.__wrapped__(X)
                    s = jnp.sum(F.data[0]) * 1e-30
                    return X.with_data(X.data.at[0, 0].add(s))
                X = jax.lax.fori_loop(0, k, body, A)
                return jnp.sum(X.data[0])
            return jax.jit(f)

        t = chain_time(mk, (A,))
        print(f"{tag}: {t*1e3:.1f} ms", flush=True)

    run("V0 full", real_slab, real_gemm)
    run("V1 dummy-panel", dummy_slab, real_gemm)
    run("V2 dummy-gemm", real_slab, dummy_gemm)
    run("V3 both-dummy", dummy_slab, dummy_gemm)


if __name__ == "__main__":
    main()
