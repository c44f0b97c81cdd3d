"""A/B: diagonal-only fused tail (potrf_block_inv, ELX_POTRF_DIAG=1)
vs the XLA chol + HIGH-trinv tail, full driver, N=16384.

Run from repo root: python scratch/ab_chol11.py
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


def chain_time(make_chain, args, k1=1, k2=4, reps=3):
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


def run(label, A, k2, tag):
    def mk(k):
        def f(A, _tag=tag):
            def body(_, X):
                L = El.Cholesky(LOWER, X)
                s = jnp.sum(jnp.real(L.data).astype(jnp.float32)) * 1e-30
                return X.with_data(X.data.at[0, 0].add(s.astype(X.dtype)))
            X = jax.lax.fori_loop(0, k, body, A)
            return jnp.sum(X.data.astype(jnp.float32))
        f.__name__ = f"chol_{tag}_{k}"
        return jax.jit(f)

    t = chain_time(mk, (A,), k1=1, k2=k2)
    N = A.m
    tf = (N ** 3 / 3) / t / 1e12
    print(f"{label}: {t*1e3:8.2f} ms  {tf:6.1f} TF/s", flush=True)
    return t


def main():
    N = 16384
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32) / np.sqrt(N)
    a = a @ a.T + 2.0 * np.eye(N, dtype=np.float32)
    a64 = np.asarray(a, np.float64)

    for dtype, k2 in ((jnp.bfloat16, 8), (jnp.float32, 4)):
        A = DistMatrix.from_global(jnp.asarray(a, dtype), grid=grid)
        name = np.dtype(dtype).name if dtype != jnp.bfloat16 else "bf16"
        os.environ["ELX_POTRF_DIAG"] = "1"
        El.lapack.cholesky._cholesky_jit.clear_cache()
        run(f"{name} N={N} DIAG kernel", A, k2, "diag")
        if dtype == jnp.float32:
            L = El.Cholesky(LOWER, A)
            Lh = np.asarray(L.global_array(), np.float64)
            r = np.abs(np.tril(Lh) @ np.tril(Lh).T - a64).max()
            print(f"  diag-kernel resid max|LL^T-A| = {r:.3e}", flush=True)
        os.environ["ELX_POTRF_DIAG"] = "0"
        El.lapack.cholesky._cholesky_jit.clear_cache()
        run(f"{name} N={N} XLA  tail  ", A, k2, "xla")


if __name__ == "__main__":
    main()
