"""LU component breakdown at N=16384 f32 on TPU:
- _lu_slab on a (16384, nb) slab (the panel cost), nb=1024/2048
- trailing gemm ladder at HIGH precision (the update cost)
- gather/scatter cost of one panel iteration's row movement
Run: python -u scratch/prof_lu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx  # noqa: F401
from elementalx.lapack.lu import _lu_slab
from elementalx.blas.gemm import local_gemm


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


def dep(a, out):
    s = jnp.sum(jnp.real(out).astype(jnp.float32)) * 1e-30
    return a.at[0, 0].add(s.astype(a.dtype))


def main():
    N = 16384
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    HI = jax.lax.Precision.HIGH

    # 1. panel cost: _lu_slab on (N, nb)
    for nb in (1024, 2048):
        sl0 = jnp.asarray(rng.standard_normal((N, nb)), jnp.float32)

        def mk(k, sl0=sl0):
            def f(sl):
                def body(_, x):
                    lu, lp = _lu_slab(x)
                    return dep(x, lu)
                x = jax.lax.fori_loop(0, k, body, sl)
                return jnp.sum(x)
            return jax.jit(f)

        t = chain_time(mk, (sl0,), k1=1, k2=5)
        print(f"_lu_slab ({N},{nb}): {t*1e3:.2f} ms", flush=True)

    # 2. trailing gemm: (N, nb) @ (nb, rest) at HIGH for the largest panels
    nb = 1024
    L = jnp.asarray(rng.standard_normal((N, nb)), jnp.float32)
    R = jnp.asarray(rng.standard_normal((nb, N - nb)), jnp.float32)

    def mk_g(k):
        def f(L, R):
            def body(_, x):
                y = local_gemm(x, R, precision=HI)
                return dep(x, y[:, :nb])
            x = jax.lax.fori_loop(0, k, body, L)
            return jnp.sum(x)
        return jax.jit(f)

    t = chain_time(mk_g, (L, R), k1=1, k2=5)
    fl = 2 * N * nb * (N - nb)
    print(f"trailing gemm (N x {nb}) @ ({nb} x {N-nb}) HIGH: {t*1e3:.2f} ms "
          f"{fl/t/1e12:.1f} TF/s", flush=True)

    # 3. one panel iteration's data movement (gather slab, scatter back,
    #    scatter Lphys, row-gather at the end scale check)
    a = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
    tail = jnp.asarray(np.random.default_rng(1).permutation(N), jnp.int32)

    def mk_mv(k):
        def f(a, tail):
            def body(_, x):
                cols = x[:, :nb]
                sl = jnp.take(cols, tail, axis=0, unique_indices=True)
                cols2 = cols.at[tail].set(sl * 1.0000001,
                                          unique_indices=True)
                x = jax.lax.dynamic_update_slice(x, cols2, (0, 0))
                return x
            x = jax.lax.fori_loop(0, k, body, a)
            return jnp.sum(x[0])
        return jax.jit(f)

    t = chain_time(mk_mv, (a, tail), k1=1, k2=5)
    print(f"panel gather+scatter (N x {nb}): {t*1e3:.2f} ms", flush=True)

    # 4. full-matrix row gather (the exit permutation)
    def mk_gather(k):
        def f(a, tail):
            def body(_, x):
                return jnp.take(x, tail, axis=0, unique_indices=True)
            x = jax.lax.fori_loop(0, k, body, a)
            return jnp.sum(x[0])
        return jax.jit(f)

    t = chain_time(mk_gather, (a, tail), k1=1, k2=5)
    print(f"full row gather {N}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
