"""getrf primitive costs on TPU: single calls at various shapes, and
whether vmapped chunk batches compile (VMEM scope limit probing).
Run: python -u scratch/prof_getrf.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx  # noqa: F401


def chain_time(make_chain, args, k1=2, k2=10, reps=3):
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
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # single getrf at various shapes
    for (m, w) in ((8192, 128), (8192, 256), (8192, 512), (2048, 128),
                   (2048, 256), (4096, 256), (8192, 1024)):
        a = jnp.asarray(rng.standard_normal((m, w)), jnp.float32)

        def mk(k, a=a):
            def f(a):
                def body(_, x):
                    lu, _, lp = jax.lax.linalg.lu(x)
                    return dep(x, lu)
                x = jax.lax.fori_loop(0, k, body, a)
                return jnp.sum(x)
            return jax.jit(f)

        try:
            t = chain_time(mk, (a,))
            print(f"getrf ({m},{w}): {t*1e3:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"getrf ({m},{w}): FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)

    # vmapped chunk batches
    for (b, m, w) in ((8, 2048, 128), (8, 2048, 256), (4, 4096, 128),
                      (4, 4096, 256), (16, 1024, 128), (2, 8192, 128)):
        a = jnp.asarray(rng.standard_normal((b, m, w)), jnp.float32)

        def mk(k, a=a):
            def f(a):
                def body(_, x):
                    lu, _, lp = jax.vmap(jax.lax.linalg.lu)(x)
                    return dep(x, lu)
                x = jax.lax.fori_loop(0, k, body, a)
                return jnp.sum(x)
            return jax.jit(f)

        try:
            t = chain_time(mk, (a,))
            print(f"vmap getrf ({b}x{m},{w}): {t*1e3:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"vmap getrf ({b}x{m},{w}): FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
