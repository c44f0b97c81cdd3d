"""Refine the left-looking Cholesky panel-width knee found by
ab_chol3 (flat nb=512 bf16: 16.1 ms / 90.9 TF/s at N=16384; flat
nb=1024 f32: 38.9 ms). Probe nb in {256,384,512,768} bf16 and
{512,1024} f32 at N=16384 AND N=8192 (guard against regressing the
committed 8192 numbers).

Run from repo root: python -u scratch/ab_chol4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack.cholesky import _chol_lower_left


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
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for N in (16384, 8192):
        a = rng.standard_normal((N, N)).astype(np.float32)
        spd = a @ a.T + N * np.eye(N, dtype=np.float32)
        for dt, store, prec, nbs in [
                (jnp.bfloat16, jnp.bfloat16, jax.lax.Precision.DEFAULT,
                 (256, 384, 512, 768)),
                (jnp.float32, None, jax.lax.Precision.HIGH,
                 (512, 1024))]:
            X0 = jnp.asarray(spd, dtype=dt)
            name = jnp.dtype(dt).name
            for nb in nbs:
                def mk(k, nb=nb):
                    def f(X0):
                        def body(_, X):
                            d = X.astype(jnp.float32) if store else X
                            L = _chol_lower_left(d, nb, prec, store)
                            s = jnp.sum(L.astype(jnp.float32)) * 1e-30
                            return X.at[0, 0].add(s.astype(X.dtype))
                        X = jax.lax.fori_loop(0, k, body, X0)
                        return jnp.sum(X[0].astype(jnp.float32))
                    return jax.jit(f)

                t = chain_time(mk, (X0,))
                print(f"N={N} flat nb={nb} {name}: {t*1e3:.1f} ms  "
                      f"{N**3/3/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
