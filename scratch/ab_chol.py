"""A/B the in-place Cholesky variants at bf16 16384 on TPU.
V1: in-place, full-square updates, mixed (bf16-T) trsm
V2: in-place, triangle 2x2 updates, f32-T trsm (cast l11 up)
V3: in-place, full-square updates, f32-T trsm
Baseline (prev measured): concat recursion = 26.8 ms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx  # noqa: F401
from elementalx.lapack import cholesky as C


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


def dep(a, out):
    s = jnp.sum(jnp.real(out).astype(jnp.float32)) * 1e-30
    return a.at[0, 0].add(s.astype(a.dtype))


def main():
    N = 16384
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    m = rng.standard_normal((N, N)).astype(np.float32) / np.sqrt(N)
    a = jnp.asarray(m @ m.T + 2.0 * np.eye(N, dtype=np.float32), jnp.float32)
    BF, DEF = jnp.bfloat16, jax.lax.Precision.DEFAULT

    def run(tag, tri_min, cast_T):
        C._TRI_UPDATE_MIN = tri_min
        C._AB_CAST_T = cast_T

        def mk(k):
            def f(a):
                def body(_, x):
                    L = C._chol_lower_inplace(x, 1024, DEF, BF)
                    return dep(x, L)
                x = jax.lax.fori_loop(0, k, body, a)
                return jnp.sum(x)
            return jax.jit(f)

        t = chain_time(mk, (a,))
        tf = (N ** 3 / 3) / t / 1e12
        print(f"{tag}: {t*1e3:.2f} ms  {tf:.1f} TF/s", flush=True)

    run("V1 inplace/full-square/bf16-T", 1 << 30, False)
    run("V2 inplace/triangle/f32-T", 8192, True)
    run("V3 inplace/full-square/f32-T", 1 << 30, True)


if __name__ == "__main__":
    main()
