"""Sweep ApplyPackedReflectors nb on the TPU: the HermitianEig
backtransform (94 ms at 8192) and ExplicitQR apply per-nb-panel
compact-WY updates; wider panels mean fewer full-matrix passes
(build_wy_T is closed-form, so wide T costs only its Gram+trinv).
Run from repo root: python -u scratch/ab_apply_refl.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack.reflect import ApplyPackedReflectors


def main():
    N = int(os.environ.get("N", 8192))
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    # synthesize a packed factor: strictly-lower random V + taus
    # (the apply path only reads the strict lower triangle + tau)
    pk = jnp.asarray(np.tril(rng.standard_normal((N, N)), -1)
                     .astype(np.float32) / np.sqrt(N))
    tau = jnp.asarray((1.2 + 0.3 * rng.standard_normal(N))
                      .astype(np.float32))
    B = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))

    for nb in (128, 256, 512, 1024, 2048):
        def mk(k, nb=nb):
            def f(pk, tau, B):
                def body(_, X):
                    out = ApplyPackedReflectors(pk, tau, X, nb, N,
                                                adjoint=False)
                    return X + jnp.sum(out.astype(jnp.float32)) * 1e-30
                X = jax.lax.fori_loop(0, k, body, B)
                return jnp.sum(X[0])
            return jax.jit(f)

        f1, f2 = mk(1), mk(3)
        float(f1(pk, tau, B))
        float(f2(pk, tau, B))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f1(pk, tau, B))
            t1 = time.perf_counter()
            float(f2(pk, tau, B))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 2)
        print(f"nb={nb}: {best*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
