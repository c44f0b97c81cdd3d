"""Verification sweep around the two-level Cholesky winner (ab_chol5:
bf16 2048/512 = 13.2 ms; f32 2048/256 = 13.8 ms SUSPICIOUS outlier).
Same-session flat baselines + repeats + numeric check of the winner at
N=16384 against the flat factor.

Run from repo root: python -u scratch/ab_chol6.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack.cholesky import _chol_lower_left, _chol_lower_left2


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
    N = int(os.environ.get("N", 16384))
    rng = np.random.default_rng(0)
    g = rng.standard_normal((N, N)).astype(np.float32) / np.sqrt(N)
    a = (g @ g.T + 2 * np.eye(N)).astype(np.float32)

    cases = [
        ("bf16 flat 512", jnp.bfloat16, jnp.bfloat16,
         jax.lax.Precision.DEFAULT, None, 512),
        ("bf16 2L 2048/512", jnp.bfloat16, jnp.bfloat16,
         jax.lax.Precision.DEFAULT, (2048, 512), None),
        ("bf16 2L 1536/512", jnp.bfloat16, jnp.bfloat16,
         jax.lax.Precision.DEFAULT, (1536, 512), None),
        ("bf16 2L 2560/512", jnp.bfloat16, jnp.bfloat16,
         jax.lax.Precision.DEFAULT, (2560, 512), None),
        ("bf16 2L 2048/384", jnp.bfloat16, jnp.bfloat16,
         jax.lax.Precision.DEFAULT, (2048, 384), None),
        ("f32 flat 512", jnp.float32, None,
         jax.lax.Precision.HIGH, None, 512),
        ("f32 2L 2048/256 (a)", jnp.float32, None,
         jax.lax.Precision.HIGH, (2048, 256), None),
        ("f32 2L 2048/256 (b)", jnp.float32, None,
         jax.lax.Precision.HIGH, (2048, 256), None),
        ("f32 2L 2048/384", jnp.float32, None,
         jax.lax.Precision.HIGH, (2048, 384), None),
        ("bf16 2L 2048/256", jnp.bfloat16, jnp.bfloat16,
         jax.lax.Precision.DEFAULT, (2048, 256), None),
    ]
    for tag, dt, store, prec, two, nb in cases:
        A = jnp.asarray(a, dt)

        def mk(k, store=store, prec=prec, two=two, nb=nb):
            def f(x):
                def body(_, X):
                    if two is not None:
                        out = _chol_lower_left2(X, two[0], two[1],
                                                prec, store)
                    else:
                        d = X if store is None else X
                        out = _chol_lower_left(d, nb, prec, store)
                    s = jnp.sum(out.astype(jnp.float32)) * 1e-30
                    return X.at[0, 0].add(s.astype(X.dtype))
                X = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(X[0].astype(jnp.float32))
            return jax.jit(f)

        t = chain_time(mk, (A,))
        print(f"{tag}: {t*1e3:.1f} ms  {N**3/3/t/1e12:.1f} TF/s",
              flush=True)

    # numeric spot-check of the f32 outlier config vs the flat factor
    L1 = np.asarray(jax.jit(
        lambda x: _chol_lower_left2(x, 2048, 256,
                                    jax.lax.Precision.HIGH))(
        jnp.asarray(a))).astype(np.float64)
    L0 = np.asarray(jax.jit(
        lambda x: _chol_lower_left(x, 512, jax.lax.Precision.HIGH))(
        jnp.asarray(a))).astype(np.float64)
    d = np.linalg.norm(np.tril(L1) - np.tril(L0)) / np.linalg.norm(
        np.tril(L0))
    print(f"f32 2L-2048/256 vs flat factor reldiff: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
