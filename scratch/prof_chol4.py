"""Decompose the flat left-looking Cholesky cost at N=16384 (bf16 + f32):
A = full scheme, B = history gemms only, C = panel tails only
(chol + trinv + l21 gemm, no history). A ~ B + C - shared.

Run from repo root on the TPU: python -u scratch/prof_chol4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.blas.trinv import tri_inv_lower


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


def variant(a, nb, mode, precision):
    M = a.shape[0]
    low = a.dtype in (jnp.bfloat16, jnp.float16)
    cdt = jnp.float32 if low else a.dtype
    sdt = a.dtype
    Lbuf = jnp.zeros((M, M), sdt)
    for k0 in range(0, M, nb):
        w = min(nb, M - k0)
        pan = a[k0:, k0:k0 + w].astype(cdt)
        if k0 > 0 and mode in ("full", "hist"):
            hist = Lbuf[k0:, :k0]
            row = Lbuf[k0:k0 + w, :k0]
            pan = pan - jnp.matmul(hist, jnp.conj(row.T),
                                   precision=precision,
                                   preferred_element_type=cdt)
        if mode in ("full", "tail"):
            a11 = pan[:w]
            l11 = jax.lax.linalg.cholesky(a11, symmetrize_input=False)
            blk = l11.astype(sdt)
            if k0 + w < M:
                inv11 = tri_inv_lower(l11)
                l21 = jnp.matmul(pan[w:], jnp.conj(inv11.T).astype(pan.dtype),
                                 precision=precision,
                                 preferred_element_type=cdt)
                blk = jnp.concatenate([blk, l21.astype(sdt)], axis=0)
        else:
            blk = pan.astype(sdt)
        Lbuf = jax.lax.dynamic_update_slice(Lbuf, blk, (k0, k0))
    return Lbuf


def main():
    print("devices:", jax.devices(), flush=True)
    N = int(os.environ.get("N", 16384))
    nb = int(os.environ.get("NB", 512))
    rng = np.random.default_rng(0)
    g = rng.standard_normal((N, N)).astype(np.float32) / np.sqrt(N)
    spd = g @ g.T + 2 * np.eye(N, dtype=np.float32)

    for dt, prec in ((jnp.bfloat16, None),
                     (jnp.float32, jax.lax.Precision.HIGH)):
        A = jnp.asarray(spd, dt)
        for mode in ("full", "hist", "tail"):
            def mk(k, mode=mode, prec=prec):
                def f(X):
                    def body(_, Y):
                        L = variant(Y, nb, mode, prec)
                        s = jnp.sum(L[:, :8].astype(jnp.float32)) * 1e-30
                        return Y + s.astype(Y.dtype)
                    Y = jax.lax.fori_loop(0, k, body, X)
                    return jnp.sum(Y[0].astype(jnp.float32))
                return jax.jit(f)

            t = chain_time(mk, (A,))
            tf = N ** 3 / 3 / t / 1e12
            print(f"{jnp.dtype(dt).name} nb={nb} {mode}: "
                  f"{t*1e3:.2f} ms  ({tf:.1f} TF/s-equiv)", flush=True)


if __name__ == "__main__":
    main()
