"""A/B: TWO-LEVEL left-looking Cholesky at 16384 (bf16 + f32), with the
SAME f32-carrier discipline as the committed flat scheme
(cholesky._chol_lower_left): slice-wise upcast of panels, f32
accumulation, f32 base cholesky/trinv, storage-dtype factor buffer.

The first (unfaithful) version of this script accumulated in bf16 and
ran XLA's cholesky on bf16 — 32-45 TF/s, not a valid A/B. Run:
    python -u scratch/ab_chol5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from elementalx.blas.trinv import tri_inv_lower


def chol_left2(a, outer, inner, store=None, precision=None):
    """Two-level left-looking lower Cholesky (pad diagonal must be 1).
    ``a`` may be in the storage dtype; carriers are f32."""
    M = a.shape[0]
    sdt = store or a.dtype
    low = a.dtype in (jnp.bfloat16, jnp.float16)
    cdt = jnp.float32 if low else a.dtype
    Lbuf = jnp.zeros((M, M), sdt)
    for K0 in range(0, M, outer):
        W = min(outer, M - K0)
        pan = a[K0:, K0:K0 + W].astype(cdt)
        if K0 > 0:
            hist = Lbuf[K0:, :K0]
            row = Lbuf[K0:K0 + W, :K0]
            pan = pan - jnp.matmul(hist, jnp.conj(row.T),
                                   precision=precision,
                                   preferred_element_type=cdt)
        # inner left-looking within the outer panel: carrier-dtype panel
        # with storage-dtype factor block buffer
        pblk = jnp.zeros((M - K0, W), sdt)
        for j0 in range(0, W, inner):
            w = min(inner, W - j0)
            sub = pan[j0:, j0:j0 + w]
            if j0 > 0:
                ih = pblk[j0:, :j0]
                ir = pblk[j0:j0 + w, :j0]
                sub = sub - jnp.matmul(ih, jnp.conj(ir.T),
                                       precision=precision,
                                       preferred_element_type=cdt)
            a11 = sub[:w]
            l11 = jax.lax.linalg.cholesky(a11, symmetrize_input=False)
            blk = l11.astype(sdt)
            if K0 + j0 + w < M:
                inv11 = tri_inv_lower(l11)
                l21 = jnp.matmul(sub[w:], jnp.conj(inv11.T),
                                 precision=precision,
                                 preferred_element_type=cdt)
                blk = jnp.concatenate([blk, l21.astype(sdt)], axis=0)
            pblk = jax.lax.dynamic_update_slice(pblk, blk, (j0, j0))
        Lbuf = jax.lax.dynamic_update_slice(Lbuf, pblk, (K0, K0))
    return Lbuf


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


def check():
    rng = np.random.default_rng(5)
    n = 1024
    g = rng.standard_normal((n, n)).astype(np.float64)
    a0 = (g @ g.T + n * np.eye(n)).astype(np.float32)
    out = jax.jit(lambda x: chol_left2(x, 512, 128))(jnp.asarray(a0))
    L = np.tril(np.asarray(out))
    resid = np.linalg.norm(L @ L.T - a0) / np.linalg.norm(a0)
    print(f"  two-level resid (f32): {resid:.2e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    if os.environ.get("CHECK", "1") != "0":
        check()
    if os.environ.get("TIME", "1") == "0":
        return
    N = int(os.environ.get("N", 16384))
    rng = np.random.default_rng(0)
    g = rng.standard_normal((N, N)).astype(np.float32) / np.sqrt(N)
    a = (g @ g.T + 2 * np.eye(N)).astype(np.float32)

    for dt, store, prec in [
        (jnp.bfloat16, jnp.bfloat16, jax.lax.Precision.DEFAULT),
        (jnp.float32, None, jax.lax.Precision.HIGH),
    ]:
        A = jnp.asarray(a, dt)
        tag0 = "bf16" if dt == jnp.bfloat16 else "f32"
        for outer, inner in [(2048, 512), (4096, 512), (2048, 256),
                             (4096, 1024)]:
            def mk(k, outer=outer, inner=inner, store=store, prec=prec):
                def f(x):
                    def body(_, X):
                        out = chol_left2(X, outer, inner, store=store,
                                         precision=prec)
                        s = jnp.sum(out.astype(jnp.float32)) * 1e-30
                        return X.at[0, 0].add(s.astype(X.dtype))
                    X = jax.lax.fori_loop(0, k, body, x)
                    return jnp.sum(X[0].astype(jnp.float32))
                return jax.jit(f)
            t = chain_time(mk, (A,))
            print(f"{tag0} two-level {outer}/{inner}: {t*1e3:.1f} ms  "
                  f"{N**3/3/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
