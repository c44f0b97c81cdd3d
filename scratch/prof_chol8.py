"""Where do the missing ~10 ms of the left-looking Cholesky go?
Hypothesis: the per-panel dynamic_update_slice on the (M, M) factor
buffer forces whole-buffer copies (hist READS Lbuf while the dus
WRITES it — XLA cannot prove disjointness inside the fusion).

Variants at N=16384 bf16 (history+store only, tails faked cheap):
  A: full driver shape — pan slice + astype + hist gemm + dus store
  B: same but NO dus (blocks reduced into a scalar instead)
  C: dus chain alone (no hist gemm)
Run: python scratch/prof_chol8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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


M, NB = 16384, 512
PREC = jax.lax.Precision.DEFAULT


def sweep(a, with_dus, with_hist):
    Lbuf = jnp.zeros((M, M), jnp.bfloat16)
    acc = jnp.float32(0.0)
    for k0 in range(0, M, NB):
        pan = a[k0:, k0:k0 + NB].astype(jnp.float32)
        if with_hist and k0 > 0:
            hist = Lbuf[k0:, :k0]
            row = Lbuf[k0:k0 + NB, :k0]
            pan = pan - jnp.matmul(hist, jnp.conj(row.T), precision=PREC,
                                   preferred_element_type=jnp.float32)
        blk = pan.astype(jnp.bfloat16)
        if with_dus:
            Lbuf = jax.lax.dynamic_update_slice(Lbuf, blk, (k0, k0))
        else:
            acc = acc + jnp.sum(blk[:1].astype(jnp.float32))
            Lbuf = Lbuf.at[k0, k0].add(acc.astype(jnp.bfloat16) * 1e-30)
    return Lbuf, acc


def mk(variant):
    def make(k):
        def f(a):
            def body(_, c):
                a, s = c
                if variant == "A":
                    L, acc = sweep(a, True, True)
                elif variant == "B":
                    L, acc = sweep(a, False, True)
                else:
                    L, acc = sweep(a, True, False)
                d = jnp.sum(L[0].astype(jnp.float32)) * 1e-30 + acc * 1e-30
                return a.at[0, 0].add(d.astype(a.dtype)), d
            a, d = jax.lax.fori_loop(0, k, body, (a, jnp.float32(0.0)))
            return jnp.sum(a[0].astype(jnp.float32))
        return jax.jit(f)
    return make


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, M)), jnp.bfloat16)
    for variant in ("A", "B", "C"):
        t = chain_time(mk(variant), (a,))
        print(f"variant {variant}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
