"""Where do the 26.8 ms of bf16 Cholesky at 16384 go?
Components: recursion at 8192/16384, the 8192 trsm panel, the 8192
rank-k update, the batched diag-inv, and a pure concat passthrough.
Run from repo root: python -u scratch/prof_chol3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx  # noqa: F401
from elementalx.lapack.cholesky import _chol_lower_rec
from elementalx.blas.trsm import _right_solve_adjoint_lower, _batched_diag_inv


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


def hpd(n):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    return a @ a.T + 2.0 * np.eye(n, dtype=np.float32)


def main():
    print("devices:", jax.devices(), flush=True)
    BF, F32, DEF = jnp.bfloat16, jnp.float32, jax.lax.Precision.DEFAULT

    # full recursion (f32 carrier, bf16 store) at 8192 and 16384
    for n in (8192, 16384):
        a = jnp.asarray(hpd(n), F32)

        def mk(k, a=a):
            def f(a):
                def body(_, x):
                    L = _chol_lower_rec(x, 1024, DEF, BF)
                    return dep(x, L)
                x = jax.lax.fori_loop(0, k, body, a)
                return jnp.sum(x)
            return jax.jit(f)

        t = chain_time(mk, (a,), k1=1, k2=4)
        print(f"chol_rec bf16store n={n}: {t*1e3:.2f} ms", flush=True)

    # the top-level trsm panel: T=8192 lower-tri f32, B=8192x8192 f32,
    # opcast bf16 (exactly what the recursion's store branch runs)
    h = 8192
    rng = np.random.default_rng(1)
    T = jnp.asarray(np.tril(rng.standard_normal((h, h))).astype(np.float32)
                    + 3 * np.eye(h, dtype=np.float32))
    B = jnp.asarray(rng.standard_normal((h, h)), F32)

    for nb in (1024, 2048):
        def mk(k, nb=nb):
            def f(T, B):
                def body(_, x):
                    X = _right_solve_adjoint_lower(T, x, nb,
                                                   precision=DEF, opcast=BF)
                    return dep(x, X)
                x = jax.lax.fori_loop(0, k, body, B)
                return jnp.sum(x)
            return jax.jit(f)
        t = chain_time(mk, (T, B), k1=1, k2=5)
        print(f"trsm panel 8192 nb={nb}: {t*1e3:.2f} ms", flush=True)

    # diag inv alone at both granularities
    for nb in (1024, 2048):
        def mk(k, nb=nb):
            def f(T):
                def body(_, x):
                    inv = _batched_diag_inv(x, nb, h // nb, True)
                    return dep(x, inv)
                x = jax.lax.fori_loop(0, k, body, T)
                return jnp.sum(x)
            return jax.jit(f)
        t = chain_time(mk, (T,), k1=1, k2=5)
        print(f"diag_inv {h//nb}x{nb}: {t*1e3:.2f} ms", flush=True)

    # rank-k: bf16 operands -> f32 out, 8192
    Lb = jnp.asarray(rng.standard_normal((h, h)), BF)

    def mk_rk(k):
        def f(L):
            def body(_, x):
                y = jnp.matmul(x, x.T, precision=DEF,
                               preferred_element_type=F32)
                return dep(x, y.astype(BF))
            x = jax.lax.fori_loop(0, k, body, L)
            return jnp.sum(x.astype(F32))
        return jax.jit(f)

    t = chain_time(mk_rk, (Lb,), k1=1, k2=5)
    print(f"rank-k 8192 bf16: {t*1e3:.2f} ms", flush=True)

    # concat tree passthrough: rebuild a 16384 matrix from 4 blocks,
    # 4 levels deep (mimic the recursion's copy cost), bf16
    big = jnp.asarray(np.random.default_rng(2).standard_normal(
        (16384, 16384)), BF)

    def mk_cc(k):
        def f(x):
            def body(_, x):
                y = x
                for lvl in (2048, 4096, 8192, 16384):
                    hh = lvl // 2
                    top = jnp.concatenate(
                        [y[:hh, :hh], jnp.zeros((hh, 16384 - hh), BF)], 1)
                    bot = jnp.concatenate([y[hh:, :hh] * 1, y[hh:, hh:]], 1)
                    y = jnp.concatenate([top[:, :lvl] * 1, top[:, lvl:]], 1)
                    y = jnp.concatenate([jnp.concatenate(
                        [top], 0)[:hh], bot], 0) if lvl == 16384 else y
                return dep(x, y)
            x = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(x.astype(F32))
        return jax.jit(f)

    t = chain_time(mk_cc, (big,), k1=1, k2=5)
    print(f"concat passthrough (rough): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
