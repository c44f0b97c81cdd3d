"""_lu_slab internals, new params: isolated slab, _getrf_tall at
heights/widths, tri_inv costs, pivot-fixup machinery.
Run: python -u scratch/prof_lu3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx  # noqa: F401
from elementalx.lapack.lu import _lu_slab, _getrf_tall
from elementalx.blas.trinv import tri_inv_upper, tri_inv_lower_unit


def chain_time(make_chain, args, k1=2, k2=8, reps=3):
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

    sl0 = jnp.asarray(rng.standard_normal((16384, 1024)), jnp.float32)

    def mk_slab(k):
        def f(sl):
            def body(_, x):
                lu, lp = _lu_slab(x)
                return dep(x, lu)
            x = jax.lax.fori_loop(0, k, body, sl)
            return jnp.sum(x)
        return jax.jit(f)

    t = chain_time(mk_slab, (sl0,), k1=1, k2=4)
    print(f"_lu_slab (16384,1024) NEW params: {t*1e3:.2f} ms", flush=True)

    for (m, w) in ((16384, 256), (12288, 256), (8192, 256), (16384, 128)):
        a = jnp.asarray(rng.standard_normal((m, w)), jnp.float32)

        def mk(k, a=a):
            def f(a):
                def body(_, x):
                    lu, lp = _getrf_tall(x)
                    return dep(x, lu)
                x = jax.lax.fori_loop(0, k, body, a)
                return jnp.sum(x)
            return jax.jit(f)

        t = chain_time(mk, (a,))
        print(f"_getrf_tall ({m},{w}): {t*1e3:.2f} ms", flush=True)

    for w in (256, 128):
        T = jnp.asarray(
            np.tril(rng.standard_normal((w, w))).astype(np.float32)
            + 3 * np.eye(w, dtype=np.float32))

        def mk(k, T=T):
            def f(T):
                def body(_, x):
                    i1 = tri_inv_upper(x.T)
                    i2 = tri_inv_lower_unit(x)
                    return dep(dep(x, i1), i2)
                x = jax.lax.fori_loop(0, k, body, T)
                return jnp.sum(x)
            return jax.jit(f)

        t = chain_time(mk, (T,), k1=2, k2=12)
        print(f"tri_inv pair ({w}): {t*1e3:.3f} ms", flush=True)

    # pivot fixup machinery alone (nonzero/cumsum/takes at M=16384)
    P = jnp.asarray(rng.permutation(16384)[:256], jnp.int32)

    def mk_fix(k):
        def f(P):
            def body(_, P):
                Mt, Mp, w = 16384, 16384, 256
                pad_win = P >= Mt
                inP0 = jnp.zeros((Mp,), bool).at[P].set(True)
                free = jnp.nonzero(~inP0[:Mt], size=Mt,
                                   fill_value=Mt - 1)[0]
                repl = jnp.clip(
                    jnp.cumsum(pad_win.astype(jnp.int32)) - 1, 0, Mt - 1)
                P2 = jnp.where(pad_win, free[repl].astype(P.dtype), P)
                inP = jnp.zeros((Mp,), bool).at[P2].set(True)
                rest = jnp.nonzero(~inP[:Mt], size=Mt - w,
                                   fill_value=Mt - 1)[0].astype(jnp.int32)
                return P2 + rest[:w] * 0
            P = jax.lax.fori_loop(0, k, body, P)
            return jnp.sum(P)
        return jax.jit(f)

    t = chain_time(mk_fix, (P,), k1=2, k2=12)
    print(f"pivot fixup (M=16384, w=256): {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
