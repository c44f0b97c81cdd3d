"""Cholesky push 77.7 -> 100+ TF/s at N=16384: ingredient costs +
panel-width / nested-base A/B on the left-looking scheme.

Floor estimate at nb=1024 bf16: history gemms ~7.7 ms (190 TF/s) +
panel trsm gemms ~1.5 ms + 16 sequential base chol(1024) ~2.9 ms +
16 tri_inv(1024) + DUS writes = ~13-14 ms; measured e2e 18.9 ms.
Questions: (a) what do base chol / tri_inv really cost at 512/1024/
2048, (b) does nb=512 (32 panels, cheaper bases) beat nb=1024,
(c) does a two-level scheme (outer 2048 history grain, inner 512/1024
left-looking for the diagonal block) win by cutting both base-case
flops and history dispatch count?

Run from repo root: python -u scratch/ab_chol3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER
from elementalx.blas.trinv import tri_inv_lower
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


def time_fn(tag, fn, *arrs, k2=9):
    def mk(k):
        def f(*xs):
            def body(_, c):
                out = fn(*c)
                d = (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(
                    xs[0].dtype)
                return (xs[0] + d,) + xs[1:]
            c = jax.lax.fori_loop(0, k, body, xs)
            return jnp.sum(c[0].astype(jnp.float32))
        return jax.jit(f)

    f1, f2 = mk(1), mk(k2)
    float(f1(*arrs))
    float(f2(*arrs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f1(*arrs))
        t1 = time.perf_counter()
        float(f2(*arrs))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - 1))
    print(f"{tag}: {best*1e3:.3f} ms", flush=True)
    return best


def chol_left2(d, outer, inner, store=None, precision=None):
    """Two-level left-looking: outer-wide history panels; the diagonal
    (outer x outer) block is itself factored left-looking at `inner`
    grain, and l21 applies the inverse blockwise (no tri_inv(outer))."""
    M = d.shape[0]
    sdt = store or d.dtype
    Lbuf = jnp.zeros((M, M), sdt)
    for k0 in range(0, M, outer):
        w = min(outer, M - k0)
        pan = d[k0:, k0:k0 + w]
        if k0 > 0:
            hist = Lbuf[k0:, :k0]
            row = Lbuf[k0:k0 + w, :k0]
            pan = pan - jnp.matmul(hist, jnp.conj(row.T),
                                   precision=precision,
                                   preferred_element_type=d.dtype)
        # inner left-looking factorization of the panel (w wide, full
        # height M-k0): diagonal inner blocks by native cholesky,
        # sub-diagonal rows by gemm with inv11
        blkrows = []
        pw = pan  # (M-k0, w) f32 carrier
        Linn = jnp.zeros((M - k0, w), sdt)
        for j0 in range(0, w, inner):
            wi = min(inner, w - j0)
            sub = pw[j0:, j0:j0 + wi]
            if j0 > 0:
                h2 = Linn[j0:, :j0]
                r2 = Linn[j0:j0 + wi, :j0]
                sub = sub - jnp.matmul(h2, jnp.conj(r2.T),
                                       precision=precision,
                                       preferred_element_type=d.dtype)
            a11 = sub[:wi].astype(d.dtype)
            l11 = jax.lax.linalg.cholesky(a11, symmetrize_input=False)
            inv11 = tri_inv_lower(l11)
            l21 = jnp.matmul(sub[wi:], jnp.conj(inv11.T).astype(sub.dtype),
                             precision=precision,
                             preferred_element_type=d.dtype)
            blk = jnp.concatenate([l11.astype(sdt), l21.astype(sdt)],
                                  axis=0)
            Linn = jax.lax.dynamic_update_slice(Linn, blk, (j0, j0))
        Lbuf = jax.lax.dynamic_update_slice(Lbuf, Linn, (k0, k0))
    return Lbuf


def main():
    N = int(os.environ.get("N", 16384))
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)

    # ---- ingredient costs ----
    for n in (512, 1024, 2048):
        spd = rng.standard_normal((n, n)).astype(np.float32)
        spd = spd @ spd.T + n * np.eye(n, dtype=np.float32)
        x = jnp.asarray(spd)
        time_fn(f"native chol f32 {n}",
                lambda v: jax.lax.linalg.cholesky(
                    v, symmetrize_input=False), x)
        t = jnp.asarray(np.linalg.cholesky(spd))
        time_fn(f"tri_inv_lower {n}", tri_inv_lower, t)

    # one history gemm (k0=8192 midpoint): (8192,8192)@(8192,1024)
    hb = jnp.asarray(rng.standard_normal((8192, 8192)), dtype=jnp.bfloat16)
    rb = jnp.asarray(rng.standard_normal((1024, 8192)), dtype=jnp.bfloat16)
    time_fn("hist gemm bf16 (8192,8192)@(8192,1024)",
            lambda h, r: jnp.matmul(h, r.T,
                                    precision=jax.lax.Precision.DEFAULT,
                                    preferred_element_type=jnp.float32),
            hb, rb)

    # ---- correctness of chol_left2 (small) ----
    n = 1024
    spd = rng.standard_normal((n, n)).astype(np.float32)
    spd = spd @ spd.T + n * np.eye(n, dtype=np.float32)
    L2 = jax.jit(lambda v: chol_left2(v, 512, 256))(jnp.asarray(spd))
    Lref = np.linalg.cholesky(spd)
    err = np.linalg.norm(np.tril(np.asarray(L2)) - Lref) / \
        np.linalg.norm(Lref)
    print(f"chol_left2 residual (n=1024): {err:.2e}", flush=True)

    # ---- full-size A/B ----
    a = rng.standard_normal((N, N)).astype(np.float32)
    spd = a @ a.T + N * np.eye(N, dtype=np.float32)
    for dt, store, prec, plans in [
            (jnp.bfloat16, jnp.bfloat16, jax.lax.Precision.DEFAULT,
             [("flat nb=512", ("flat", 512)),
              ("flat nb=1024", ("flat", 1024)),
              ("two 2048/512", ("two", 2048, 512)),
              ("two 2048/1024", ("two", 2048, 1024)),
              ("two 4096/1024", ("two", 4096, 1024))]),
            (jnp.float32, None, jax.lax.Precision.HIGH,
             [("flat nb=1024", ("flat", 1024)),
              ("flat nb=2048", ("flat", 2048)),
              ("two 4096/1024", ("two", 4096, 1024))])]:
        A = DistMatrix.from_global(jnp.asarray(spd, dtype=dt), grid=grid)
        name = jnp.dtype(dt).name

        def mk_cur(k):
            def f(A):
                def body(_, X):
                    L = El.Cholesky(LOWER, X)
                    s = jnp.sum(L.data.astype(jnp.float32)) * 1e-30
                    return X.with_data(X.data.at[0, 0].add(
                        s.astype(X.dtype)))
                X = jax.lax.fori_loop(0, k, body, A)
                return jnp.sum(X.data[0].astype(jnp.float32))
            return jax.jit(f)

        t = chain_time(mk_cur, (A,))
        print(f"V0 current {name}: {t*1e3:.1f} ms  "
              f"{N**3/3/t/1e12:.1f} TF/s", flush=True)

        for tag, plan in plans:
            def mk(k, plan=plan):
                def f(A):
                    def body(_, X):
                        dd = X.data.astype(jnp.float32) if store else X.data
                        if plan[0] == "flat":
                            L = _chol_lower_left(dd, plan[1], prec, store)
                        else:
                            L = chol_left2(dd, plan[1], plan[2],
                                           store=store, precision=prec)
                        s = jnp.sum(L.astype(jnp.float32)) * 1e-30
                        return X.with_data(X.data.at[0, 0].add(
                            s.astype(X.dtype)))
                    X = jax.lax.fori_loop(0, k, body, A)
                    return jnp.sum(X.data[0].astype(jnp.float32))
                return jax.jit(f)

            t = chain_time(mk, (A,))
            print(f"{tag} {name}: {t*1e3:.1f} ms  "
                  f"{N**3/3/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
