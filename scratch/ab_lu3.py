"""A/B restructured LU loops at N=16384 f32 on the attached TPU.

V0  current El.LU driver (baseline)
V1  block-list loop: finished column blocks kept in a Python list,
    trailing matrix is a separate shrinking array; the U12 pivot-row
    scatter happens AFTER the trailing gemm (on the gemm output, which
    XLA can update in place) — removes the per-panel full-trailing
    DUS write-back into `a`.
V2  V1 + logical-height trailing update: gemm on the packed (Mt-nb)
    logical rows and scatter-add into physical rows (fewer FLOPs,
    scatter instead of full-height zeros-row gemm).
V1w/V2w  same with nb=2048.

Run from repo root: python -u scratch/ab_lu3.py
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
from elementalx.lapack import lu as lumod
from elementalx.blas.gemm import hot_precision, local_gemm
from elementalx.blas.trinv import tri_inv_lower_unit


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


def lu_blocklist(a, m, nb, logical_update=False):
    """Restructured physical-row LU; returns (packed-pivoted a, rowmap)."""
    M, N = a.shape
    i2 = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a = jnp.where((i2 == j2) & (i2 >= m), jnp.ones((), a.dtype), a)
    hp = hot_precision(a.dtype)
    nblk = (M + nb - 1) // nb
    rowmap = jnp.arange(M, dtype=jnp.int32)
    blocks = []
    right = a
    for k in range(nblk):
        k0 = k * nb
        tail = rowmap[k0:]
        cols = right[:, :nb]
        sl = jnp.take(cols, tail, axis=0, unique_indices=True)
        lu_, lperm = lumod._lu_slab(sl)
        tail = jnp.take(tail, lperm, axis=0, unique_indices=True)
        rowmap = jax.lax.dynamic_update_slice(rowmap, tail, (k0,))
        blocks.append(cols.at[tail].set(lu_, unique_indices=True))
        rest = N - k0 - nb
        if rest <= 0:
            continue
        inv11 = tri_inv_lower_unit(lu_[:nb, :])
        prow = tail[:nb]
        Arow = jnp.take(right[:, nb:], prow, axis=0, unique_indices=True)
        U12 = local_gemm(inv11, Arow, precision=hp)
        if logical_update:
            upd = local_gemm(lu_[nb:, :], U12, precision=hp)
            right = right[:, nb:].at[tail[nb:]].add(
                -upd, unique_indices=True)
            right = right.at[prow].set(U12, unique_indices=True)
        else:
            Lphys = jnp.zeros((M, nb), a.dtype).at[tail[nb:]].set(
                lu_[nb:, :], unique_indices=True)
            upd = right[:, nb:] - local_gemm(Lphys, U12, precision=hp)
            right = upd.at[prow].set(U12, unique_indices=True)
    out = jnp.concatenate(blocks, axis=1)
    out = jnp.take(out, rowmap, axis=0, unique_indices=True)
    out = jnp.where((i2 == j2) & (i2 >= m), jnp.zeros((), a.dtype), out)
    return out, rowmap


def main():
    N = int(os.environ.get("N", 16384))
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)

    # correctness check (small) on the new loops, eager-ish
    ns = 512
    asml = jnp.asarray(rng.standard_normal((ns, ns)).astype(np.float32))
    for tag, kw in [("V1", {}), ("V2", {"logical_update": True})]:
        f, rm = jax.jit(lambda x: lu_blocklist(x, ns, 128, **kw))(asml)
        Lf = jnp.tril(f, -1) + jnp.eye(ns, dtype=f.dtype)
        Uf = jnp.triu(f)
        res = jnp.linalg.norm(Lf @ Uf - jnp.take(asml, rm, axis=0)) \
            / jnp.linalg.norm(asml)
        print(f"{tag} residual (n=512): {float(res):.2e}", flush=True)

    only = os.environ.get("VARIANTS", "").split(",") if \
        os.environ.get("VARIANTS") else None

    if only is None or "V0" in only:
        def mk_cur(k):
            def f(A):
                def body(_, X):
                    F, P = El.LU(X)
                    s = jnp.sum(F.data.astype(jnp.float32)) * 1e-30
                    return X.with_data(X.data.at[0, 0].add(s))
                X = jax.lax.fori_loop(0, k, body, A)
                return jnp.sum(X.data[0])
            return jax.jit(f)

        t = chain_time(mk_cur, (A,))
        print(f"V0 current: {t*1e3:.1f} ms  {(2/3)*N**3/t/1e12:.1f} TF/s",
              flush=True)

    for tag, nb, kw in [("V1 nb=1024", 1024, {}),
                        ("V2 nb=1024 logical", 1024,
                         {"logical_update": True}),
                        ("V1w nb=2048", 2048, {}),
                        ("V2w nb=2048 logical", 2048,
                         {"logical_update": True})]:
        if only is not None and tag.split()[0] not in only:
            continue
        def mk(k, nb=nb, kw=kw):
            def f(A):
                def body(_, X):
                    out, rm = lu_blocklist(X.data, N, nb, **kw)
                    s = jnp.sum(out.astype(jnp.float32)) * 1e-30
                    return X.with_data(X.data.at[0, 0].add(s))
                X = jax.lax.fori_loop(0, k, body, A)
                return jnp.sum(X.data[0])
            return jax.jit(f)

        t = chain_time(mk, (A,))
        print(f"{tag}: {t*1e3:.1f} ms  {(2/3)*N**3/t/1e12:.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
