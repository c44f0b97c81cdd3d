"""A/B: LU driver variants at 16384 f32 — tournament chunk height 8192,
fused pivot-row scatter, nb=2048.

prof_lu_panel.py (on-chip): _lu_slab(16384,1024) = 17.26 ms and is
~entirely _getrf_tall (8.14 ms per 512-wide sub-panel), of which ~5 ms
is the chunk getrf custom calls (area rate ~0.56 ns/elem — the f32
floor; bf16 lu does NOT compile on this stack). chunk=8192 measured
15.28 ms. The other lever is the driver's U12 row scatter:
`right.at[prow].set(U12)` forces a full (M, rest) copy per slab.
Fused trick: scatter (L11 - I) into Lphys at the pivot rows; then
  right_new = right - Lphys_aug @ U12
lands U12 on the pivot rows automatically (Arow - (L11 - I) U12 =
Arow - L11 U12 + U12 = U12 since Arow = L11 U12), removing the big
scatter entirely.

Run from repo root: python -u scratch/ab_lu5.py
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

import elementalx as El
from elementalx import DistMatrix
from elementalx.blas.gemm import hot_precision, local_gemm
from elementalx.blas.trinv import tri_inv_lower_unit
from elementalx.lapack import lu as lumod


def lu_variant(a, m, nb, fused):
    """The LU driver loop (lapack/lu.py LU) with optional fused
    pivot-row scatter."""
    M, N = a.shape
    i2 = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a = jnp.where((i2 == j2) & (i2 >= m), jnp.ones((), a.dtype), a)
    nblk = (m + nb - 1) // nb
    hp = hot_precision(a.dtype)
    rowmap = jnp.arange(M, dtype=jnp.int32)
    for k in range(nblk):
        k0 = k * nb
        tail = rowmap[k0:]
        cols = a[:, k0:k0 + nb]
        sl = jnp.take(cols, tail, axis=0, unique_indices=True)
        lu, lperm = lumod._lu_slab(sl)
        tail = jnp.take(tail, lperm, axis=0, unique_indices=True)
        rowmap = jax.lax.dynamic_update_slice(rowmap, tail, (k0,))
        cols = cols.at[tail].set(lu, unique_indices=True)
        a = jax.lax.dynamic_update_slice(a, cols, (0, k0))
        rest = N - k0 - nb
        if rest <= 0:
            continue
        L11 = lu[:nb, :]
        inv11 = tri_inv_lower_unit(L11)
        right = a[:, k0 + nb:]
        prow = tail[:nb]
        Arow = jnp.take(right, prow, axis=0, unique_indices=True)
        U12 = local_gemm(inv11, Arow, precision=hp)
        Lphys = jnp.zeros((M, nb), a.dtype).at[tail[nb:]].set(
            lu[nb:, :], unique_indices=True)
        if fused:
            # gemm first (Lphys is zero on the pivot rows), then scatter
            # U12 into the FRESH output buffer — XLA can update it in
            # place instead of copying `right` before the subtract.
            right = (right - local_gemm(Lphys, U12, precision=hp)
                     ).at[prow].set(U12, unique_indices=True)
        else:
            right = right.at[prow].set(U12, unique_indices=True)
            right = right - local_gemm(Lphys, U12, precision=hp)
        a = jax.lax.dynamic_update_slice(a, right, (0, k0 + nb))
    a = jnp.take(a, rowmap, axis=0, unique_indices=True)
    a = jnp.where((i2 == j2) & (i2 >= m), jnp.zeros((), a.dtype), a)
    return a, rowmap


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


def check(grid):
    rng = np.random.default_rng(3)
    n = 1536
    a0 = rng.standard_normal((n, n)).astype(np.float32)
    for fused in (False, True):
        for chunk in (4096,):
            out, rowmap = jax.jit(
                lambda x: lu_variant(x, n, 512, fused))(jnp.asarray(a0))
            out = np.asarray(out)[:n]
            rm = np.asarray(rowmap)[:n]
            L = np.tril(out, -1) + np.eye(n, dtype=np.float32)
            U = np.triu(out)
            resid = np.linalg.norm(L @ U - a0[rm]) / np.linalg.norm(a0)
            print(f"  fused={fused}: resid {resid:.2e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    if os.environ.get("CHECK", "1") != "0":
        check(grid)
    if os.environ.get("TIME", "1") == "0":
        return
    N = int(os.environ.get("N", 16384))
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))

    if os.environ.get("V0"):
        def mk_cur(k):
            def f(x):
                def body(_, X):
                    F, P = El.LU(DistMatrix.from_global(X, grid=grid))
                    s = jnp.sum(F.data.astype(jnp.float32)) * 1e-30
                    return X.at[0, 0].add(s.astype(X.dtype))
                X = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(X[0].astype(jnp.float32))
            return jax.jit(f)
        t = chain_time(mk_cur, (A,))
        print(f"V0 stock: {t*1e3:.1f} ms  {(2/3)*N**3/t/1e12:.1f} TF/s",
              flush=True)

    for tag, chunk, fused, nb in [
        ("V1 chunk8192", 8192, False, 1024),
        ("V2 chunk8192+fused", 8192, True, 1024),
        ("V4 chunk8192+fused nb2048", 8192, True, 2048),
    ]:
        lumod._GETRF_CHUNK = chunk

        def mk(k, nb=nb, fused=fused):
            def f(x):
                def body(_, X):
                    out, rm = lu_variant(X, N, nb, fused)
                    s = jnp.sum(out.astype(jnp.float32)) * 1e-30
                    return X.at[0, 0].add(s.astype(X.dtype))
                X = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(X[0].astype(jnp.float32))
            return jax.jit(f)
        t = chain_time(mk, (A,))
        print(f"{tag}: {t*1e3:.1f} ms  {(2/3)*N**3/t/1e12:.1f} TF/s",
              flush=True)
        lumod._GETRF_CHUNK = 4096


if __name__ == "__main__":
    main()
