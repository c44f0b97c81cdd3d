"""A/B two-level compact-WY QR at N=16384 f32 on the attached TPU.

Current QR applies one compact-WY update of the FULL trailing matrix
per 256-wide panel: 64 full-trailing read+write passes at N=16384
(~Sigma (N-k)^2 * 3 passes of HBM traffic ~ 100 GB ~ way more than the
FLOP time). Two-level scheme: factor 256-panels with updates confined
to a wide slab, then ONE merged compact-WY application per slab
(build_wy_T is closed-form in V and tau, so the merged T needs no
incremental composition). Trailing traffic drops by slab/inner.

Run from repo root: python -u scratch/ab_qr2.py
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
from elementalx.blas.gemm import hot_precision
from elementalx.lapack.qr import _panel_qr
from elementalx.lapack.reflect import apply_block_reflector, build_wy_T


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


def _tril_unit(sl, diag_col0):
    r = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 1)
    V = jnp.where(r > c, sl, jnp.zeros_like(sl))
    return jnp.where(r == c, jnp.ones((), sl.dtype), V)


def qr_slab(a, m, n, outer, inner):
    M, N = a.shape
    ncols = min(m, n)
    tau = jnp.zeros((N,), a.dtype)
    hp = hot_precision(a.dtype)
    k0 = 0
    while k0 < ncols:
        w = min(outer, ncols - k0)
        j0 = 0
        while j0 < w:
            wi = min(inner, w - j0)
            a, tau = _panel_qr(a, tau, k0 + j0, wi, m)
            if j0 + wi < w:
                sl = a[k0 + j0:, k0 + j0:k0 + j0 + wi]
                V = _tril_unit(sl, k0 + j0)
                T = build_wy_T(V, jax.lax.dynamic_slice(
                    tau, (k0 + j0,), (wi,)))
                Asub = a[k0 + j0:, k0 + j0 + wi:k0 + w]
                upd = apply_block_reflector(V, T, Asub, adjoint=True,
                                            precision=hp)
                a = jax.lax.dynamic_update_slice(a, upd,
                                                 (k0 + j0, k0 + j0 + wi))
            j0 += wi
        if k0 + w < N:
            sl = a[k0:, k0:k0 + w]
            V = _tril_unit(sl, k0)
            T = build_wy_T(V, jax.lax.dynamic_slice(tau, (k0,), (w,)))
            Asub = a[k0:, k0 + w:]
            upd = apply_block_reflector(V, T, Asub, adjoint=True,
                                        precision=hp)
            a = jax.lax.dynamic_update_slice(a, upd, (k0, k0 + w))
        k0 += w
    return a, tau


def main():
    N = int(os.environ.get("N", 16384))
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)

    # correctness: slab QR must match the R of the library QR (small n)
    ns = 768
    asml = jnp.asarray(rng.standard_normal((ns, ns)).astype(np.float32))
    outs, _ = jax.jit(lambda x: qr_slab(x, ns, ns, 512, 256))(asml)
    Rs = jnp.triu(outs)
    res = jnp.linalg.norm(jnp.abs(Rs) - jnp.abs(
        jnp.triu(El.QR(DistMatrix.from_global(asml, grid=grid))
                 .packed.data[:ns, :ns]))) / jnp.linalg.norm(asml)
    print(f"slab |R| residual vs library (n={ns}): {float(res):.2e}",
          flush=True)

    if os.environ.get("V0"):
        def mk_cur(k):
            def f(A):
                def body(_, X):
                    F = El.QR(X)
                    s = jnp.sum(F.packed.data.astype(jnp.float32)) * 1e-30
                    return X.with_data(X.data.at[0, 0].add(s))
                X = jax.lax.fori_loop(0, k, body, A)
                return jnp.sum(X.data[0])
            return jax.jit(f)

        t = chain_time(mk_cur, (A,))
        print(f"V0 current: {t*1e3:.1f} ms  {(4/3)*N**3/t/1e12:.1f} TF/s",
              flush=True)

    # round 2: trailing traffic is NOT the bottleneck (1024/256 tied V0
    # at ~216 ms, 2048/256 lost). geqrf panel width is: (16384,256)
    # costs 2.33 ms vs (16384,128) 0.74 (prof_geqrf). Narrow inner
    # panels + slab-confined updates dodge the "extra full-trailing
    # passes" penalty that killed flat nb=128 (284.8 ms).
    for outer, inner in [(1024, 128), (512, 128), (1024, 64)]:
        def mk(k, outer=outer, inner=inner):
            def f(A):
                def body(_, X):
                    out, tau = qr_slab(X.data, N, N, outer, inner)
                    s = jnp.sum(out.astype(jnp.float32)) * 1e-30
                    return X.with_data(X.data.at[0, 0].add(s))
                X = jax.lax.fori_loop(0, k, body, A)
                return jnp.sum(X.data[0])
            return jax.jit(f)

        t = chain_time(mk, (A,))
        print(f"slab {outer}/{inner}: {t*1e3:.1f} ms  "
              f"{(4/3)*N**3/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
