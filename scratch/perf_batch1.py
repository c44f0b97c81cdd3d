"""Batched TPU perf experiments: Cholesky bf16 store path, f32 HIGH
precision for Cholesky/LU/QR. Run from repo root (axon tunnel).

Prints one line per experiment; residual checks at n=4096 for HIGH.
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
from elementalx.core.types import LOWER, NORMAL


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


def dep(a, out):
    s = jnp.sum(jnp.real(out).astype(jnp.float32)) * 1e-30
    return a.at[0, 0].add(s.astype(a.dtype))


def make_hpd(n):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    return a @ a.T + 2.0 * np.eye(n, dtype=np.float32)


def time_chol(N, nb, store_bf16):
    from elementalx.lapack.cholesky import _chol_lower_rec

    a = jnp.asarray(make_hpd(N))

    def mk(k):
        def f(a):
            def body(_, x):
                if store_bf16:
                    L = _chol_lower_rec(x, nb, jax.lax.Precision.DEFAULT,
                                        jnp.bfloat16)
                else:
                    L = _chol_lower_rec(x, nb, jax.lax.Precision.HIGH)
                return dep(a, L)
            x = jax.lax.fori_loop(0, k, body, a)
            return jnp.sum(x)
        return jax.jit(f)

    t = chain_time(mk, (a,))
    tf = (N ** 3 / 3) / t / 1e12
    tag = "bf16store" if store_bf16 else "f32-HIGH"
    print(f"chol {tag} N={N} nb={nb}: {t*1e3:.1f} ms  {tf:.1f} TF/s",
          flush=True)
    return t


def time_fact(N, which, precision_name, nb=None):
    """LU or QR at the given library gemm precision."""
    from elementalx.blas import gemm as gemm_mod

    old = gemm_mod._PRECISION
    gemm_mod._PRECISION = getattr(jax.lax.Precision, precision_name)
    try:
        grid = El.Grid(devices=jax.devices()[:1])
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)

        if which == "lu":
            from elementalx.lapack.lu import LU

            def mk(k):
                def f(a):
                    def body(_, x):
                        A = DistMatrix.from_global(x, grid=grid)
                        F, p = LU(A, blocksize=nb) if nb else LU(A)
                        return dep(a, F.data)
                    x = jax.lax.fori_loop(0, k, body, a)
                    return jnp.sum(x)
                return jax.jit(f)
            flops = 2 * N ** 3 / 3
        else:
            from elementalx.lapack.qr import QR

            def mk(k):
                def f(a):
                    def body(_, x):
                        A = DistMatrix.from_global(x, grid=grid)
                        fact = QR(A, blocksize=nb) if nb else QR(A)
                        return dep(a, fact.packed.data)
                    x = jax.lax.fori_loop(0, k, body, a)
                    return jnp.sum(x)
                return jax.jit(f)
            flops = 4 * N ** 3 / 3

        t = chain_time(mk, (a,), k1=1, k2=2, reps=3)
        print(f"{which} f32-{precision_name} N={N} nb={nb}: {t*1e3:.1f} ms  "
              f"{flops/t/1e12:.1f} TF/s", flush=True)
        return t
    finally:
        gemm_mod._PRECISION = old


def residual_check(N=4096):
    """Scaled residuals of HIGH-precision f32 LU/QR/Cholesky solves."""
    from elementalx.blas import gemm as gemm_mod
    from elementalx.lapack.lu import LU, SolveAfter as LUSolve

    grid = El.Grid(devices=jax.devices()[:1])
    rng = np.random.default_rng(2)
    a = rng.standard_normal((N, N)).astype(np.float32)
    b = rng.standard_normal((N, 8)).astype(np.float32)
    eps = np.finfo(np.float32).eps
    for prec in ("HIGHEST", "HIGH"):
        old = gemm_mod._PRECISION
        gemm_mod._PRECISION = getattr(jax.lax.Precision, prec)
        try:
            A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
            B = DistMatrix.from_global(jnp.asarray(b), grid=grid)
            F, p = LU(A)
            X = LUSolve(F, p, B)
            # on-device residual (avoid big readbacks over the tunnel)
            R = jnp.abs(a @ X.data[:N, :8] - b).max()
            scaled = float(R) / (eps * N * np.abs(b).max())
            print(f"LU f32-{prec} N={N} scaled resid: {scaled:.2f}",
                  flush=True)
        finally:
            gemm_mod._PRECISION = old


if __name__ == "__main__":
    which = os.environ.get("EXP", "all")
    if which in ("all", "chol"):
        time_chol(16384, 1024, True)
        time_chol(16384, 2048, True)
        time_chol(16384, 2048, False)
    if which in ("all", "lu"):
        time_fact(16384, "lu", "HIGH")
    if which in ("all", "qr"):
        time_fact(16384, "qr", "HIGH")
    if which in ("all", "resid"):
        residual_check(4096)
