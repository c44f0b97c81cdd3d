"""A/B: fused Pallas pivoted-panel LU (kernels/getrf.py) vs XLA's
LuDecompositionBlock custom call.

Correctness: reconstruction P A = L U at (512, 128) / (1024, 256) /
(4096, 512) against numpy f64. Perf: per-call time for the panel
shapes the LU driver actually issues at N=16384 (nb=1024, inner 512,
tournament chunks 4096): (4096, 512), (2048, 512), (4096, 256).

Run from repo root: python -u scratch/ab_getrf.py   (TPU)
        FORCE_CPU=1 INTERP=1 python -u scratch/ab_getrf.py  (interpreter)
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

from elementalx.kernels.getrf import pallas_getrf

INTERP = os.environ.get("INTERP", "0") == "1"


def check(Mt, w, ib=128, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((Mt, w)).astype(np.float32)
    packed, lperm = jax.jit(
        lambda x: pallas_getrf(x, interpret=INTERP))(jnp.asarray(a))
    packed = np.asarray(packed, np.float64)
    lperm = np.asarray(lperm)
    assert sorted(lperm.tolist()) == list(range(Mt)), "lperm not a permutation"
    Lfull = np.tril(packed[:, :w], -1)
    Lfull[np.arange(w), np.arange(w)] = 1.0
    U = np.triu(packed[:w, :w])
    rec = Lfull @ U
    ref = a[lperm].astype(np.float64)
    resid = np.linalg.norm(rec - ref) / np.linalg.norm(a)
    # partial-pivot growth check: multipliers bounded by 1
    lmax = np.abs(Lfull - np.triu(Lfull)).max()
    print(f"  ({Mt},{w}) ib={ib}: resid {resid:.2e}  max|l| {lmax:.3f}",
          flush=True)
    assert resid < 1e-5, resid
    assert lmax <= 1.0 + 1e-6, lmax


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


def time_panel(Mt, w, ib):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((Mt, w)).astype(np.float32))

    def mk_pallas(k):
        def f(x):
            def body(_, X):
                out, piv = pallas_getrf(X)
                s = jnp.sum(out) * 1e-30 + jnp.sum(piv).astype(
                    jnp.float32) * 1e-30
                return X.at[0, 0].add(s)
            X = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(X[0])
        return jax.jit(f)

    def mk_xla(k):
        def f(x):
            def body(_, X):
                lu, _, lperm = jax.lax.linalg.lu(X)
                s = jnp.sum(lu) * 1e-30 + jnp.sum(lperm).astype(
                    jnp.float32) * 1e-30
                return X.at[0, 0].add(s)
            X = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(X[0])
        return jax.jit(f)

    tp = chain_time(mk_pallas, (a,))
    tx = chain_time(mk_xla, (a,))
    print(f"({Mt},{w}) ib={ib}: pallas {tp*1e3:.3f} ms  "
          f"xla {tx*1e3:.3f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    check(512, 128)
    check(1024, 256)
    if os.environ.get("BIGCHECK", "1") == "1" and not INTERP:
        check(4096, 512)
        check(6144, 512)
    if os.environ.get("TIME", "1") == "1" and not INTERP:
        time_panel(8192, 512, 128)
        time_panel(4096, 512, 128)
        time_panel(2048, 512, 128)
        time_panel(6144, 512, 128)
        time_panel(4096, 256, 16)
        time_panel(2048, 256, 16)


if __name__ == "__main__":
    main()
