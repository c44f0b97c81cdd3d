"""Time the two-stage SBR pieces at n=8192 on the TPU.

Chained differential timing with scalar readbacks (tunnel rules).
Run: python scratch/time_sbr.py [n b]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack.sbr import (band_reduce, _band_to_ds, sbr_tridiag,
                                   sbr_apply_q, _apply_q1, _apply_q2)
from elementalx.kernels.sb2tr import sb2tr


def timeit(tag, fn, *args, reps=3):
    out = fn(*args)
    s = float(jnp.sum(jax.tree.leaves(out)[0][..., :1]))  # warm + sync
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.sum(jax.tree.leaves(out)[0][..., :1]))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3:.1f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    A = jnp.asarray(a)

    br = jax.jit(band_reduce, static_argnames='b')
    out = timeit("stage1 band_reduce", lambda x: br(x, b=b)[0], A)
    a_band, Vs, Ts = br(A, b=b)

    b2d = jax.jit(_band_to_ds, static_argnames='b')
    ds = timeit("band_to_ds", lambda x: b2d(x, b), a_band)

    t0 = time.perf_counter()
    vout, de = sb2tr(ds, n, b)
    float(jnp.sum(de[0, :1]))
    print(f"sb2tr cold (incl compile): {time.perf_counter()-t0:.1f} s",
          flush=True)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        vout, de = sb2tr(ds, n, b)
        float(jnp.sum(de[0, :1]))
        best = min(best, time.perf_counter() - t0)
    print(f"stage2 sb2tr: {best*1e3:.1f} ms", flush=True)

    # backtransform on a full (n, n) Z
    Z = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

    import functools

    @functools.partial(jax.jit, static_argnames=('b',))
    def apply_all(Vs, Ts, vout, Z, b):
        Z = _apply_q2(vout, Z, Z.shape[0], b)
        return _apply_q1(Vs, Ts, Z, b)

    timeit("backtransform Q1Q2 (n x n)",
           lambda *x: apply_all(*x, b=b), Vs, Ts, vout, Z)

    @functools.partial(jax.jit, static_argnames=('b',))
    def apply_q2_only(vout, Z, b):
        return _apply_q2(vout, Z, Z.shape[0], b)

    timeit("  Q2 only", lambda *x: apply_q2_only(*x, b=b), vout, Z)


if __name__ == "__main__":
    main()
