"""Decompose the LU panel (_lu_slab) cost at 16384: where do ~150 ms
of panels go? Times _lu_slab on representative shapes, plus its
ingredients (_getrf chunks, tri_inv, slab gathers).
Run from repo root: python -u scratch/prof_lu_panel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack import lu as lumod
from elementalx.blas.trinv import tri_inv_lower_unit, tri_inv_upper


def chain_time(make_chain, args, k1=1, k2=5, reps=3):
    f1, f2 = make_chain(k1), make_chain(k2)
    jax.block_until_ready(f1(*args))
    jax.block_until_ready(f2(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f1(*args)[0]) if isinstance(f1(*args), tuple)
              else jnp.sum(f1(*args)))
        t1 = time.perf_counter()
        float(jnp.sum(f2(*args)[0]) if isinstance(f2(*args), tuple)
              else jnp.sum(f2(*args)))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best


def time_fn(tag, fn, *arrs, k1=1, k2=5):
    def mk(k):
        def f(*xs):
            def body(_, c):
                out = fn(*c)
                out0 = out[0] if isinstance(out, tuple) else out
                d = (jnp.sum(out0) * 1e-30).astype(xs[0].dtype)
                return (xs[0] + d.real if jnp.iscomplexobj(xs[0])
                        else xs[0] + d,) + xs[1:]
            c = jax.lax.fori_loop(0, k, body, xs)
            return jnp.sum(c[0])
        return jax.jit(f)

    f1, f2 = mk(k1), mk(k2)
    float(f1(*arrs))
    float(f2(*arrs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f1(*arrs))
        t1 = time.perf_counter()
        float(f2(*arrs))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    print(f"{tag}: {best*1e3:.2f} ms", flush=True)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # full slab at representative heights
    for Mt in (16384, 12288, 8192, 4096):
        sl = jnp.asarray(rng.standard_normal((Mt, 1024)).astype(np.float32))
        time_fn(f"_lu_slab ({Mt},1024)", lumod._lu_slab, sl)

    # getrf grain
    for shape in ((4096, 512), (8192, 512), (4096, 128), (4096, 1024),
                  (2048, 512)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        time_fn(f"lax.lu {shape}", lambda v: jax.lax.linalg.lu(v)[0], x)

    # tournament on a tall panel
    for shape in ((16384, 512), (16384, 1024)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        time_fn(f"_getrf_tall {shape}", lumod._getrf_tall, x)

    # triangular inversions
    for n in (512, 1024):
        t = jnp.asarray(
            np.tril(rng.standard_normal((n, n))).astype(np.float32)
            + n * np.eye(n, dtype=np.float32))
        time_fn(f"tri_inv_lower_unit {n}", tri_inv_lower_unit, t)
        time_fn(f"tri_inv_upper {n}", tri_inv_upper,
                jnp.asarray(t.T))

    # slab-height gather (the per-inner-panel take)
    for Mt in (16384,):
        sl = jnp.asarray(rng.standard_normal((Mt, 1024)).astype(np.float32))
        idx = jnp.asarray(rng.permutation(Mt).astype(np.int32))
        time_fn(f"take ({Mt},1024)", lambda s, i: jnp.take(
            s, i, axis=0, unique_indices=True), sl, idx)

    # tuning sweeps: inner sub-panel width and tournament chunk height
    sl = jnp.asarray(rng.standard_normal((16384, 1024)).astype(np.float32))
    for inner in (128, 256, 512):
        lumod._SLAB_INNER = inner
        time_fn(f"_lu_slab (16384,1024) inner={inner}", lumod._lu_slab, sl)
    lumod._SLAB_INNER = 512
    for chunk in (2048, 4096, 8192):
        lumod._GETRF_CHUNK = chunk
        time_fn(f"_lu_slab (16384,1024) chunk={chunk}", lumod._lu_slab, sl)
    lumod._GETRF_CHUNK = 4096


if __name__ == "__main__":
    main()
