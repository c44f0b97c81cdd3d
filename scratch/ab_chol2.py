"""A/B left-looking block-panel Cholesky at N=16384 on the TPU.

The recursive right-looking scheme pays (a) a log-depth concatenate
tree (~6 ms of HBM at 16384) and (b) FULL-SQUARE syrk trailing updates
(n^3/2 total MXU flops instead of the n^3/3 a triangle-aware scheme
needs; the 2x2 split was measured slower for bf16). LEFT-looking
updates touch only the current panel: the history product
L[k0:, :k0] @ L[k0:k0+nb, :k0]^H is exactly n^3/3 flops with no
triangle waste and no trailing-matrix writes at all.

Variants:
  V1 list-of-blocks history, one gemm per history block (no concat)
  V2 single preallocated L buffer via dynamic_update_slice
  V3 = V1 but history applied as ONE gemm on a concatenated slice
Run from repo root: python -u scratch/ab_chol2.py
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
from elementalx.blas.gemm import local_gemm
from elementalx.blas.trinv import tri_inv_lower


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


def chol_left(d, nb, store=None, precision=None, variant=1):
    """Left-looking blocked lower Cholesky of padded array d (pad diag
    already 1, lower triangle valid). Returns (M, M) lower factor in
    `store` dtype (or d.dtype)."""
    M = d.shape[0]
    sdt = store or d.dtype
    nblk = M // nb
    blocks = []
    Lbuf = jnp.zeros((M, M), sdt) if variant == 2 else None
    for k in range(nblk):
        k0 = k * nb
        h = M - k0
        pan = d[k0:, k0:k0 + nb]

        def mm(x, y):
            return jnp.matmul(x, y, precision=precision,
                              preferred_element_type=d.dtype)

        if k > 0:
            if variant == 2:
                hist = Lbuf[k0:, :k0]
                row = Lbuf[k0:k0 + nb, :k0]
                pan = pan - mm(hist, jnp.conj(row.T))
            elif variant == 3:
                hist = jnp.concatenate(
                    [b[k0 - j * nb:] for j, b in enumerate(blocks)],
                    axis=1)
                row = hist[:nb]
                pan = pan - mm(hist, jnp.conj(row.T))
            else:
                acc = pan
                for j, b in enumerate(blocks):
                    hj = b[k0 - j * nb:]
                    acc = acc - mm(hj, jnp.conj(hj[:nb].T))
                pan = acc
        a11 = pan[:nb].astype(d.dtype)
        l11 = jax.lax.linalg.cholesky(a11, symmetrize_input=False)
        inv11 = tri_inv_lower(l11)
        l21 = mm(pan[nb:], jnp.conj(inv11.T).astype(pan.dtype))
        blk = jnp.concatenate([l11.astype(sdt), l21.astype(sdt)], axis=0)
        if variant == 2:
            Lbuf = jax.lax.dynamic_update_slice(Lbuf, blk, (k0, k0))
        else:
            blocks.append(blk)
    if variant == 2:
        return Lbuf
    cols = [jnp.concatenate(
        [jnp.zeros((k * nb, nb), sdt), blocks[k]], axis=0)
        for k in range(nblk)]
    return jnp.concatenate(cols, axis=1)


def main():
    N = int(os.environ.get("N", 16384))
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32)
    spd = a @ a.T + N * np.eye(N, dtype=np.float32)
    for dt, store, prec, nbs in [
            (jnp.bfloat16, jnp.bfloat16, jax.lax.Precision.DEFAULT,
             (1024, 2048)),
            (jnp.float32, None, jax.lax.Precision.HIGH, (2048,))]:
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

        for variant in (1, 2):
            for nb in nbs:
                def mk(k, nb=nb, variant=variant):
                    def f(A):
                        def body(_, X):
                            dd = X.data.astype(jnp.float32) \
                                if store else X.data
                            L = chol_left(dd, nb, store=store,
                                          precision=prec, variant=variant)
                            s = jnp.sum(L.astype(jnp.float32)) * 1e-30
                            return X.with_data(X.data.at[0, 0].add(
                                s.astype(X.dtype)))
                        X = jax.lax.fori_loop(0, k, body, A)
                        return jnp.sum(X.data[0].astype(jnp.float32))
                    return jax.jit(f)

                t = chain_time(mk, (A,))
                print(f"V{variant} left nb={nb} {name}: {t*1e3:.1f} ms  "
                      f"{N**3/3/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
