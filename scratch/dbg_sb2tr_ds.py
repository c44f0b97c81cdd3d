"""Reconstruct the chased matrix from the kernel's final DS store and
compare its spectrum/diagonal against the emitted de records.

DS alignment after sweep j retires: DS[2b + r, l] = A[r, cb(r) + l],
cb(r) = j+2 + ((r - j - 2)//b - 2)*b  (pre-shifted for sweep j+1).
After the full j = 0..n-1 loop the final alignment is j+1 = n.

Run: python -u scratch/dbg_sb2tr_ds.py [n b]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack.sbr import band_reduce, _band_to_ds
from elementalx.kernels.sb2tr import sb2tr
from jax.experimental import pallas as pl  # noqa


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    ev0 = np.linalg.eigvalsh(a.astype(np.float64))
    a_band, _, _ = jax.jit(band_reduce, static_argnames='b')(
        jnp.asarray(a), b=b)
    ab = np.asarray(a_band)
    ds = _band_to_ds(a_band, b)

    # run the kernel and read BOTH outputs (ds_out via a re-plumb)
    from elementalx.kernels import sb2tr as K
    import functools
    from jax.experimental.pallas import tpu as pltpu
    from elementalx.lapack.sbr import chase_smax
    smax = chase_smax(n, b)
    kern = functools.partial(K._sb2tr_kernel, n=n, b=b, smax=smax)
    dso, vout, de = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(ds.shape, jnp.float32),
                   jax.ShapeDtypeStruct((n, smax, 1, b), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, 128), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((8 * b, 8 * b), jnp.float32),
            pltpu.VMEM((2 * smax, 1, b), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(ds)
    dso = np.asarray(dso)
    dev = np.asarray(de).reshape(n, 128)

    # reconstruct from the final store: row r is last retired in sweep
    # j = r-1, leaving alignment cb_r(r) = r + 1 - 3b, so
    # A[r, c] = DS[2b + r, c - r - 1 + 3b]
    T = np.zeros((n, n))
    for r in range(n):
        for l in range(4 * b):
            c = l + r + 1 - 3 * b
            if 0 <= c <= r:
                T[r, c] = dso[2 * b + r, l]
                T[c, r] = dso[2 * b + r, l]
    off = np.abs(T - np.diag(np.diagonal(T))
                 - np.diag(np.diagonal(T, -1), -1)
                 - np.diag(np.diagonal(T, 1), 1)).max()
    print(f"off-tridiagonal residue in DS: {off:.2e}", flush=True)
    d_ds = np.diagonal(T).copy()
    e_ds = np.diagonal(T, -1).copy()
    e_rec = dev[:n - 1, 0]
    d_rec = np.concatenate([ab[0:1, 0], dev[:n - 1, 1]])
    print(f"d(ds) vs d(de) max diff: {np.max(np.abs(d_ds-d_rec)):.2e}",
          flush=True)
    print(f"e(ds) vs e(de) max diff: {np.max(np.abs(e_ds-e_rec)):.2e}",
          flush=True)
    from scipy.linalg import eigh_tridiagonal
    ev_ds = eigh_tridiagonal(d_ds.astype(np.float64),
                             e_ds.astype(np.float64), eigvals_only=True)
    print(f"DS-tridiag drift vs A: {np.max(np.abs(ev_ds-ev0)):.2e}",
          flush=True)
    # where do the emitted records first diverge?
    bad_d = np.nonzero(np.abs(d_ds - d_rec) > 1e-3)[0]
    bad_e = np.nonzero(np.abs(e_ds - e_rec) > 1e-3)[0]
    print("first bad d idx:", bad_d[:8], " first bad e idx:", bad_e[:8],
          flush=True)
    # off-tridiagonal hotspots: which rows carry junk?
    mask = np.tri(n, n, -2, dtype=bool)
    rows_bad, cols_bad = np.nonzero(np.abs(np.where(mask, T, 0.0)) > 1e-3)
    if len(rows_bad):
        print("offband hotspots (r, c, |v|):", flush=True)
        for i in range(0, min(len(rows_bad), 200), max(1, len(rows_bad)//20)):
            r, c = rows_bad[i], cols_bad[i]
            print(f"  {r} {c} {abs(T[r, c]):.3e}", flush=True)
        print(f"  total {len(rows_bad)} entries; r range "
              f"[{rows_bad.min()}, {rows_bad.max()}], (r-c) values "
              f"{sorted(set((rows_bad-cols_bad).tolist()))[:12]}", flush=True)


if __name__ == "__main__":
    main()
