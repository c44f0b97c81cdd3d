"""Determinism check: run sb2tr repeatedly on the SAME input and diff.

Run: python -u scratch/dbg_sb2tr_det.py [n b reps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack.sbr import band_reduce, _band_to_ds
from elementalx.kernels.sb2tr import sb2tr


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    a_band, _, _ = jax.jit(band_reduce, static_argnames='b')(
        jnp.asarray(a), b=b)
    ds_host = np.asarray(_band_to_ds(a_band, b))
    ev0 = np.linalg.eigvalsh(a.astype(np.float64))
    from scipy.linalg import eigh_tridiagonal
    ab00 = float(np.asarray(a_band[0, 0]))
    outs = []
    for r in range(reps):
        ds = jnp.asarray(ds_host)  # fresh upload each time
        vout, de = sb2tr(ds, n, b)
        dev = np.asarray(de)
        vv = np.asarray(vout[:, :, :8])
        e = dev[:n - 1, 0]
        d = np.concatenate([[ab00], dev[:n - 1, 1]])
        ev1 = eigh_tridiagonal(d.astype(np.float64), e.astype(np.float64),
                               eigvals_only=True)
        drift = np.max(np.abs(ev1 - ev0))
        outs.append((dev.copy(), vv.copy()))
        diff = 0.0 if r == 0 else float(np.max(np.abs(dev - outs[0][0])))
        vdiff = 0.0 if r == 0 else float(np.max(np.abs(vv - outs[0][1])))
        print(f"rep {r}: drift {drift:.2e}  de-vs-rep0 {diff:.2e} "
              f"vout-vs-rep0 {vdiff:.2e}", flush=True)


if __name__ == "__main__":
    main()
