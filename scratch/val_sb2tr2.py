"""Kernel-only eigenvalue validation at ring-wrapping sizes (sj > 8).

Run: python -u scratch/val_sb2tr2.py n b [n b ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack.sbr import band_reduce, _band_to_ds, chase_smax
from elementalx.kernels.sb2tr import sb2tr


def run(n, b):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    ev0 = np.linalg.eigvalsh(a.astype(np.float64))
    a_band, Vs, Ts = jax.jit(band_reduce, static_argnames='b')(
        jnp.asarray(a), b=b)
    ab = np.asarray(a_band)
    # stage-1-only check via banded eigensolver
    from scipy.linalg import eig_banded
    bands = np.zeros((b + 1, n))
    for k in range(b + 1):
        bands[k, :n - k] = np.diagonal(ab, -k)
    ev_band = eig_banded(bands, lower=True, eigvals_only=True)
    print(f"n={n} b={b}: stage1 drift {np.max(np.abs(ev_band-ev0)):.2e} "
          f"(smax {chase_smax(n, b)})", flush=True)
    ds = _band_to_ds(a_band, b)
    vout, de = sb2tr(ds, n, b)
    dev = np.asarray(de)
    e = dev[:n - 1, 0]
    d = np.concatenate([ab[0:1, 0], dev[:n - 1, 1]])
    from scipy.linalg import eigh_tridiagonal
    ev1 = eigh_tridiagonal(d.astype(np.float64), e.astype(np.float64),
                           eigvals_only=True)
    print(f"         stage2 drift {np.max(np.abs(ev1-ev0)):.2e}  "
          f"d absmax {np.abs(d).max():.1f} e absmax {np.abs(e).max():.1f}",
          flush=True)


def main():
    args = [int(x) for x in sys.argv[1:]] or [1024, 128, 2048, 128,
                                              2048, 256, 4096, 256]
    for i in range(0, len(args), 2):
        run(args[i], args[i + 1])


if __name__ == "__main__":
    main()
