"""Validate kernels/sb2tr.py against the dense stage-2 reference.

Run: python scratch/val_sb2tr.py [n b]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack.sbr import (band_reduce, _band_to_ds, _sb2tr_dense,
                                   sbr_tridiag, sbr_apply_q, chase_smax)
from elementalx.kernels.sb2tr import sb2tr


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    ev0 = np.linalg.eigvalsh(a.astype(np.float64))

    a_band, Vs, Ts = jax.jit(band_reduce, static_argnames='b')(
        jnp.asarray(a), b=b)
    ds = _band_to_ds(a_band, b)
    t0 = time.perf_counter()
    vout, de = sb2tr(ds, n, b)
    dev = np.asarray(de)
    t1 = time.perf_counter()
    e = dev[:n - 1, 0]
    d = np.concatenate([np.asarray(a_band)[0:1, 0], dev[:n - 1, 1]])
    T = np.diag(d.astype(np.float64)) + np.diag(e.astype(np.float64), -1) \
        + np.diag(e.astype(np.float64), 1)
    ev1 = np.linalg.eigvalsh(T)
    print(f"kernel n={n} b={b}: eig drift {np.max(np.abs(ev1-ev0)):.2e} "
          f"(wall incl compile {t1-t0:.1f}s)", flush=True)

    # vout vs dense reference
    at_ref, vout_ref = jax.jit(_sb2tr_dense, static_argnames='b')(
        a_band, b)
    vr = np.asarray(vout_ref)
    vk = np.asarray(vout)
    dref = np.asarray(jnp.diagonal(at_ref))
    eref = np.asarray(jnp.diagonal(at_ref, -1))
    print(f"  d vs ref {np.max(np.abs(d-dref)):.2e}  "
          f"e vs ref {np.max(np.abs(e-eref)):.2e}  "
          f"vout vs ref {np.max(np.abs(vk-vr)):.2e}", flush=True)

    # end-to-end residual through the driver path (kernel)
    from elementalx.lapack.sbr import SBRFactorization
    fact = SBRFactorization(Vs, Ts, vout, jnp.asarray(d), jnp.asarray(e))
    Z = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    QZ = np.asarray(sbr_apply_q(fact, Z, b))
    TZ = T.astype(np.float32) @ np.asarray(Z)
    QTZ = np.asarray(sbr_apply_q(fact, jnp.asarray(TZ), b))
    resid = np.max(np.abs(a @ QZ - QTZ)) / np.max(np.abs(a))
    print(f"  backtransform resid {resid:.2e}", flush=True)


if __name__ == "__main__":
    main()
