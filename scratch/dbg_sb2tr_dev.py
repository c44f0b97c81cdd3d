"""Device-only double-run: is the chase kernel deterministic given a
device-resident input (no host re-upload between runs)?

Run: python -u scratch/dbg_sb2tr_dev.py [n b]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    ev0 = np.linalg.eigvalsh(a.astype(np.float64))
    A = jnp.asarray(a)
    a_band, _, _ = jax.jit(band_reduce, static_argnames='b')(A, b=b)
    ds = jax.jit(_band_to_ds, static_argnames='b')(a_band, b)
    print("ds checksum:", float(jnp.sum(ds * ds)), flush=True)

    des = []
    vos = []
    for r in range(3):
        dsc = ds + 0.0    # device-side copy (donation-safe)
        vout, de = sb2tr(dsc, n, b, no_vout=os.environ.get("NOVOUT") == "1")
        des.append(de)
        vos.append(vout)
        if r:
            dd = float(jnp.max(jnp.abs(des[r] - des[0])))
            vd = float(jnp.max(jnp.abs(vos[r] - vos[0])))
            print(f"run {r}: de-vs-run0 {dd:.2e}  vout-vs-run0 {vd:.2e}",
                  flush=True)
    dev = np.asarray(des[0])
    e = dev[:n - 1, 0]
    d = np.concatenate([np.asarray(a_band[0:1, 0]), dev[:n - 1, 1]])
    from scipy.linalg import eigh_tridiagonal
    ev1 = eigh_tridiagonal(d.astype(np.float64), e.astype(np.float64),
                           eigvals_only=True)
    print(f"drift {np.max(np.abs(ev1 - ev0)):.2e}", flush=True)


if __name__ == "__main__":
    main()
