"""Stage-by-stage finiteness/accuracy check of the SBR eig path at 8192.

Run: python -u scratch/dbg_sbr8192.py [n]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from elementalx.lapack.sbr import sbr_tridiag, sbr_apply_q
from elementalx.lapack.tridiag_eig import tridiag_eig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    b = 256
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(1)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    A = jnp.asarray(a)

    fact = sbr_tridiag(A, b=b)
    d = np.asarray(fact.d)
    e = np.asarray(fact.e)
    print("d finite:", np.all(np.isfinite(d)), " e finite:",
          np.all(np.isfinite(e)), flush=True)
    print("d range:", d.min(), d.max(), " e absmax:",
          np.abs(e).max(), flush=True)
    vmax = float(jnp.max(jnp.abs(fact.vout)))
    print("vout absmax:", vmax, flush=True)

    # tridiagonal eigen spectrum vs scipy banded
    try:
        from scipy.linalg import eigh_tridiagonal
        evT = eigh_tridiagonal(d.astype(np.float64), e.astype(np.float64),
                               eigvals_only=True)
        print("T spectrum range:", evT[0], evT[-1], flush=True)
    except Exception as ex:
        print("scipy unavailable:", ex, flush=True)
        evT = None

    w, Z = tridiag_eig(jnp.asarray(d), jnp.asarray(e))
    wn = np.asarray(w)
    print("w finite:", np.all(np.isfinite(wn)), " Z finite:",
          bool(jnp.all(jnp.isfinite(Z))), flush=True)
    if evT is not None:
        print("w vs T spectrum drift:",
              np.max(np.abs(np.sort(wn) - evT)), flush=True)

    Zp = jnp.asarray(np.asarray(Z, np.float32))
    Q = sbr_apply_q(fact, Zp, b)
    qfin = bool(jnp.all(jnp.isfinite(Q)))
    print("Q finite:", qfin, flush=True)
    # residual on a random subset of 512 columns (cheap)
    idx = np.sort(rng.choice(n, 512, replace=False))
    Qs = Q[:, idx]
    R = jnp.matmul(A, Qs, precision=jax.lax.Precision.HIGHEST) \
        - Qs * jnp.asarray(wn[idx])[None, :]
    rel = float(jnp.max(jnp.abs(R))) / max(float(np.max(np.abs(wn))), 1e-30)
    orto = float(jnp.max(jnp.abs(
        jnp.matmul(Qs.T, Qs, precision=jax.lax.Precision.HIGHEST)
        - jnp.eye(512, dtype=jnp.float32))))
    print(f"subset resid {rel:.2e}  subset ortho {orto:.2e}", flush=True)


if __name__ == "__main__":
    main()
