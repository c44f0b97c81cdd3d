"""Verify probe: public El.Cholesky at N>=12288 (new nb=512 branch) on TPU.

Residual ||A - L L^H||_F / ||A||_F computed on-device, scalar readback.
Run from repo root: python scratch/verify_chol_nb.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER


def main():
    N = int(os.environ.get("N", 12288))
    print("devices:", jax.devices(), flush=True)
    grid = El.Grid(devices=jax.devices())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N)).astype(np.float32) / np.sqrt(N)
    a = a @ a.T + 2.0 * np.eye(N, dtype=np.float32)

    for dtype in (jnp.float32, jnp.bfloat16):
        A = DistMatrix.from_global(jnp.asarray(a, dtype), grid=grid)

        @jax.jit
        def resid(A):
            L = El.Cholesky(LOWER, A)
            Ld = jnp.tril(L.data[:N, :N]).astype(jnp.float32)
            R = Ld @ Ld.T - A.data[:N, :N].astype(jnp.float32)
            return jnp.linalg.norm(R) / jnp.linalg.norm(
                A.data[:N, :N].astype(jnp.float32))

        r = float(resid(A))
        name = jnp.dtype(dtype).name
        eps = float(jnp.finfo(dtype).eps)
        ok = r < 100 * eps * np.sqrt(N)
        print(f"Cholesky N={N} {name}: residual {r:.3e} "
              f"(bound {100*eps*np.sqrt(N):.1e}) {'OK' if ok else 'FAIL'}",
              flush=True)
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
