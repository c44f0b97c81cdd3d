"""Spectral example: HermitianEig (tridiag + SDC paths) and QDWH-SVD."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    # the axon plugin ignores the env var (it wins at registration);
    # honor an explicit CPU request by pinning via config (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import LOWER
from elementalx.lapack.hermitian_eig import HermitianEig, HermitianEigSDC
from elementalx.utils import Input, ProcessInput, Timer


def main():
    n = Input("--n", "matrix size", 256)
    ProcessInput()
    grid = El.Grid()
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n))
    a = a + a.T
    A = DistMatrix.from_global(a, grid=grid)
    with Timer("tridiag") as t1:
        w, Q = HermitianEig(LOWER, A)
    q = Q.global_array()
    r1 = np.linalg.norm(a @ q - q * np.asarray(w)[None, :]) / np.linalg.norm(a)
    print(f"tridiag path: {t1.total:.2f}s residual {r1:.2e}")
    with Timer("sdc") as t2:
        w2, Q2 = HermitianEigSDC(LOWER, A)
    q2 = Q2.global_array()
    r2 = np.linalg.norm(a @ q2 - q2 * np.asarray(w2)[None, :]) / \
        np.linalg.norm(a)
    print(f"SDC path:     {t2.total:.2f}s residual {r2:.2e}")

    U, s, V = El.SVD(A)
    rec = (U.global_array() * np.asarray(s)) @ V.global_array().conj().T
    print(f"QDWH-SVD reconstruction {np.linalg.norm(rec - a) / np.linalg.norm(a):.2e}")


if __name__ == "__main__":
    main()
