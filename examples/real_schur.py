"""Real Schur example: quasi-triangular form + quasi solvers + eigenvectors.

The real path keeps every factor in real dtypes end-to-end, so it runs
on accelerators whose transfer path lacks complex support (reference:
spectral/HessenbergSchur real path; blas_like QuasiTrsm family).

Run from the repo root:
    python examples/real_schur.py --n 300
"""

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
from elementalx.blas import MultiShiftQuasiTrsm, QuasiTrsm
from elementalx.core.types import LEFT, NORMAL, UPPER
from elementalx.lapack import Eig, Schur
from elementalx.utils import Input, ProcessInput, Timer


def main():
    n = Input("--n", "matrix size", 300)
    ProcessInput()
    grid = El.Grid()
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n))
    A = DistMatrix.from_global(a, grid=grid)

    with Timer("real Schur") as t:
        dec = Schur(A)  # real input -> quasi-triangular T, orthogonal Z
    T = dec.T.global_array()
    Z = dec.Z.global_array()
    resid = np.linalg.norm(Z @ T @ Z.T - a) / np.linalg.norm(a)
    ortho = np.linalg.norm(Z.T @ Z - np.eye(n))
    print(f"real Schur: {t.total:.2f}s  ||ZTZ'-A||/||A|| = {resid:.2e}  "
          f"||Z'Z-I|| = {ortho:.2e}")
    w = np.asarray(dec.w)
    print(f"eigenvalues: {np.sum(np.abs(w.imag) > 0)} complex, "
          f"{np.sum(w.imag == 0)} real")

    # quasi-triangular solves against the real Schur factor
    b = rng.standard_normal((n, 4))
    X = QuasiTrsm(LEFT, UPPER, NORMAL, 1.0, dec.T,
                  DistMatrix.from_global(b, grid=grid))
    r = np.linalg.norm(T @ X.global_array() - b) / np.linalg.norm(b)
    print(f"QuasiTrsm residual: {r:.2e}")

    shifts = rng.standard_normal(4) * 0.1
    Xs = MultiShiftQuasiTrsm(LEFT, UPPER, NORMAL, 1.0, dec.T,
                             shifts, DistMatrix.from_global(b, grid=grid))
    xs = Xs.global_array()
    rs = max(np.linalg.norm((T - s * np.eye(n)) @ xs[:, j] - b[:, j])
             for j, s in enumerate(shifts)) / np.linalg.norm(b)
    print(f"MultiShiftQuasiTrsm residual: {rs:.2e}")

    # full eigendecomposition through the same real pipeline
    with Timer("Eig") as t2:
        wv, V = Eig(A)
    v = V.global_array()
    re = np.linalg.norm(a @ v - v * np.asarray(wv)[None, :]) / \
        np.linalg.norm(a)
    print(f"Eig: {t2.total:.2f}s  ||AV - V diag(w)||/||A|| = {re:.2e}")


if __name__ == "__main__":
    main()
