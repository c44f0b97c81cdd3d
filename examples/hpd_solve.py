"""Cholesky solve example — the reference's tests/lapack_like/Cholesky.cpp
driver shape: factor a random HPD matrix, solve, report the scaled
residual that must be < 100."""

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
from elementalx.core.types import LOWER, NORMAL
from elementalx.lapack.cholesky import Cholesky, SolveAfter
from elementalx.utils import Input, ProcessInput


def main():
    n = Input("--n", "matrix size", 1000)
    nrhs = Input("--nrhs", "right-hand sides", 10)
    ProcessInput()
    grid = El.Grid()
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n))
    a = a @ a.T + n * np.eye(n)
    y = rng.standard_normal((n, nrhs))
    A = DistMatrix.from_global(a, grid=grid)
    Y = DistMatrix.from_global(y, grid=grid)
    L = Cholesky(LOWER, A)
    X = SolveAfter(LOWER, NORMAL, L, Y)
    x = X.global_array()
    eps = np.finfo(x.dtype).eps
    resid = np.max(np.abs(a @ x - y)) / (eps * n * np.max(np.abs(y)))
    print(f"scaled residual ||AX-Y||/(eps n ||Y||) = {resid:.3f} "
          f"({'PASS' if resid < 100 else 'FAIL'})")


if __name__ == "__main__":
    main()
