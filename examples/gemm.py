"""Distributed GEMM example + micro-benchmark.

The analogue of the reference's tests/blas_like/Gemm.cpp driver: pick
sizes and an algorithm from the CLI, run every SUMMA variant, check the
associativity identity, print GFlop/s."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    # the axon plugin ignores the env var (it wins at registration);
    # honor an explicit CPU request by pinning via config (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import elementalx as El
from elementalx import DistMatrix
from elementalx.core.types import (
    GEMM_CANNON,
    GEMM_SUMMA_A,
    GEMM_SUMMA_B,
    GEMM_SUMMA_C,
    GEMM_XLA,
    NORMAL,
)
from elementalx.utils import Input, PrintInputReport, ProcessInput, Timer


def main():
    m = Input("--m", "height of C", 1024)
    n = Input("--n", "width of C", 1024)
    k = Input("--k", "inner dimension", 1024)
    ProcessInput()
    PrintInputReport()

    grid = El.Grid()
    print(f"grid: {grid}")
    rng = np.random.default_rng(0)
    A = DistMatrix.from_global(rng.standard_normal((m, k)).astype(np.float32),
                               grid=grid)
    B = DistMatrix.from_global(rng.standard_normal((k, n)).astype(np.float32),
                               grid=grid)

    for alg in (GEMM_XLA, GEMM_SUMMA_A, GEMM_SUMMA_B, GEMM_SUMMA_C):
        f = jax.jit(lambda A, B, a=alg: El.Gemm(NORMAL, NORMAL, 1.0, A, B,
                                                alg=a).data)
        out = f(A, B)
        jax.block_until_ready(out)
        t = Timer(alg.name)
        with t:
            out = f(A, B)
            jax.block_until_ready(out)
        gflops = 2.0 * m * n * k / max(t.total, 1e-9) / 1e9
        print(f"{alg.name:14s}: {t.total * 1e3:8.2f} ms  {gflops:10.1f} GFlop/s")


if __name__ == "__main__":
    main()
