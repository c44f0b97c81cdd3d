"""Distributed GEMM tests.

Mirrors the reference's tests/blas_like/Gemm.cpp: the associativity check
(αAB+βC)X == αA(BX)+βCX on random RHS (Gemm.cpp:27-61), run for every
algorithm and orientation combination, plus direct numpy cross-checks.
"""

import jax
import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.blas import Gemm
from elementalx.core.types import (
    ADJOINT,
    GEMM_CANNON,
    GEMM_SUMMA_A,
    GEMM_SUMMA_B,
    GEMM_SUMMA_C,
    GEMM_SUMMA_DOT,
    GEMM_XLA,
    NORMAL,
    TRANSPOSE,
)

ALGS = [GEMM_XLA, GEMM_SUMMA_A, GEMM_SUMMA_B, GEMM_SUMMA_C, GEMM_SUMMA_DOT]


def _rel_err(x, y):
    return np.linalg.norm(x - y) / max(np.linalg.norm(y), 1e-300)


@pytest.mark.parametrize("alg", ALGS, ids=lambda a: a.name)
def test_gemm_vs_numpy(grid, rng, alg):
    m, k, n = 35, 27, 22
    a = rng.standard_normal((m, k))
    b = rng.standard_normal((k, n))
    c = rng.standard_normal((m, n))
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    C = DistMatrix.from_global(c, grid=grid)
    out = Gemm(NORMAL, NORMAL, 2.0, A, B, beta=0.5, C=C, alg=alg)
    ref = 2.0 * a @ b + 0.5 * c
    assert _rel_err(out.global_array(), ref) < 1e-12


@pytest.mark.parametrize("oa", [NORMAL, TRANSPOSE, ADJOINT], ids="N T A".split())
@pytest.mark.parametrize("ob", [NORMAL, TRANSPOSE, ADJOINT], ids="N T A".split())
def test_gemm_orientations(grid, rng, oa, ob):
    m, k, n = 18, 14, 10
    a = rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k))
    b = rng.standard_normal((k, n)) + 1j * rng.standard_normal((k, n))

    def op(x, o):
        return x if o == NORMAL else (x.T if o == TRANSPOSE else x.conj().T)

    A = DistMatrix.from_global(op(a, oa).conj().T if oa == ADJOINT else
                               (op(a, oa).T if oa == TRANSPOSE else a), grid=grid)
    # simpler: build the stored operand S such that op(S) == a
    sa = {NORMAL: a, TRANSPOSE: a.T, ADJOINT: a.conj().T}[oa]
    sb = {NORMAL: b, TRANSPOSE: b.T, ADJOINT: b.conj().T}[ob]
    A = DistMatrix.from_global(sa, grid=grid)
    B = DistMatrix.from_global(sb, grid=grid)
    out = Gemm(oa, ob, 1.0, A, B)
    assert _rel_err(out.global_array(), a @ b) < 1e-12


@pytest.mark.parametrize("alg", ALGS + [GEMM_CANNON], ids=lambda a: a.name)
def test_gemm_associativity(square_grid, rng, alg):
    """(alpha A B + beta C) X == alpha A (B X) + beta (C X)
    (reference: Gemm.cpp TestAssociativity)."""
    m, k, n, nrhs = 24, 16, 20, 8
    a = rng.standard_normal((m, k))
    b = rng.standard_normal((k, n))
    c = rng.standard_normal((m, n))
    x = rng.standard_normal((n, nrhs))
    g = square_grid
    A, B, C, X = (DistMatrix.from_global(z, grid=g) for z in (a, b, c, x))
    alpha, beta = 3.0, -2.0
    ABC = Gemm(NORMAL, NORMAL, alpha, A, B, beta=beta, C=C, alg=alg)
    Y1 = Gemm(NORMAL, NORMAL, 1.0, ABC, X)
    BX = Gemm(NORMAL, NORMAL, 1.0, B, X, alg=alg)
    ABX = Gemm(NORMAL, NORMAL, alpha, A, BX, alg=alg)
    CX = Gemm(NORMAL, NORMAL, beta, C, X, alg=alg)
    Y2 = El.blas.level1.Add(ABX, CX)
    err = _rel_err(Y1.global_array(), Y2.global_array())
    assert err < 1e-12, f"associativity residual {err}"


def test_gemm_under_jit(grid, rng):
    m, k, n = 16, 16, 16
    a = rng.standard_normal((m, k))
    b = rng.standard_normal((k, n))
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)

    @jax.jit
    def f(A, B):
        return Gemm(NORMAL, NORMAL, 1.0, A, B)

    out = f(A, B)
    assert _rel_err(out.global_array(), a @ b) < 1e-12


def test_gemm_summa_c_blocked(grid, rng):
    """Blocked stationary-C with a small blocksize exercises the k-loop."""
    m, k, n = 16, 64, 16
    a = rng.standard_normal((m, k))
    b = rng.standard_normal((k, n))
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    out = Gemm(NORMAL, NORMAL, 1.0, A, B, alg=GEMM_SUMMA_C, blocksize=8)
    assert _rel_err(out.global_array(), a @ b) < 1e-12


def test_gemm_3d(grid, rng):
    """Depth-replicated 3-D GEMM (reference: experimental/g3d)."""
    from elementalx.blas.gemm import Gemm3D

    m, k, n = 16, 24, 16
    a = rng.standard_normal((m, k))
    b = rng.standard_normal((k, n))
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    out = Gemm3D(A, B, depth=2)
    assert _rel_err(out.global_array(), a @ b) < 1e-12


def test_gemm_default_aspect_heuristic(grid, rng):
    """GEMM_DEFAULT aspect-ratio dispatch (reference: Gemm/NN.hpp:910-931)
    behind use_explicit_summa: k >> m,n -> Dot; m << n -> stationary-B;
    n << m -> stationary-A; else stationary-C; GSPMD default otherwise."""
    from elementalx.blas.gemm import (
        GEMM_DEFAULT,
        _choose_algorithm,
        use_explicit_summa,
    )

    p = grid.size
    # default (GSPMD on): always XLA
    assert _choose_algorithm(8, 8, 1024, p) == GEMM_XLA
    use_explicit_summa(True)
    try:
        assert _choose_algorithm(8, 8, 1024, p) == GEMM_SUMMA_DOT
        assert _choose_algorithm(8, 1024, 32, p) == GEMM_SUMMA_B
        assert _choose_algorithm(1024, 8, 32, p) == GEMM_SUMMA_A
        assert _choose_algorithm(256, 256, 256, p) == GEMM_SUMMA_C
        # single-device grids always take the GSPMD path
        assert _choose_algorithm(8, 8, 1024, 1) == GEMM_XLA
        # numerics through the dispatched variants (DEFAULT resolves at
        # trace time; use_explicit_summa cleared the jit cache)
        for m, k, n in ((8, 64, 8), (8, 24, 64), (64, 24, 8),
                        (24, 24, 24)):
            a = rng.standard_normal((m, k))
            b = rng.standard_normal((k, n))
            A = DistMatrix.from_global(a, grid=grid)
            B = DistMatrix.from_global(b, grid=grid)
            out = Gemm(NORMAL, NORMAL, 1.0, A, B, alg=GEMM_DEFAULT)
            assert _rel_err(out.global_array(), a @ b) < 1e-12
    finally:
        use_explicit_summa(False)
    assert _choose_algorithm(8, 8, 1024, p) == GEMM_XLA
