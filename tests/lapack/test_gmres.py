"""FGMRES / LGMRES tests (reference: solve/{FGMRES,LGMRES}.hpp)."""

import numpy as np
import jax
import jax.numpy as jnp

import elementalx as El
from elementalx import DistMatrix
from elementalx.lapack import FGMRES, LGMRES


def _system(rng, n, complex_=False):
    a = rng.standard_normal((n, n))
    if complex_:
        a = a + 1j * rng.standard_normal((n, n))
    a = a + 3 * n * np.eye(n)
    b = rng.standard_normal(n)
    if complex_:
        b = b + 1j * rng.standard_normal(n)
    return a, b


def test_gmres_matrix_and_callable(rng):
    n = 48
    a, b = _system(rng, n)
    ref = np.linalg.solve(a, b)
    for fn in (FGMRES, LGMRES):
        x, its = fn(jnp.asarray(a), None, jnp.asarray(b),
                    rel_tol=1e-12, restart=16, max_its=96)
        assert np.linalg.norm(np.asarray(x) - ref) < 1e-9
        xc, _ = fn(lambda v: jnp.asarray(a) @ v, None, jnp.asarray(b),
                   rel_tol=1e-12, restart=16, max_its=96)
        assert np.linalg.norm(np.asarray(xc) - ref) < 1e-9


def test_gmres_preconditioned(rng):
    n = 48
    a, b = _system(rng, n)
    ref = np.linalg.solve(a, b)
    dinv = jnp.asarray(1.0 / np.diag(a))
    jac = lambda v: dinv * v  # noqa: E731
    for fn in (FGMRES, LGMRES):
        x, its = fn(jnp.asarray(a), jac, jnp.asarray(b),
                    rel_tol=1e-12, restart=12, max_its=96)
        assert np.linalg.norm(np.asarray(x) - ref) < 1e-9
        assert int(its) <= 96


def test_fgmres_variable_preconditioner(rng):
    """The 'flexible' part: a preconditioner that changes between
    applications (here: stateful alternating damping) still converges."""
    n = 40
    a, b = _system(rng, n)
    ref = np.linalg.solve(a, b)
    dinv = jnp.asarray(1.0 / np.diag(a))
    state = {"k": 0}

    def prec(v):
        state["k"] += 1
        return dinv * v * (1.0 if state["k"] % 2 else 0.7)

    x, _ = FGMRES(jnp.asarray(a), prec, jnp.asarray(b),
                  rel_tol=1e-12, restart=10, max_its=80)
    assert np.linalg.norm(np.asarray(x) - ref) < 1e-8


def test_gmres_complex_distmatrix_multirhs(grid, rng):
    n = 32
    a, _ = _system(rng, n, complex_=True)
    B = rng.standard_normal((n, 3)) + 1j * rng.standard_normal((n, 3))
    ref = np.linalg.solve(a, B)
    A = DistMatrix.from_global(a, grid=grid)
    Bd = DistMatrix.from_global(B, grid=grid)
    X, its = FGMRES(A, None, Bd, rel_tol=1e-12, restart=16, max_its=64)
    assert np.linalg.norm(np.asarray(X.global_array()) - ref) < 1e-8


def test_gmres_jittable(rng):
    n = 32
    a, b = _system(rng, n)
    ref = np.linalg.solve(a, b)

    @jax.jit
    def solve(aa, bb):
        return FGMRES(lambda v: aa @ v, None, bb,
                      rel_tol=1e-12, restart=16, max_its=48)[0]

    x = solve(jnp.asarray(a), jnp.asarray(b))
    assert np.linalg.norm(np.asarray(x) - ref) < 1e-9


def test_regularized_solve_after(grid, rng):
    """factor.hpp RegSolveCtrl path: the LDL of A + diag(reg)
    preconditions (F/L)GMRES on the unregularized indefinite system."""
    from elementalx.lapack import RegularizedLDL, RegularizedSolveAfter

    n = 36
    a = rng.standard_normal((n, n))
    a = a + a.T
    A = DistMatrix.from_global(a, grid=grid)
    reg = jnp.full((n,), 0.5)
    F = RegularizedLDL(A, reg, conjugate=True)
    b = rng.standard_normal((n, 2))
    B = DistMatrix.from_global(b, grid=grid)
    ref = np.linalg.solve(a, b)
    for alg in ("fgmres", "lgmres"):
        X = RegularizedSolveAfter(A, reg, F, B, alg=alg, rel_tol=1e-12,
                                  restart=8, max_its=64)
        got = np.asarray(X.global_array())
        assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-8, alg
