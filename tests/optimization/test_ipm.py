"""IPM tests: random LPs vs scipy.linprog, QP KKT checks, netlib MPS
instances from the reference's data/optimization/."""

import os

import numpy as np
import pytest

from elementalx.optimization import LP, QP, read_mps

REF_DATA = "/root/reference/data/optimization"

# known optima of the shipped netlib instances
NETLIB_OPT = {
    "afiro.mps": -464.75314286,
    "adlittle.mps": 225494.96316,
    "share2b.mps": -415.73224074,
    "share1b.mps": -76589.318579,
}


def _random_lp(rng, m, n):
    A = rng.standard_normal((m, n))
    x0 = np.abs(rng.standard_normal(n)) + 0.1  # feasible interior point
    b = A @ x0
    # c = A^T y + s with s > 0 => dual feasible => bounded
    c = A.T @ rng.standard_normal(m) + np.abs(rng.standard_normal(n)) + 0.05
    return A, b, c


def test_lp_random_vs_scipy(rng):
    from scipy.optimize import linprog

    m, n = 6, 14
    A, b, c = _random_lp(rng, m, n)
    sol = LP(A, b, c)
    assert sol.converged
    ref = linprog(c, A_eq=A, b_eq=b, bounds=(0, None), method="highs")
    assert ref.success
    assert abs(sol.primal_obj - ref.fun) < 1e-5 * (1 + abs(ref.fun))
    np.testing.assert_allclose(A @ sol.x, b, atol=1e-6)
    assert sol.x.min() > -1e-9
    # duality gap closed
    assert abs(sol.primal_obj - sol.dual_obj) < 1e-5 * (1 + abs(sol.primal_obj))


def test_lp_sparse_kkt(rng):
    m, n = 5, 10
    A, b, c = _random_lp(rng, m, n)
    sol = LP(A, b, c, use_sparse=True)
    assert sol.converged
    from scipy.optimize import linprog

    ref = linprog(c, A_eq=A, b_eq=b, bounds=(0, None), method="highs")
    assert abs(sol.primal_obj - ref.fun) < 1e-5 * (1 + abs(ref.fun))


def test_qp_kkt(rng):
    m, n = 4, 10
    A = rng.standard_normal((m, n))
    x0 = np.abs(rng.standard_normal(n)) + 0.1
    b = A @ x0
    G = rng.standard_normal((n, n))
    Q = G @ G.T + np.eye(n)
    c = rng.standard_normal(n)
    sol = QP(Q, A, b, c)
    assert sol.converged
    x, y, z = sol.x, sol.y, sol.z
    np.testing.assert_allclose(A @ x, b, atol=1e-6)
    assert x.min() > -1e-9 and z.min() > -1e-9
    # stationarity: Qx + c - A^T y - z = 0
    np.testing.assert_allclose(Q @ x + c - A.T @ y - z,
                               np.zeros(n), atol=1e-5)
    # complementarity
    assert np.abs(x * z).max() < 1e-6


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference data not mounted")
@pytest.mark.parametrize("inst", ["afiro.mps", "adlittle.mps",
                                  "share2b.mps", "share1b.mps"])
def test_netlib_mps(inst):
    prob = read_mps(os.path.join(REF_DATA, inst))
    sol = LP(prob.A, prob.b, prob.c, max_its=300)
    obj = sol.primal_obj + prob.objective_shift
    ref = NETLIB_OPT[inst]
    assert sol.converged, f"{inst} did not converge"
    assert abs(obj - ref) / (1 + abs(ref)) < 1e-5, f"{inst}: {obj} vs {ref}"


def test_socp_known_solution():
    """Single cone, x_bar pinned: optimum x0 = ||x_bar||."""
    from elementalx.optimization.socp import SOCP

    A = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    b = np.array([3.0, 4.0])
    c = np.array([1.0, 0.0, 0.0])
    sol = SOCP(A, b, c, dims=[3])
    assert sol.converged
    assert abs(sol.primal_obj - 5.0) < 1e-6  # ||(3,4)|| = 5
    np.testing.assert_allclose(sol.x[1:], [3.0, 4.0], atol=1e-7)


def test_socp_random_kkt(rng):
    """Random feasible SOCP: check KKT conditions at the solution."""
    from elementalx.optimization.socp import SOCP, _blocks, _in_cone_margin

    dims = [3, 4, 5]
    n = sum(dims)
    m = 4
    blocks = _blocks(dims)
    # strictly feasible primal/dual construction
    xstar = np.zeros(n)
    zstar = np.zeros(n)
    for sl in blocks:
        v = rng.standard_normal(sl.stop - sl.start - 1)
        xstar[sl] = np.concatenate([[np.linalg.norm(v) + 1.0], v])
        w = rng.standard_normal(sl.stop - sl.start - 1)
        zstar[sl] = np.concatenate([[np.linalg.norm(w) + 1.0], w])
    A = rng.standard_normal((m, n))
    b = A @ xstar
    ystar = rng.standard_normal(m)
    c = A.T @ ystar + zstar
    sol = SOCP(A, b, c, dims)
    assert sol.converged
    np.testing.assert_allclose(A @ sol.x, b, atol=1e-6)
    assert _in_cone_margin(sol.x, blocks) > -1e-9
    assert _in_cone_margin(sol.z, blocks) > -1e-9
    np.testing.assert_allclose(A.T @ sol.y + sol.z, c, atol=1e-6)
    gap = sol.x @ sol.z
    assert gap < 1e-6 * (1 + abs(sol.primal_obj))
    # primal obj ~ dual obj
    assert abs(sol.primal_obj - sol.dual_obj) < 1e-5 * (1 + abs(sol.primal_obj))


def test_socp_vs_slsqp(rng):
    """Cross-check a small instance against scipy SLSQP."""
    from scipy.optimize import NonlinearConstraint, minimize

    from elementalx.optimization.socp import SOCP

    dims = [4]
    n = 4
    m = 2
    A = rng.standard_normal((m, n))
    x0 = np.array([3.0, 0.5, -0.5, 1.0])
    b = A @ x0
    z0 = np.array([2.0, 0.3, 0.2, -0.1])
    c = A.T @ rng.standard_normal(m) + z0
    sol = SOCP(A, b, c, dims)
    assert sol.converged

    cons = [
        {"type": "eq", "fun": lambda x: A @ x - b},
        {"type": "ineq",
         "fun": lambda x: x[0] - np.linalg.norm(x[1:]) },
    ]
    ref = minimize(lambda x: c @ x, x0, constraints=cons, method="SLSQP",
                   options={"maxiter": 300, "ftol": 1e-12})
    assert ref.success
    assert abs(sol.primal_obj - ref.fun) < 1e-5 * (1 + abs(ref.fun))


def test_lp_regularized_solver(rng):
    """solver='reg': the KKT Newton systems through RegularizedLDL +
    FGMRES (the reference's REG_SOLVE_FGMRES IPM architecture) reach
    the same optimum as the direct solves."""
    m, n = 6, 14
    A, b, c = _random_lp(rng, m, n)
    s_dir = LP(A, b, c)
    s_reg = LP(A, b, c, solver="reg")
    assert s_reg.converged
    assert abs(s_dir.primal_obj - s_reg.primal_obj) \
        < 1e-6 * (1 + abs(s_dir.primal_obj))
