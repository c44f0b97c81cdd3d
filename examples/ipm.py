"""Interior-point example: solve an LP (netlib instance when the
reference data directory is present, otherwise a random bounded LP)
and a small convex QP with the Mehrotra predictor-corrector IPMs.

The reference's upstream Elemental shipped LP/QP/SOCP solvers (removed
by the Hydrogen fork but kept by this rebuild, SURVEY §2.5) and netlib
MPS instances under data/optimization/.

Run from the repo root:
    JAX_PLATFORMS=cpu python examples/ipm.py
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

from elementalx.optimization import LP, QP, read_mps

REF_DATA = "/root/reference/data/optimization"


def main():
    mps = os.path.join(REF_DATA, "afiro.mps")
    if os.path.exists(mps):
        prob = read_mps(mps)
        A, b, c = prob.A, prob.b, prob.c
        name = "netlib afiro (optimum -464.753)"
    else:
        rng = np.random.default_rng(0)
        m, n = 8, 20
        A = rng.standard_normal((m, n))
        x0 = np.abs(rng.standard_normal(n)) + 0.1
        b = A @ x0
        c = A.T @ rng.standard_normal(m) \
            + np.abs(rng.standard_normal(n)) + 0.05
        name = f"random LP ({m}x{n})"
    sol = LP(A, b, c)
    print(f"LP {name}: obj {sol.primal_obj:.6f}  "
          f"iters {sol.iterations}  converged {sol.converged}")

    # small convex QP: min 1/2 x^T Q x + c^T x  s.t.  A x = b, x >= 0
    rng = np.random.default_rng(1)
    m, n = 4, 10
    G = rng.standard_normal((n, n))
    Q = G @ G.T / n + np.eye(n)
    A = rng.standard_normal((m, n))
    x0 = np.abs(rng.standard_normal(n)) + 0.1
    b = A @ x0
    c = rng.standard_normal(n)
    qsol = QP(Q, A, b, c)
    x = np.asarray(qsol.x)
    kkt = np.linalg.norm(A @ x - b) / (1 + np.linalg.norm(b))
    print(f"QP ({m}x{n}): obj {qsol.primal_obj:.6f}  iters "
          f"{qsol.iterations}  converged {qsol.converged}  "
          f"||Ax-b||/(1+||b||) {kkt:.2e}")


if __name__ == "__main__":
    main()
