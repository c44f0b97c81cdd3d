"""Interior-point optimization: LP and QP Mehrotra predictor-corrector.

Reference lineage: upstream Elemental's LP/QP/SOCP IPM layer, which the
Hydrogen fork removed entirely (SURVEY §0: only data files remain in
data/optimization/*.mps and the Python driver scripts) — rebuilt here to
the upstream spec as the BASELINE stretch goal.

Design: Mehrotra predictor-corrector with the full (unreduced) Newton
system solved by the distributed pivoted LU each step — every iteration
is dense MXU work. The sparse-KKT path routes through the multifrontal
LDL (sparse/ldl.py) exactly as upstream's sparse IPMs rode on the
Clique solver. SOCP uses the Jordan-algebra (AHO) direction (socp.py)."""

from .mps import read_mps  # noqa: F401
from .lp import LP, LPSolution, LinearProgram  # noqa: F401
from .qp import QP, QuadraticProgram  # noqa: F401
from .socp import SOCP, SecondOrderConeProgram  # noqa: F401
