"""lapack_like layer (reference: src/lapack_like/, SURVEY §2.4)."""

from . import cholesky  # noqa: F401
from .cholesky import (  # noqa: F401
    Cholesky,
    CholeskyMod,
    HPDSolve,
    ReverseCholesky,
)
