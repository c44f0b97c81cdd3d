"""blas_like layer (reference: src/blas_like/, SURVEY §2.3)."""

from . import level1  # noqa: F401
from .level1 import *  # noqa: F401,F403
from .gemm import Gemm, local_gemm, set_local_precision  # noqa: F401
