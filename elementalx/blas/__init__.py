"""blas_like layer (reference: src/blas_like/, SURVEY §2.3)."""

from . import level1  # noqa: F401
from .level1 import *  # noqa: F401,F403
from .gemm import Gemm, Gemm3D, local_gemm, set_local_precision  # noqa: F401
from .trsm import Trsm, Trsv  # noqa: F401
from .level2 import (  # noqa: F401
    ApplyGivensSequence,
    Gemv,
    Ger,
    Geru,
    Hemv,
    Her,
    Her2,
    Symv,
    Syr,
    Syr2,
    Trmv,
    Trr,
    Trr2,
)
from .level3 import (  # noqa: F401
    Hemm,
    Her2k,
    Herk,
    HermitianFromEVD,
    MultiShiftTrsm,
    NormalFromEVD,
    Symm,
    Syr2k,
    Syrk,
    Trmm,
    Trr2k,
    Trrk,
    Trtrmm,
    TwoSidedTrmm,
    TwoSidedTrsm,
)
from .quasi import (  # noqa: F401
    MultiShiftQuasiTrsm,
    QuasiTrsm,
    QuasiTrsv,
    SafeMultiShiftQuasiTrsm,
    SafeMultiShiftTrsm,
    Trstrm,
)
from .contract import (  # noqa: F401
    AdjointAxpyContract,
    AdjointContract,
    AxpyContract,
    Contract,
    TransposeAxpyContract,
    TransposeContract,
)
