"""Core runtime: Grid, distribution types, DistMatrix, redistribution.

Reference layers L0/L1/L2 (SURVEY §1): the MPI/CUDA import layers have no
TPU analogue (JAX owns the runtime); Grid/DistMatrix/copy:: are rebuilt on
jax.sharding.
"""

from .types import (  # noqa: F401
    ADJOINT,
    ALL_DISTS,
    ASCENDING,
    BACKWARD,
    BLOCK,
    CIRC,
    CONJUGATED,
    Collect,
    DESCENDING,
    DiagCol,
    DiagRow,
    Dist,
    DistWrap,
    ELEMENT,
    FORWARD,
    GEMM_CANNON,
    GEMM_DEFAULT,
    GEMM_SUMMA_A,
    GEMM_SUMMA_B,
    GEMM_SUMMA_C,
    GEMM_SUMMA_DOT,
    GEMM_XLA,
    GemmAlgorithm,
    HORIZONTAL,
    LEFT,
    LOWER,
    MC,
    MD,
    MR,
    NON_UNIT,
    NORMAL,
    Orientation,
    Partial,
    ProductDist,
    RIGHT,
    STAR,
    TRANSPOSE,
    UNCONJUGATED,
    UNIT,
    UNSORTED,
    UPPER,
    UpperOrLower,
    VC,
    VERTICAL,
    VR,
)
from .grid import DefaultGrid, Grid, default_grid_height  # noqa: F401
from .dmatrix import DistMatrix, apply_sharding, check_same_grid, make_dist  # noqa: F401
from . import redistribute  # noqa: F401
from .redistribute import Copy, TranslateBetweenGrids  # noqa: F401
from .environment import (  # noqa: F401
    AssertInBounds,
    Blocksize,
    DebugChecksEnabled,
    ElError,
    EnableDebugChecks,
    Finalize,
    Initialize,
    Initialized,
    LogicError,
    NonHPDMatrixException,
    NonHPSDMatrixException,
    Output,
    OutputFromRoot,
    PopBlocksizeStack,
    PushBlocksizeStack,
    SetBlocksize,
    SingularMatrixException,
    blocksize,
    debug_checks,
)
from .random_ import SampleNormal, SampleUniform, SeedRandom, next_key  # noqa: F401
from . import flame  # noqa: F401
from .flame import (  # noqa: F401
    ALL,
    IR,
    Merge1x2,
    Merge2x1,
    Merge2x2,
    Partition1x2,
    Partition2x1,
    Partition2x2,
    View,
)
from . import block  # noqa: F401
from .block import (  # noqa: F401
    BlockCholesky,
    BlockGemm,
    BlockMatrix,
    BlockTrsm,
    FillDesc,
    block_cyclic_perm,
)
from . import matrix  # noqa: F401
from .matrix import Matrix  # noqa: F401
