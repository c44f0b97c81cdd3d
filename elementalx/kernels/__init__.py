"""Pallas TPU kernels — the local-block compute layer.

Reference: src/hydrogen/blas/gpu/*.cu (Axpy/Copy/Fill/Scale/Hadamard/
Transpose CUDA kernels, decls include/hydrogen/blas/gpu/*.hpp) and
src/hydrogen/blas/cutlass_blas/cutlassBLAS.cu (tiled local GEMM) —
SURVEY §2.6 maps each to a Pallas MXU/VPU kernel.

XLA already fuses elementwise chains and emits near-peak matmuls, so
these kernels are the *escape hatch* for schedules XLA won't pick:
the explicitly-tiled MXU matmul (used by shard_map SUMMA inner loops),
fused triangular-masked rank-k updates, and the tiled transpose. Each
has a jnp fallback selected automatically off-TPU.
"""

from .matmul import matmul, matmul_pallas  # noqa: F401
from .elementwise import (  # noqa: F401
    axpy,
    fill,
    hadamard,
    scale,
    transpose,
)
from .trrk import masked_rank_k  # noqa: F401
from .ozaki import matmul_f64_emulated  # noqa: F401
from .ring_summa import ring_summa  # noqa: F401
from .extended import (  # noqa: F401
    dot_extended,
    matmul_extended,
    norm2_extended,
    sum_extended,
    two_prod,
    two_sum,
)
