"""Contract / AxpyContract — reduction-flavored redistributions.

Reference: include/El/blas_like/level1/Contract.hpp:15-76,
AxpyContract.hpp, TransposeContract.hpp — the "psum of the library":
summing over redundant ranks when moving e.g. [MC,*] -> [MC,MR] via
ReduceScatter.

In the GSPMD representation a replicated axis holds identical copies, so
there is nothing to sum at the DistMatrix level: partial sums only arise
*inside* shard_map programs, where they appear as lax.psum /
lax.psum_scatter (see blas/gemm.py's stationary-A/B/dot variants — those
calls ARE this library's Contract). These wrappers give the El-named API:
they reduce-scatter genuinely-partial data produced by a shard_map stage
and re-tag the result."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..core.dmatrix import DistMatrix
from ..core.types import Dist, MC, MR, STAR


def Contract(A: DistMatrix, col_dist: Dist, row_dist: Dist) -> DistMatrix:
    """B[U,V] = sum-over-redundant-copies of A (reference: Contract.hpp).

    For [MC,*] -> [MC,MR]: each 'mr' rank holds a *partial* contribution
    in A.data's replicated axis; reduce-scatter over 'mr' forms the
    total. Because NamedSharding cannot tag "replicated but different",
    callers must only pass matrices whose replicated axes hold partial
    sums (shard_map outputs with out_specs claiming replication)."""
    if (A.col_dist, A.row_dist) == (col_dist, row_dist):
        return A
    mesh = A.grid.mesh
    if (A.col_dist, A.row_dist) == (MC, STAR) and (col_dist, row_dist) == (MC, MR):
        def body(x):
            return jax.lax.psum_scatter(x, "mr", scatter_dimension=1,
                                        tiled=True)

        out = shard_map(body, mesh=mesh, in_specs=P("mc", None),
                        out_specs=P("mc", "mr"))(A.data)
        return DistMatrix.from_padded(out, A.m, A.n, MC, MR, A.grid, A.wrap)
    if (A.col_dist, A.row_dist) == (STAR, MR) and (col_dist, row_dist) == (MC, MR):
        def body(x):
            return jax.lax.psum_scatter(x, "mc", scatter_dimension=0,
                                        tiled=True)

        out = shard_map(body, mesh=mesh, in_specs=P(None, "mr"),
                        out_specs=P("mc", "mr"))(A.data)
        return DistMatrix.from_padded(out, A.m, A.n, MC, MR, A.grid, A.wrap)
    # identical-copy case: plain redistribution
    return A.redistribute(col_dist, row_dist)


def AxpyContract(alpha, A: DistMatrix, B: DistMatrix) -> DistMatrix:
    """B += alpha * Contract(A, B.dist) (reference: AxpyContract.hpp)."""
    C = Contract(A, B.col_dist, B.row_dist)
    return B.with_data(B.data + jnp.asarray(alpha, B.dtype)
                       * C.data.astype(B.dtype))


def TransposeContract(A: DistMatrix, col_dist: Dist, row_dist: Dist,
                      conjugate: bool = False) -> DistMatrix:
    """B[U,V] = Contract(A)^T (reference: TransposeContract.hpp:14-43 —
    contract the partial/redundant axis, then transpose into B's
    distribution). Functionally: Contract in A's own distribution, then
    a Transpose redistribution to (col_dist, row_dist) — GSPMD plans the
    combined movement in one program."""
    from .level1 import Transpose

    C = Contract(A, A.col_dist, A.row_dist)
    return Transpose(C, conjugate=conjugate).redistribute(
        col_dist, row_dist)


def AdjointContract(A: DistMatrix, col_dist: Dist, row_dist: Dist
                    ) -> DistMatrix:
    """Reference: AdjointContract.hpp — TransposeContract, conjugated."""
    return TransposeContract(A, col_dist, row_dist, conjugate=True)


def TransposeAxpyContract(alpha, A: DistMatrix, B: DistMatrix,
                          conjugate: bool = False) -> DistMatrix:
    """B += alpha Contract(A)^T (reference:
    TransposeAxpyContract.hpp:14-47)."""
    C = TransposeContract(A, B.col_dist, B.row_dist, conjugate=conjugate)
    return B.with_data(B.data + jnp.asarray(alpha, B.dtype)
                       * C.data.astype(B.dtype))


def AdjointAxpyContract(alpha, A: DistMatrix, B: DistMatrix) -> DistMatrix:
    """Reference: AdjointContract.hpp AdjointAxpyContract."""
    return TransposeAxpyContract(alpha, A, B, conjugate=True)
