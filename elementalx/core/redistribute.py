"""The redistribution engine — TPU analogue of the ``copy::`` layer.

Reference: include/El/blas_like/level1/Copy/ (25 headers) — the heart of
the library (SURVEY §2.2). Every distribution change there is implemented
as pack -> MPI collective -> unpack. Here every change is a sharding
re-annotation on the globally-shaped array; XLA's SPMD partitioner emits
the equivalent collective over the mesh axes:

  reference plan            collective (XLA emits)        named path here
  ------------------------  ---------------------------   ---------------
  ColAllGather.hpp:17-181   all-gather over 'mc'          ColAllGather
  RowAllGather               all-gather over 'mr'          RowAllGather
  ColFilter / RowFilter      dynamic-slice (local)         ColFilter/RowFilter
  PartialColAllGather        all-gather over 'mr' subset   PartialColAllGather
  ColAllToAllPromote/Demote  all-to-all 'mc'<->'mr'        ColAllToAll*
  Exchange (MC_MR.cpp:64-83) collective-permute            Exchange
  TransposeDist              collective-permute            TransposeDist
  Gather/Scatter (CIRC)      gather to/from root           Gather/Scatter
  AllGather (-> [*,*])       all-gather both axes          AllGather
  TranslateBetweenGrids      host-staged copy              TranslateBetweenGrids

``Copy`` is the general dispatcher, the analogue of the 13x13 operator=
guard table (src/core/DistMatrix/ElementMatrix/MC_MR.cpp:165-177 +
El/macros/DeviceGuardAndPayload.h). Because XLA plans the actual data
movement, multi-hop routes like [MR,*] -> [VR,*] -> [VC,*] -> [MC,MR]
(MC_MR.cpp:85-96) collapse into a single resharding; the named helpers
exist for API parity, readability, and dist-tag validation.
"""

from __future__ import annotations

from .dmatrix import DistMatrix, apply_sharding
from .grid import Grid
from .types import (
    CIRC,
    Collect,
    Dist,
    MC,
    MD,
    MR,
    Partial,
    STAR,
    VC,
    VR,
)


def _reshard(A: DistMatrix, col_dist: Dist, row_dist: Dist) -> DistMatrix:
    sh = A.grid.sharding(col_dist, row_dist)
    return DistMatrix(apply_sharding(A.data, sh), A.m, A.n,
                      col_dist, row_dist, A.grid, A.wrap)


def Copy(A: DistMatrix, col_dist: Dist, row_dist: Dist) -> DistMatrix:
    """B = A with B distributed [col_dist, row_dist].

    General operator= dispatch (reference: ElementalMatrix::operator=,
    MC_MR.cpp:165-177)."""
    if (A.col_dist, A.row_dist) == (col_dist, row_dist):
        return A
    if A.grid is None:
        raise ValueError("DistMatrix has no grid")
    return _reshard(A, col_dist, row_dist)


# ---------------------------------------------------------------------------
# Named redistribution paths. Each validates the dist-tag contract of its
# reference counterpart, then delegates to the sharding move.
# ---------------------------------------------------------------------------


def ColAllGather(A: DistMatrix) -> DistMatrix:
    """[U,V] -> [Collect(U),V]: gather the column distribution
    (reference: Copy/ColAllGather.hpp:17-181)."""
    return _reshard(A, Collect(A.col_dist), A.row_dist)


def RowAllGather(A: DistMatrix) -> DistMatrix:
    """[U,V] -> [U,Collect(V)] (reference: Copy/RowAllGather.hpp)."""
    return _reshard(A, A.col_dist, Collect(A.row_dist))


def ColFilter(A: DistMatrix, col_dist: Dist) -> DistMatrix:
    """[STAR,V] -> [U,V]: keep only locally-owned rows — pure slicing, no
    communication (reference: Copy/ColFilter.hpp)."""
    if A.col_dist != STAR:
        raise ValueError("ColFilter requires a [STAR,V] source")
    return _reshard(A, col_dist, A.row_dist)


def RowFilter(A: DistMatrix, row_dist: Dist) -> DistMatrix:
    """[U,STAR] -> [U,V] (reference: Copy/RowFilter.hpp)."""
    if A.row_dist != STAR:
        raise ValueError("RowFilter requires a [U,STAR] source")
    return _reshard(A, A.col_dist, row_dist)


def PartialColAllGather(A: DistMatrix) -> DistMatrix:
    """[VC,V] -> [MC,V] / [VR,V] -> [MR,V]
    (reference: Copy/PartialColAllGather.hpp)."""
    return _reshard(A, Partial(A.col_dist), A.row_dist)


def PartialRowAllGather(A: DistMatrix) -> DistMatrix:
    """[U,VC] -> [U,MC] / [U,VR] -> [U,MR]."""
    return _reshard(A, A.col_dist, Partial(A.row_dist))


def PartialColFilter(A: DistMatrix, col_dist: Dist) -> DistMatrix:
    """[MC,V] -> [VC,V] etc. (reference: Copy/PartialColFilter.hpp)."""
    if Partial(col_dist) != A.col_dist:
        raise ValueError("PartialColFilter: target must refine the source")
    return _reshard(A, col_dist, A.row_dist)


def ColAllToAllPromote(A: DistMatrix) -> DistMatrix:
    """[VC,STAR] -> [MC,MR] style promote via all-to-all
    (reference: Copy/ColAllToAllPromote.hpp, used by MC_MR.cpp:111-147)."""
    if A.col_dist == VC:
        return _reshard(A, MC, MR)
    if A.col_dist == VR:
        return _reshard(A, MR, MC)
    raise ValueError("ColAllToAllPromote requires a [VC/VR,*] source")


def ColAllToAllDemote(A: DistMatrix) -> DistMatrix:
    """[MC,MR] -> [VC,STAR] style demote (reference: Copy/ColAllToAllDemote.hpp)."""
    if (A.col_dist, A.row_dist) == (MC, MR):
        return _reshard(A, VC, STAR)
    if (A.col_dist, A.row_dist) == (MR, MC):
        return _reshard(A, VR, STAR)
    raise ValueError("ColAllToAllDemote requires [MC,MR] or [MR,MC]")


def Exchange(A: DistMatrix) -> DistMatrix:
    """[MC,MR] <-> [MR,MC] pairwise exchange
    (reference: Copy/Exchange.hpp, MC_MR.cpp:64-83)."""
    pairs = {(MC, MR): (MR, MC), (MR, MC): (MC, MR), (VC, STAR): (VR, STAR),
             (VR, STAR): (VC, STAR), (STAR, VC): (STAR, VR), (STAR, VR): (STAR, VC)}
    tgt = pairs.get((A.col_dist, A.row_dist))
    if tgt is None:
        raise ValueError(f"Exchange undefined for {A.dist_name()}")
    return _reshard(A, *tgt)


def TransposeDist(A: DistMatrix) -> DistMatrix:
    """Re-tag [U,V] data as [V,U] *without* moving matrix entries:
    used by transpose-based redistributions (reference: Copy/TransposeDist.hpp)."""
    return _reshard(A, A.row_dist, A.col_dist)


def AllGather(A: DistMatrix) -> DistMatrix:
    """[U,V] -> [*,*] full replication (reference: Copy/AllGather.hpp)."""
    return _reshard(A, STAR, STAR)


def Filter(A: DistMatrix, col_dist: Dist, row_dist: Dist) -> DistMatrix:
    """[*,*] -> [U,V] (reference: Copy/Filter.hpp)."""
    if (A.col_dist, A.row_dist) != (STAR, STAR):
        raise ValueError("Filter requires a [*,*] source")
    return _reshard(A, col_dist, row_dist)


def Gather(A: DistMatrix) -> DistMatrix:
    """[U,V] -> [CIRC,CIRC]: everything to the root
    (reference: Copy/Gather.hpp). Physically replicated here; the root
    distinction has no meaning with a single controller."""
    return _reshard(A, CIRC, CIRC)


def Scatter(A: DistMatrix, col_dist: Dist = MC, row_dist: Dist = MR) -> DistMatrix:
    """[CIRC,CIRC] -> [U,V] (reference: Copy/Scatter.hpp)."""
    if (A.col_dist, A.row_dist) != (CIRC, CIRC):
        raise ValueError("Scatter requires a [CIRC,CIRC] source")
    return _reshard(A, col_dist, row_dist)


def Translate(A: DistMatrix) -> DistMatrix:
    """Alignment translation (reference: Copy/Translate.hpp). Alignments do
    not exist in the XLA layout model, so this is the identity."""
    return A


def TranslateBetweenGrids(A: DistMatrix, grid: Grid,
                          col_dist: Dist = MC, row_dist: Dist = MR) -> DistMatrix:
    """Copy a matrix onto a *different* grid
    (reference: Copy/TranslateBetweenGrids.hpp:18-369, tested by
    tests/core/DifferentGrids.cpp).

    First-class under jit for grids over the SAME device set (any mesh
    shape): the movement lowers to a sharding constraint and XLA plans
    the collective, exactly like every other copy:: path. Grids over a
    different device set (true subgrids) reshard eagerly via device_put
    — a single XLA program is compiled for one device assignment, so
    cross-device-set movement cannot appear inside jit (jax raises its
    incompatible-devices error there; call this outside jit)."""
    from .dmatrix import pad_array

    logical = A.replicated()[: A.m, : A.n]
    return DistMatrix.from_padded(
        pad_array(logical, grid), A.m, A.n, col_dist, row_dist, grid, A.wrap)
