"""DistMatrix: a distributed dense matrix over a Grid.

TPU-native re-design of the reference's DistMatrix class web
(reference: include/El/core/DistMatrix/AbstractDistMatrix.hpp:20-368 and the
13 ElementMatrix specializations, src/core/DistMatrix/ElementMatrix/*.cpp).

Design
------
The reference stores, on every MPI rank, the *local* block of a global
matrix plus (colDist, rowDist, alignments). Here a ``DistMatrix`` is a
pytree wrapping a single **globally-shaped** ``jax.Array`` whose
``NamedSharding`` over the grid's mesh realises the distribution; the
(col_dist, row_dist) tags are static metadata. Algorithms are pure
functions DistMatrix -> DistMatrix and are jittable end-to-end; XLA
propagates shardings through every op and materialises the collectives a
redistribution implies.

Padding
-------
XLA shardings require every sharded dimension to divide evenly across its
mesh axes, and the MXU wants 128-aligned tiles; the reference instead
supports ragged local blocks (Length() arithmetic in
include/El/core/DistMatrix/...). We therefore store ``data`` padded in
both dimensions up to a multiple of the grid size p (every distribution's
divisibility requirement divides p) and keep the logical extent (m, n) as
static metadata. Invariant: **the padding region is always zero**; every
op that could violate it (entrywise maps, scalar shifts) re-masks. This
trades a bounded slice of wasted FLOPs for fully static, aligned shapes —
the TPU-correct call.

Other consequences of the re-design (vs. the reference):
 * no alignments/cuts: XLA chooses block offsets; align negotiation
   (AbstractDistMatrix SetAligns etc.) has no TPU analogue.
 * operator= redistribution (MC_MR.cpp:111-177) becomes
   ``redistribute``/``Copy`` — a sharding re-annotation.
 * Get/Set/Update element access (remote broadcast from owner) becomes
   ordinary functional indexing on the global array.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from .grid import Grid
from .types import (
    CIRC,
    Dist,
    DistWrap,
    ELEMENT,
    MC,
    MR,
    STAR,
)


def _is_traced(x) -> bool:
    return isinstance(x, jax.core.Tracer)


def apply_sharding(x: jax.Array, sharding: NamedSharding) -> jax.Array:
    """Move/annotate ``x`` onto ``sharding``.

    Inside a jit trace this is a sharding constraint (XLA inserts the
    collective); eagerly it is a device_put (the runtime reshards).
    This single helper is the entire "network boundary" of the library —
    the analogue of every mpi::AllGather/AllToAll call in the reference's
    copy:: engine (include/El/blas_like/level1/Copy/).
    """
    if _is_traced(x):
        return jax.lax.with_sharding_constraint(x, sharding)
    return jax.device_put(x, sharding)


def pad_quantum(grid: Grid) -> int:
    """Both matrix dimensions are padded to a multiple of this. p covers
    every distribution's divisibility requirement (r, c, and p divide it)."""
    return grid.size


def padded_extent(extent: int, grid: Grid) -> int:
    q = pad_quantum(grid)
    return max(((extent + q - 1) // q) * q, q)


def pad_array(arr: jax.Array, grid: Grid) -> jax.Array:
    """Zero-pad a logical (m, n) array to grid-aligned shape."""
    m, n = arr.shape
    pm, pn = padded_extent(m, grid), padded_extent(n, grid)
    if (pm, pn) == (m, n):
        return arr
    return jnp.pad(arr, ((0, pm - m), (0, pn - n)))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistMatrix:
    """A distributed m x n matrix: padded global array + distribution tags.

    ``data`` has grid-aligned shape (>= (m, n)); its sharding realises
    [col_dist, row_dist] over ``grid`` (see grid._AXIS_SPEC for the map).
    The padding region of ``data`` is identically zero.
    """

    data: jax.Array
    m: int = dataclasses.field(metadata=dict(static=True), default=0)
    n: int = dataclasses.field(metadata=dict(static=True), default=0)
    col_dist: Dist = dataclasses.field(metadata=dict(static=True), default=MC)
    row_dist: Dist = dataclasses.field(metadata=dict(static=True), default=MR)
    grid: Optional[Grid] = dataclasses.field(metadata=dict(static=True), default=None)
    wrap: DistWrap = dataclasses.field(metadata=dict(static=True), default=ELEMENT)

    # ---- basic queries (reference: AbstractDistMatrix Height/Width/...) ----
    @property
    def height(self) -> int:
        return self.m

    @property
    def width(self) -> int:
        return self.n

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.m, self.n)

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def dist(self) -> Tuple[Dist, Dist]:
        return (self.col_dist, self.row_dist)

    def dist_name(self) -> str:
        return f"[{self.col_dist!r},{self.row_dist!r}]"

    # ---- construction ----
    @staticmethod
    def from_global(
        array,
        col_dist: Dist = MC,
        row_dist: Dist = MR,
        grid: Optional[Grid] = None,
        wrap: DistWrap = ELEMENT,
    ) -> "DistMatrix":
        """Distribute a host/global logical (m, n) array (reference: building
        a DistMatrix then QueueUpdate/ProcessQueues)."""
        g = grid or Grid.default()
        arr = jnp.asarray(array)
        if arr.ndim != 2:
            raise ValueError("DistMatrix is 2-D")
        m, n = arr.shape
        data = pad_array(arr, g)
        sh = g.sharding(col_dist, row_dist)
        return DistMatrix(apply_sharding(data, sh), m, n, col_dist, row_dist, g, wrap)

    @staticmethod
    def from_padded(
        data: jax.Array,
        m: int,
        n: int,
        col_dist: Dist = MC,
        row_dist: Dist = MR,
        grid: Optional[Grid] = None,
        wrap: DistWrap = ELEMENT,
    ) -> "DistMatrix":
        """Wrap an already grid-aligned array (padding must be zero)."""
        g = grid or Grid.default()
        sh = g.sharding(col_dist, row_dist)
        return DistMatrix(apply_sharding(data, sh), m, n, col_dist, row_dist, g, wrap)

    def with_data(self, data: jax.Array, m: Optional[int] = None,
                  n: Optional[int] = None) -> "DistMatrix":
        """Same distribution/grid, new padded contents."""
        return dataclasses.replace(
            self, data=data, m=self.m if m is None else m,
            n=self.n if n is None else n)

    def canonical(self) -> "DistMatrix":
        """Slice/pad ``data`` to the canonical padded shape for (m, n) —
        some producers (e.g. explicit-Q formation) carry wider buffers."""
        pm, pn = padded_extent(self.m, self.grid), padded_extent(self.n, self.grid)
        if self.data.shape == (pm, pn):
            return self
        d = self.data[: min(pm, self.data.shape[0]),
                      : min(pn, self.data.shape[1])]
        if d.shape != (pm, pn):
            d = jnp.pad(d, ((0, pm - d.shape[0]), (0, pn - d.shape[1])))
        return self.with_data(self.mask_like(d))

    def mask_like(self, data: jax.Array) -> jax.Array:
        """Zero entries outside the logical (m, n) region of ``data``
        (shape-agnostic variant of mask_padding)."""
        P, Q = data.shape
        i = jax.lax.broadcasted_iota(jnp.int32, (P, Q), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (P, Q), 1)
        return jnp.where((i < self.m) & (j < self.n), data,
                         jnp.zeros((), data.dtype))

    # ---- padding helpers ----
    def row_mask(self) -> jax.Array:
        """(P, 1) bool: rows < m."""
        P = self.data.shape[0]
        return (jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) < self.m)

    def col_mask(self) -> jax.Array:
        Q = self.data.shape[1]
        return (jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1) < self.n)

    def pad_mask(self) -> jax.Array:
        """(P, Q) bool mask of the logical region."""
        return self.row_mask() & self.col_mask()

    def mask_padding(self, data: jax.Array) -> jax.Array:
        """Zero the padding region of a padded-shape array."""
        return jnp.where(self.pad_mask(), data, jnp.zeros((), data.dtype))

    # ---- redistribution (reference: the operator= table, MC_MR.cpp:111-177) --
    def redistribute(self, col_dist: Dist, row_dist: Dist) -> "DistMatrix":
        from . import redistribute as _r

        return _r.Copy(self, col_dist, row_dist)

    # ---- element access (reference: DistMatrix Get/Set/Update with
    # EL_DEBUG_ONLY CheckBounds; functional — Set/Update return the new
    # matrix since the pytree is immutable) ----
    def _check_entry(self, i, j):
        from .environment import AssertInBounds, DebugChecksEnabled

        if DebugChecksEnabled():
            AssertInBounds(i, j, self.m, self.n, "DistMatrix entry")

    def get(self, i: int, j: int):
        self._check_entry(i, j)
        return self.data[i, j]

    def set(self, i: int, j: int, value) -> "DistMatrix":
        self._check_entry(i, j)
        return self.with_data(self.data.at[i, j].set(value))

    def update(self, i: int, j: int, value) -> "DistMatrix":
        self._check_entry(i, j)
        return self.with_data(self.data.at[i, j].add(value))

    def check_valid(self) -> None:
        """Eager validation of the library invariant: the padding region
        of ``data`` is identically zero (reference: the DEBUG-build
        consistency asserts). No-op under trace."""
        if _is_traced(self.data):
            return
        bad = jax.device_get(jnp.sum(jnp.abs(
            jnp.where(self.pad_mask(), jnp.zeros((), self.dtype),
                      self.data))))
        if bad != 0:
            raise AssertionError(
                f"DistMatrix padding invariant violated: |pad| sum = {bad}")

    # ---- materialisation ----
    def global_array(self) -> np.ndarray:
        """Gather the full logical matrix to the host (test/IO helper; the
        analogue of copying to [CIRC,CIRC] then reading, Copy/Gather.hpp)."""
        return np.asarray(jax.device_get(self.data))[: self.m, : self.n]

    def replicated(self) -> jax.Array:
        """The padded global array replicated on every device ([*,*] view)."""
        if self.grid is None:
            return self.data
        return apply_sharding(self.data, self.grid.replicated_sharding())

    def __repr__(self) -> str:
        return (
            f"DistMatrix({self.m}x{self.n}, {self.dist_name()}, "
            f"{self.dtype}, grid={self.grid}, padded={self.data.shape})"
        )


def check_same_grid(*mats: DistMatrix) -> Grid:
    """Debug-style conformality check (reference: EL_DEBUG_ONLY AssertSameGrids,
    include/El/core/DistMatrix.hpp:89-131)."""
    g = mats[0].grid
    for m in mats[1:]:
        if m.grid != g:
            raise ValueError("DistMatrices live on different grids")
    return g


def make_dist(
    array_or_dm,
    col_dist: Dist = MC,
    row_dist: Dist = MR,
    grid: Optional[Grid] = None,
) -> DistMatrix:
    """Coerce an array or DistMatrix to the requested distribution
    (the read-proxy idiom, include/El/core/Proxy.hpp:174-906)."""
    if isinstance(array_or_dm, DistMatrix):
        return array_or_dm.redistribute(col_dist, row_dist)
    return DistMatrix.from_global(array_or_dm, col_dist, row_dist, grid)
