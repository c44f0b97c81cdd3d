"""Process grid == 2-D device mesh.

TPU-native re-design of Elemental's ``Grid``
(reference: include/El/core/Grid.hpp:15-146, src/core/Grid.cpp:95-185).

The reference Grid owns seven MPI sub-communicators over an r x c process
grid (MC=grid column, MR=grid row, VC/VR=vectorized orderings, MD diagonal,
plus the cartesian comm). Here the grid is a ``jax.sharding.Mesh`` with
axes ``('mc', 'mr')``; the sub-communicators become mesh-axis subsets:

  MC comm   -> the 'mc' axis
  MR comm   -> the 'mr' axis
  VC comm   -> ('mc', 'mr')   (mc-major flattening)
  VR comm   -> ('mr', 'mc')   (mr-major flattening)
  MD comm   -> carried as VC (see types.py docstring)

XLA lowers collectives over these axis groups onto the ICI torus; nothing
like CartCreate/CartSub is needed.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .types import Dist, MC, MD, MR, VC, VR, STAR, CIRC


def default_grid_height(p: int) -> int:
    """Largest divisor of p that is <= sqrt(p), biased upward like the
    reference's Grid::DefaultHeight (src/core/Grid.cpp)."""
    h = int(math.isqrt(p))
    while h > 1 and p % h != 0:
        h -= 1
    return max(h, 1)


# PartitionSpec entry for each axis distribution.
_AXIS_SPEC = {
    MC: "mc",
    MR: "mr",
    MD: ("mc", "mr"),  # physically VC; see types.py
    VC: ("mc", "mr"),
    VR: ("mr", "mc"),
    STAR: None,
    CIRC: None,  # replicated physically; root-owned semantically
}


class Grid:
    """A 2-D r x c device grid wrapping a ``jax.sharding.Mesh``.

    Unlike the reference (one MPI rank per process), a single Python
    process controls every device; ``Grid`` is therefore a lightweight
    handle used to derive shardings.
    """

    _default: Optional["Grid"] = None

    def __init__(
        self,
        devices: Optional[Sequence[jax.Device]] = None,
        height: Optional[int] = None,
        *,
        mesh: Optional[Mesh] = None,
    ):
        if mesh is not None:
            if tuple(mesh.axis_names) != ("mc", "mr"):
                raise ValueError("Grid mesh must have axes ('mc','mr')")
            self.mesh = mesh
        else:
            if devices is None:
                devices = jax.devices()
            devices = list(devices)
            p = len(devices)
            r = height if height is not None else default_grid_height(p)
            if p % r != 0:
                raise ValueError(f"grid height {r} does not divide p={p}")
            c = p // r
            self.mesh = Mesh(np.asarray(devices).reshape(r, c), ("mc", "mr"))

    # ---- shape queries (reference: Grid.hpp Height/Width/Size) ----
    @property
    def height(self) -> int:
        return self.mesh.shape["mc"]

    @property
    def width(self) -> int:
        return self.mesh.shape["mr"]

    @property
    def size(self) -> int:
        return self.height * self.width

    @property
    def gcd(self) -> int:
        return math.gcd(self.height, self.width)

    @property
    def lcm(self) -> int:
        return self.height * self.width // self.gcd

    # ---- sharding derivation ----
    def axis_spec(self, d: Dist):
        return _AXIS_SPEC[d]

    def spec(self, col_dist: Dist, row_dist: Dist) -> P:
        """PartitionSpec for a [col_dist, row_dist] matrix.

        If both axes would claim the same mesh axis (impossible pairs the
        reference never instantiates), raises.
        """
        a = _AXIS_SPEC[col_dist]
        b = _AXIS_SPEC[row_dist]
        used_a = set(a) if isinstance(a, tuple) else ({a} if a else set())
        used_b = set(b) if isinstance(b, tuple) else ({b} if b else set())
        if used_a & used_b:
            raise ValueError(
                f"invalid distribution pair [{col_dist!r},{row_dist!r}]"
            )
        return P(a, b)

    def sharding(self, col_dist: Dist, row_dist: Dist) -> NamedSharding:
        return NamedSharding(self.mesh, self.spec(col_dist, row_dist))

    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(None, None))

    # Grids compare by their device mesh (reference compares comm identity).
    def __eq__(self, other) -> bool:
        return isinstance(other, Grid) and self.mesh == other.mesh

    def __hash__(self) -> int:
        return hash(self.mesh)

    def __repr__(self) -> str:
        return f"Grid({self.height}x{self.width})"

    # ---- default grid (reference: Grid::Default, environment.cpp:309) ----
    @classmethod
    def default(cls) -> "Grid":
        if cls._default is None:
            cls._default = cls()
        return cls._default

    @classmethod
    def set_default(cls, grid: Optional["Grid"]) -> None:
        cls._default = grid


def DefaultGrid() -> Grid:
    """Reference: El::DefaultGrid()."""
    return Grid.default()
