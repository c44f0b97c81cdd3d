"""Local (sequential) Matrix — the single-device container.

Reference: include/El/core/Matrix/decl.hpp:25 (CPU) and :292 (GPU
specialization): a device-resident column-major buffer with
Get/Set/Update element access, views via (Locked)Attach, and leading
dimension. Here a thin functional wrapper over a jax.Array on one
device; XLA owns layout (no user-visible leading dimension) and views
are functional slices. The distributed stack never requires it — it
exists for sequential-API parity and for host-side staging."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class Matrix:
    """Mutable-API facade over an immutable jax.Array."""

    def __init__(self, height: int = 0, width: int = 0,
                 dtype=jnp.float32, device: Optional[jax.Device] = None):
        self._data = jnp.zeros((height, width), dtype)
        if device is not None:
            self._data = jax.device_put(self._data, device)

    # -- construction / views -------------------------------------------
    @staticmethod
    def from_array(arr, device: Optional[jax.Device] = None) -> "Matrix":
        M = Matrix.__new__(Matrix)
        M._data = jnp.asarray(arr)
        if device is not None:
            M._data = jax.device_put(M._data, device)
        return M

    def attach(self, arr) -> None:
        """Reference: Matrix::Attach (adopt a buffer)."""
        self._data = jnp.asarray(arr)

    locked_attach = attach  # immutability makes locked/unlocked identical

    # -- shape ----------------------------------------------------------
    @property
    def height(self) -> int:
        return self._data.shape[0]

    @property
    def width(self) -> int:
        return self._data.shape[1]

    @property
    def ldim(self) -> int:
        """Leading dimension: XLA layouts are opaque; report the height
        (dense column-major equivalent)."""
        return max(self._data.shape[0], 1)

    @property
    def dtype(self):
        return self._data.dtype

    def resize(self, height: int, width: int) -> None:
        cur = self._data
        new = jnp.zeros((height, width), cur.dtype)
        h = min(height, cur.shape[0])
        w = min(width, cur.shape[1])
        self._data = new.at[:h, :w].set(cur[:h, :w])

    # -- element access (reference: Get/Set/Update, with EL_DEBUG_ONLY
    # bounds assertions under the opt-in debug mode) ---------------------
    def _check(self, i, j):
        from .environment import AssertInBounds, DebugChecksEnabled

        if DebugChecksEnabled():
            AssertInBounds(i, j, self.height, self.width, "Matrix entry")

    def get(self, i: int, j: int):
        self._check(i, j)
        return self._data[i, j]

    def set(self, i: int, j: int, value) -> None:
        self._check(i, j)
        self._data = self._data.at[i, j].set(value)

    def update(self, i: int, j: int, value) -> None:
        self._check(i, j)
        self._data = self._data.at[i, j].add(value)

    def __getitem__(self, key):
        return self._data[key]

    # -- conversion -----------------------------------------------------
    @property
    def array(self) -> jax.Array:
        return self._data

    def numpy(self) -> np.ndarray:
        return np.asarray(jax.device_get(self._data))

    def to_dist(self, grid=None, col_dist=None, row_dist=None):
        from .dmatrix import DistMatrix
        from .types import MC, MR

        return DistMatrix.from_global(
            self._data, col_dist or MC, row_dist or MR, grid)

    def __repr__(self):
        return f"Matrix({self.height}x{self.width}, {self.dtype})"
