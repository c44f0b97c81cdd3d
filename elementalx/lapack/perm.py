"""Permutations.

Reference: include/El/core/Permutation.hpp:14, DistPermutation.hpp:74,
src/lapack_like/perm/*. The reference builds alltoall plans
(PermutationMeta) to move rows between ranks; on TPU a permutation is a
gather along the sharded axis — XLA plans the all-to-all.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Permutation:
    """image-form permutation: (P A)[i, :] = A[perm[i], :].

    ``perm`` has the padded length; entries >= m are the identity so a
    permutation applies cleanly to padded arrays."""

    perm: jax.Array
    m: int = dataclasses.field(metadata=dict(static=True), default=0)

    @staticmethod
    def identity(m: int, padded: int) -> "Permutation":
        return Permutation(jnp.arange(padded, dtype=jnp.int32), m)

    def inverse(self) -> "Permutation":
        inv = jnp.zeros_like(self.perm).at[self.perm].set(
            jnp.arange(self.perm.shape[0], dtype=self.perm.dtype))
        return Permutation(inv, self.m)

    def compose_swap(self, i, j) -> "Permutation":
        """Append a swap of positions i, j (reference: Permutation::Swap)."""
        p = self.perm
        pi, pj = p[i], p[j]
        return Permutation(p.at[i].set(pj).at[j].set(pi), self.m)

    # -- application (reference: perm/PermuteRows.hpp etc.) --
    def apply_rows(self, A: DistMatrix, inverse: bool = False) -> DistMatrix:
        p = self.inverse().perm if inverse else self.perm
        return A.with_data(A.data[p, :])

    def apply_cols(self, A: DistMatrix, inverse: bool = False) -> DistMatrix:
        p = self.inverse().perm if inverse else self.perm
        return A.with_data(A.data[:, p])

    def to_explicit(self, grid=None) -> jax.Array:
        """Dense permutation matrix (reference: ExplicitPermutation)."""
        n = self.perm.shape[0]
        return (jnp.arange(n)[None, :] == self.perm[:, None]).astype(jnp.float32)


PermuteRows = Permutation.apply_rows
PermuteCols = Permutation.apply_cols
