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


def InversePermuteRows(P: "Permutation", A: DistMatrix) -> DistMatrix:
    """Reference: perm/InversePermuteRows.hpp."""
    return P.apply_rows(A, inverse=True)


def InversePermuteCols(P: "Permutation", A: DistMatrix) -> DistMatrix:
    """Reference: perm/InversePermuteCols.hpp."""
    return P.apply_cols(A, inverse=True)


def PermuteSymmetrically(P: "Permutation", A: DistMatrix,
                         inverse: bool = False) -> DistMatrix:
    """P A P^T (reference: perm/PermuteSymmetrically — both-sided
    application preserving symmetry)."""
    return P.apply_cols(P.apply_rows(A, inverse=inverse), inverse=inverse)


def InversePermuteSymmetrically(P: "Permutation", A: DistMatrix
                                ) -> DistMatrix:
    return PermuteSymmetrically(P, A, inverse=True)


def PivotsToPartialPermutation(pivots: "jax.Array", n: int):
    """Convert a LAPACK-style swap sequence (row j <-> pivots[j]) to the
    image-form permutation it composes to (reference:
    perm/PivotsToPartialPermutation.hpp). Host loop (pivot vectors are
    O(n) and eager in every caller)."""
    import numpy as np

    piv = np.asarray(pivots)
    perm = np.arange(max(n, piv.shape[0]), dtype=np.int64)
    for j in range(min(n, piv.shape[0])):
        p = int(piv[j])
        perm[j], perm[p] = perm[p], perm[j]
    import jax.numpy as jnp

    return Permutation(jnp.asarray(perm, jnp.int32), n)
