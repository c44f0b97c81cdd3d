"""lapack_like/util: distributed Sort and Median
(reference: src/lapack_like/util/Sort.cpp, Median.cpp)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.dmatrix import DistMatrix
from ..core.types import ASCENDING, DESCENDING, SortType, UNSORTED


def Sort(x: jax.Array, sort: SortType = ASCENDING) -> jax.Array:
    """Sort a vector (XLA's on-device bitonic/merge sort; the reference
    gathers + std::sorts per rank)."""
    if sort == UNSORTED:
        return x
    s = jnp.sort(x)
    return s if sort == ASCENDING else s[::-1]


def TaggedSort(x: jax.Array, sort: SortType = ASCENDING
               ) -> Tuple[jax.Array, jax.Array]:
    """(sorted values, original indices) — the ValueInt<T> pattern
    (reference: Sort.cpp TaggedSort)."""
    order = jnp.argsort(x)
    if sort == DESCENDING:
        order = order[::-1]
    return x[order], order


def SortColumns(A: DistMatrix, keys: jax.Array,
                sort: SortType = ASCENDING) -> DistMatrix:
    """Reorder columns by keys (used to sort eigenpairs)."""
    order = jnp.argsort(keys)
    if sort == DESCENDING:
        order = order[::-1]
    full = jnp.concatenate(
        [order, jnp.arange(order.shape[0], A.data.shape[1])])
    return A.with_data(A.data[:, full])


def Median(x: jax.Array, n: int = 0) -> jax.Array:
    """Median of the first n (logical) entries (reference: Median.cpp)."""
    if n and n != x.shape[0]:
        x = x[:n]
    return jnp.median(x)


def SortingPermutation(x: jax.Array, sort: SortType = ASCENDING):
    """Permutation that sorts ``x`` (reference: util/Sort.cpp
    SortingPermutation — TaggedSort's index tags as a Permutation)."""
    from .perm import Permutation

    idx = jnp.argsort(jnp.asarray(x).ravel(), stable=True)
    if sort == DESCENDING:
        idx = idx[::-1]
    n = idx.shape[0]
    return Permutation(idx.astype(jnp.int32), n)


def ApplyTaggedSortToEachRow(indices: jax.Array, Z: DistMatrix
                             ) -> DistMatrix:
    """Reorder COLUMNS of Z by a TaggedSort's index vector — each row's
    entries land in sorted-tag order (reference: util/Sort.cpp:136)."""
    d = Z.data
    idx = jnp.asarray(indices, jnp.int32)
    Q = d.shape[1]
    full = jnp.concatenate([idx, jnp.arange(idx.shape[0], Q,
                                            dtype=jnp.int32)])
    return Z.with_data(jnp.take(d, full, axis=1, unique_indices=True))


def ApplyTaggedSortToEachColumn(indices: jax.Array, Z: DistMatrix
                                ) -> DistMatrix:
    """Reorder ROWS of Z by a TaggedSort's index vector
    (reference: util/Sort.cpp:153)."""
    d = Z.data
    idx = jnp.asarray(indices, jnp.int32)
    P = d.shape[0]
    full = jnp.concatenate([idx, jnp.arange(idx.shape[0], P,
                                            dtype=jnp.int32)])
    return Z.with_data(jnp.take(d, full, axis=0, unique_indices=True))
