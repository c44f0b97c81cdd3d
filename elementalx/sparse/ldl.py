"""Multifrontal sparse LDL^T factorization.

Reference: src/lapack_like/factor/LDL/sparse/{symbolic,numeric}/ (the
Clique-derived multifrontal code, ~8k LoC, which CANNOT compile in the
reference because the fork deleted its core sparse classes — SURVEY §0;
it is the algorithmic spec here): fill-reducing ordering + elimination
tree (symbolic/), per-front dense partial factorization with extend-add
of children update matrices (numeric/Process.hpp), and triangular solves
sweeping the tree (numeric/solve).

This rebuild: ordering via the native minimum-degree / nested
dissection; Liu's elimination-tree + postorder symbolic phase (host —
graph work); numeric multifrontal with one front per elimination-tree
node, children's Schur updates extend-added with index maps. Dense
front math is numpy below a size threshold (dispatch-bound regime) and
the device MXU above it — the CPU/GPU front split the reference's
ChangeFrontType machinery manages."""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np

from .matrix import SparseMatrix

# fronts at least this large run their Schur update on the device
_DEVICE_FRONT = 512


class SparseLDLFactorization(NamedTuple):
    n: int
    perm: np.ndarray              # fill-reducing ordering (image form)
    parent: np.ndarray            # elimination tree
    post: np.ndarray              # postorder
    struct: List[np.ndarray]      # below-diagonal row pattern per column
    lvals: List[np.ndarray]       # L column values (unit diagonal implied)
    d: np.ndarray                 # D diagonal


def _etree(colptr, rowind, n) -> np.ndarray:
    """Liu's elimination-tree algorithm (reference: symbolic analysis)."""
    parent = np.full(n, -1, np.int64)
    ancestor = np.full(n, -1, np.int64)
    for j in range(n):
        for p in range(colptr[j], colptr[j + 1]):
            i = int(rowind[p])
            if i >= j:
                continue
            # path compression walk from i to the root
            while True:
                a = ancestor[i]
                ancestor[i] = j
                if a == -1:
                    if parent[i] == -1 and i != j:
                        parent[i] = j
                    break
                if a == j:
                    break
                i = a
    return parent


def _postorder(parent: np.ndarray) -> np.ndarray:
    n = parent.shape[0]
    children: List[List[int]] = [[] for _ in range(n)]
    roots = []
    for v in range(n):
        if parent[v] == -1:
            roots.append(v)
        else:
            children[parent[v]].append(v)
    post = []
    for r in roots:
        stack = [(r, iter(children[r]))]
        while stack:
            v, it = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                post.append(v)
                stack.pop()
            else:
                stack.append((nxt, iter(children[nxt])))
    return np.asarray(post, np.int64)


def _column_structs(colptr, rowind, n, parent) -> List[np.ndarray]:
    """Row pattern of each L column (below the diagonal), via upward
    propagation child -> parent."""
    structs: List[set] = [set() for _ in range(n)]
    for j in range(n):
        for p in range(colptr[j], colptr[j + 1]):
            i = int(rowind[p])
            if i > j:
                structs[j].add(i)
    for j in _postorder(parent):
        pj = parent[j]
        if pj != -1:
            structs[pj].update(i for i in structs[j] if i != pj)
    return [np.asarray(sorted(s), np.int64) for s in structs]


def SparseLDL(S: SparseMatrix, ordering: str = "amd",
              supernodal: bool = True, grid=None):
    """Factor P A P^T = L D L^T (unpivoted; valid for SPD and
    quasi-definite matrices — the IPM regime the reference targets).

    ``supernodal=True`` (default) uses the level-batched supernodal
    multifrontal engine (sparse/supernodal.py) whose fronts factor as
    vmapped device batches — the column-at-a-time path below remains as
    the reference implementation and fallback."""
    if supernodal:
        from .supernodal import factor as _sn_factor

        g = grid if grid is not None else getattr(S, "grid", None)
        return _sn_factor(S, ordering, grid=g)
    from ..native import amd_order

    n = S.n
    if ordering == "amd":
        perm = amd_order(S.colptr, S.rowind, n)
    elif ordering == "nd":
        from .graph import Graph, nested_dissection

        g = Graph.from_pattern(S.colptr, S.rowind, n)
        perm = nested_dissection(g)
    elif ordering == "natural":
        perm = np.arange(n, dtype=np.int64)
    else:
        raise ValueError(ordering)
    Ap = S.permuted(perm)
    parent = _etree(Ap.colptr, Ap.rowind, n)
    post = _postorder(parent)
    struct = _column_structs(Ap.colptr, Ap.rowind, n, parent)

    dtype = Ap.values.dtype if Ap.nnz else np.float64
    d = np.zeros(n, dtype)
    lvals: List[Optional[np.ndarray]] = [None] * n
    updates: List[Optional[np.ndarray]] = [None] * n
    children: List[List[int]] = [[] for _ in range(n)]
    for v in range(n):
        if parent[v] != -1:
            children[parent[v]].append(v)

    for j in post:
        idx = struct[j]
        f = 1 + idx.shape[0]
        F = np.zeros((f, f), dtype)
        # scatter A's column j (lower part)
        pos = {int(r): k + 1 for k, r in enumerate(idx)}
        for p in range(Ap.colptr[j], Ap.colptr[j + 1]):
            i = int(Ap.rowind[p])
            if i == j:
                F[0, 0] += Ap.values[p]
            elif i > j:
                F[pos[i], 0] += Ap.values[p]
        # extend-add children updates (reference: numeric/Process.hpp)
        for c in children[j]:
            U = updates[c]
            if U is None:
                continue
            cidx = struct[c]
            # map child's indices into this front: cidx[0] == j
            where = np.empty(cidx.shape[0], np.int64)
            where[0] = 0
            for k in range(1, cidx.shape[0]):
                where[k] = pos[int(cidx[k])]
            F[np.ix_(where, where)] += U
            updates[c] = None
        # eliminate the pivot
        dj = F[0, 0]
        if dj == 0:
            dj = np.finfo(np.float64).eps
        l = F[1:, 0] / dj
        d[j] = dj
        lvals[j] = l
        if f > 1:
            if f >= _DEVICE_FRONT:
                import jax.numpy as jnp

                U = np.asarray(jnp.asarray(F[1:, 1:])
                               - dj * jnp.outer(jnp.asarray(l),
                                                jnp.asarray(l)))
            else:
                U = F[1:, 1:] - dj * np.outer(l, l)
            updates[j] = U
        else:
            updates[j] = None

    return SparseLDLFactorization(n, np.asarray(perm, np.int64), parent,
                                  post, struct,
                                  [x if x is not None else np.zeros(0, dtype)
                                   for x in lvals], d)


def SolveAfter(fact, b: np.ndarray) -> np.ndarray:
    """Solve A x = b from the multifrontal factorization (reference:
    numeric/ solve sweeps over the elimination tree)."""
    from .supernodal import SupernodalLDLFactorization, solve as _sn_solve

    if isinstance(fact, SupernodalLDLFactorization):
        return _sn_solve(fact, b)
    b = np.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    x = b[fact.perm, :].astype(np.result_type(fact.d, b), copy=True)
    # forward: L y = Pb (postorder = topological order of the tree)
    for j in fact.post:
        idx = fact.struct[j]
        if idx.shape[0]:
            x[idx, :] -= np.outer(fact.lvals[j], x[j, :]).reshape(
                idx.shape[0], -1)
    # diagonal
    x /= fact.d[:, None]
    # backward: L^T z = y (reverse postorder)
    for j in fact.post[::-1]:
        idx = fact.struct[j]
        if idx.shape[0]:
            x[j, :] -= fact.lvals[j] @ x[idx, :]
    out = np.empty_like(x)
    out[fact.perm, :] = x
    return out[:, 0] if squeeze else out


def SparseHPDSolve(S: SparseMatrix, b: np.ndarray,
                   ordering: str = "amd") -> np.ndarray:
    """Convenience: factor + solve (reference: sparse HPDSolve driver)."""
    return SolveAfter(SparseLDL(S, ordering), b)
