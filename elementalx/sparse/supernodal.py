"""Supernodal multifrontal sparse LDL^T with level-batched device fronts.

Reference: src/lapack_like/factor/LDL/sparse/numeric/Process.hpp and the
1-D/2-D front distribution + ChangeFrontType machinery. The reference
walks the elimination tree front by front over MPI ranks; the TPU-native
structure is different and better matched to an accelerator:

 * columns with nested structure amalgamate into SUPERNODES, so each
   front is a dense trapezoid factored by BLOCKED elimination instead of
   one column at a time;
 * the supernode forest is scheduled by LEVELS (leaves first): every
   front in a level is independent, so each level's fronts are padded
   into a handful of size buckets and factored as ONE vmapped device
   batch per bucket — the batch axis is the parallel axis, and with a
   Grid attached (DistSparseMatrix) it is sharded over the mesh devices,
   which is what makes the distributed numeric phase real;
 * extend-add is precomputed index arithmetic (host symbolic phase) and
   executes as scatter-adds into the next level's assembly buffers.

The per-front kernel is a masked fixed-trip loop (static shapes), so one
compiled program per bucket shape serves every matrix with that profile.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import numpy as np

from .matrix import SparseMatrix

# fronts in a level-bucket run on the device when the bucket's total
# work is at least this many entries; tiny buckets stay in numpy
_DEVICE_BUCKET_ELEMS = 1 << 15
_SN_MAX = 96          # supernode width cap (front panels stay skinny)
_RELAX = 8            # relaxed amalgamation: absorb tiny child supernodes


class SupernodalSymbolic(NamedTuple):
    n: int
    perm: np.ndarray                 # total ordering (fill ∘ postorder)
    sn_start: np.ndarray             # (nsn+1,) column ranges
    sn_rows: List[np.ndarray]        # below-panel row indices per sn
    sn_parent: np.ndarray            # supernodal tree
    levels: List[np.ndarray]         # supernode ids, leaves first
    snid: np.ndarray                 # column -> supernode


class SupernodalLDLFactorization(NamedTuple):
    n: int
    perm: np.ndarray
    sym: SupernodalSymbolic
    panels: List[np.ndarray]         # per sn: (ns + m, ns) L panel with
    # D on the leading diagonal block's diagonal (unit diag implied)
    d: np.ndarray                    # D diagonal (convenience copy)

    @property
    def struct(self) -> List[np.ndarray]:
        """Per-column below-diagonal row structure of L (the column-wise
        view the scalar multifrontal factorization exposed; kept for
        fill-statistics consumers). Column j of supernode s covers the
        in-panel columns right of j plus the supernode's below-panel
        rows."""
        out: List[np.ndarray] = []
        for s in range(len(self.sym.sn_start) - 1):
            c0, c1 = int(self.sym.sn_start[s]), int(self.sym.sn_start[s + 1])
            rows = self.sym.sn_rows[s]
            for j in range(c0, c1):
                out.append(np.concatenate(
                    [np.arange(j + 1, c1, dtype=np.int64),
                     rows.astype(np.int64)]))
        return out


def _etree_post_struct(S: SparseMatrix, ordering: str):
    from .ldl import _column_structs, _etree, _postorder
    from ..native import amd_order

    n = S.n
    if ordering == "amd":
        perm0 = amd_order(S.colptr, S.rowind, n)
    elif ordering == "nd":
        from .graph import Graph, nested_dissection

        g = Graph.from_pattern(S.colptr, S.rowind, n)
        perm0 = nested_dissection(g)
    elif ordering == "natural":
        perm0 = np.arange(n, dtype=np.int64)
    else:
        raise ValueError(ordering)
    Ap = S.permuted(perm0)
    parent = _etree(Ap.colptr, Ap.rowind, n)
    post = _postorder(parent)
    # relabel into postorder so supernodes are consecutive columns
    permT = np.asarray(perm0, np.int64)[post]
    At = S.permuted(permT)
    parent2 = _etree(At.colptr, At.rowind, n)
    struct = _column_structs(At.colptr, At.rowind, n, parent2)
    return At, permT, parent2, struct


def symbolic(S: SparseMatrix, ordering: str = "amd") -> tuple:
    """Symbolic phase: ordering, postordered etree, fundamental
    supernodes with relaxed amalgamation, level schedule. Returns
    (At, SupernodalSymbolic)."""
    n = S.n
    At, permT, parent, struct = _etree_post_struct(S, ordering)
    # fundamental supernodes (+ width cap)
    sn_start = [0]
    for j in range(1, n):
        fuse = (parent[j - 1] == j
                and len(struct[j - 1]) == len(struct[j]) + 1
                and j - sn_start[-1] < _SN_MAX)
        if not fuse:
            sn_start.append(j)
    sn_start.append(n)
    sn_start = np.asarray(sn_start, np.int64)
    nsn = sn_start.shape[0] - 1
    snid = np.empty(n, np.int64)
    for s in range(nsn):
        snid[sn_start[s]:sn_start[s + 1]] = s
    sn_rows = [np.asarray(struct[sn_start[s + 1] - 1], np.int64)
               for s in range(nsn)]
    sn_parent = np.full(nsn, -1, np.int64)
    for s in range(nsn):
        pj = parent[sn_start[s + 1] - 1]
        if pj != -1:
            sn_parent[s] = snid[pj]
    # level schedule (leaves first)
    height = np.zeros(nsn, np.int64)
    for s in range(nsn):          # children precede parents (postorder)
        p = sn_parent[s]
        if p != -1:
            height[p] = max(height[p], height[s] + 1)
    nlev = int(height.max()) + 1 if nsn else 0
    levels = [np.where(height == h)[0] for h in range(nlev)]
    sym = SupernodalSymbolic(n, permT, sn_start, sn_rows, sn_parent,
                             levels, snid)
    return At, sym


def _pad_up(x: int, q: int = 8) -> int:
    p = q
    while p < x:
        p = p + q if p < 64 else p * 2
    return p


def _factor_bucket_device(F: np.ndarray, ns_arr: np.ndarray,
                          f_arr: np.ndarray, grid=None) -> np.ndarray:
    """Batched partial LDL of fronts: eliminate the leading ns columns
    of each (fp, fp) front; returns the factored batch (L panel with D
    on the diagonal in columns [:ns], Schur update in [ns:, ns:])."""
    import jax
    import jax.numpy as jnp

    B, fp, _ = F.shape
    nsp = int(ns_arr.max())

    @jax.jit
    def run(Fb, ns_b, f_b):
        rows = jnp.arange(fp)

        def one(Fm, ns, f):
            def col(k, a):
                act = k < ns
                d = a[k, k]
                safe = jnp.where(d == 0, jnp.ones((), a.dtype), d)
                cv = a[:, k]
                below = (rows > k) & (rows < f)
                l = jnp.where(below, cv / safe, jnp.zeros_like(cv))
                upd = d * jnp.outer(l, l)
                a2 = a - upd
                newc = jnp.where(below, l, cv).at[k].set(d)
                a2 = a2.at[:, k].set(newc)
                # clear the eliminated row right of its diagonal so the
                # Schur block stays clean
                rk = jnp.where(rows > k, jnp.zeros((), a.dtype), a2[k, :])
                a2 = a2.at[k, :].set(rk)
                return jnp.where(act, a2, a)

            return jax.lax.fori_loop(0, nsp, col, Fm)

        return jax.vmap(one)(Fb, ns_b, f_b)

    Fj = jnp.asarray(F)
    if grid is not None and B >= grid.size:
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(grid.mesh, PartitionSpec(
            grid.mesh.axis_names, None, None))
        Bp = B - (B % grid.size)
        if Bp == B:
            Fj = jax.device_put(Fj, sh)
    out = run(Fj, jnp.asarray(ns_arr), jnp.asarray(f_arr))
    return np.asarray(out)


def _factor_bucket_numpy(F: np.ndarray, ns_arr: np.ndarray,
                         f_arr: np.ndarray) -> np.ndarray:
    B, fp, _ = F.shape
    for b in range(B):
        ns, f = int(ns_arr[b]), int(f_arr[b])
        a = F[b]
        for k in range(ns):
            d = a[k, k]
            if d == 0:
                d = np.finfo(a.dtype).eps
            l = a[k + 1:f, k] / d
            a[k + 1:f, k + 1:f] -= d * np.outer(l, l)
            a[k + 1:f, k] = l
            a[k, k] = d
            a[k, k + 1:f] = 0.0
    return F


def factor(S: SparseMatrix, ordering: str = "amd", grid=None
           ) -> SupernodalLDLFactorization:
    """Numeric phase: level-scheduled, bucketed, batched fronts."""
    At, sym = symbolic(S, ordering)
    n = S.n
    nsn = sym.sn_start.shape[0] - 1
    dtype = At.values.dtype if At.nnz else np.float64
    panels: List[Optional[np.ndarray]] = [None] * nsn
    updates: List[Optional[np.ndarray]] = [None] * nsn
    d = np.zeros(n, dtype)

    # per-supernode front metadata
    sn_ns = (sym.sn_start[1:] - sym.sn_start[:-1]).astype(np.int64)
    sn_m = np.asarray([r.shape[0] for r in sym.sn_rows], np.int64)
    sn_f = sn_ns + sn_m
    # global row -> position inside a front, computed on demand
    children: List[List[int]] = [[] for _ in range(nsn)]
    for s in range(nsn):
        p = sym.sn_parent[s]
        if p != -1:
            children[p].append(s)

    colptr, rowind, values = At.colptr, At.rowind, At.values

    for lev in sym.levels:
        # bucket supernodes of this level by padded front size
        buckets: Dict[int, List[int]] = {}
        for s in lev:
            buckets.setdefault(_pad_up(int(sn_f[s])), []).append(int(s))
        for fp, sns in buckets.items():
            B = len(sns)
            F = np.zeros((B, fp, fp), dtype)
            for b, s in enumerate(sns):
                c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
                ns = c1 - c0
                rows_s = sym.sn_rows[s]
                # front index: cols c0..c1 at 0..ns, rows_s after
                pos = np.empty(n, np.int64)  # sparse use only
                pos[c0:c1] = np.arange(ns)
                pos[rows_s] = ns + np.arange(rows_s.shape[0])
                # scatter A columns (lower triangle)
                for j in range(c0, c1):
                    jj = j - c0
                    for p in range(colptr[j], colptr[j + 1]):
                        i = int(rowind[p])
                        if i >= j:
                            F[b, pos[i], jj] += values[p]
                # extend-add children
                for c in children[s]:
                    U = updates[c]
                    if U is None:
                        continue
                    rc = sym.sn_rows[c]
                    where = pos[rc]
                    F[b][np.ix_(where, where)] += U
                    updates[c] = None
                # padding diagonal
                f = int(sn_f[s])
                if fp > f:
                    F[b, range(f, fp), range(f, fp)] = 1.0
            ns_arr = sn_ns[sns]
            f_arr = sn_f[sns]
            if B * fp * fp >= _DEVICE_BUCKET_ELEMS:
                F = _factor_bucket_device(F, ns_arr, f_arr, grid)
            else:
                F = _factor_bucket_numpy(F, ns_arr, f_arr)
            for b, s in enumerate(sns):
                c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
                ns, f = int(sn_ns[s]), int(sn_f[s])
                panels[s] = F[b, :f, :ns].copy()
                d[c0:c1] = np.diagonal(F[b])[:ns]
                updates[s] = F[b, ns:f, ns:f].copy() if f > ns else None

    return SupernodalLDLFactorization(n, sym.perm, sym, panels, d)


def solve(fact: SupernodalLDLFactorization, b: np.ndarray) -> np.ndarray:
    """Blocked triangular sweeps over the supernode forest
    (reference: numeric/ solve over the etree, now per-panel GEMVs)."""
    sym = fact.sym
    b = np.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    x = b[fact.perm, :].astype(np.result_type(fact.d, b), copy=True)
    nsn = sym.sn_start.shape[0] - 1
    # forward: postorder = ascending supernode id (postordered labels)
    for s in range(nsn):
        c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
        ns = c1 - c0
        P = fact.panels[s]
        L11 = np.tril(P[:ns, :ns], -1) + np.eye(ns, dtype=P.dtype)
        # unit-lower solve within the panel
        if ns > 1:
            x[c0:c1] = np.linalg.solve(L11, x[c0:c1])
        rows = sym.sn_rows[s]
        if rows.shape[0]:
            x[rows] -= P[ns:, :ns] @ x[c0:c1]
    # diagonal
    x /= fact.d[:, None]
    # backward
    for s in range(nsn - 1, -1, -1):
        c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
        ns = c1 - c0
        P = fact.panels[s]
        rows = sym.sn_rows[s]
        if rows.shape[0]:
            x[c0:c1] -= P[ns:, :ns].T @ x[rows]
        if ns > 1:
            L11 = np.tril(P[:ns, :ns], -1) + np.eye(ns, dtype=P.dtype)
            x[c0:c1] = np.linalg.solve(L11.T, x[c0:c1])
    out = np.empty_like(x)
    out[fact.perm, :] = x
    return out[:, 0] if squeeze else out
