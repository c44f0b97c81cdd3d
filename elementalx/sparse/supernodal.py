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
# fronts at least this tall route through the DENSE DistMatrix partial
# LDL — 2-D distributed over the attached grid (the reference's big-
# front distribution, ChangeFrontType.hpp); everything below batches
_DENSE_FRONT_MIN = 768


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


def _factor_front_dense(F1: np.ndarray, ns: int, f: int, grid=None
                        ) -> np.ndarray:
    """Partial LDL^T of ONE large front through the dense DistMatrix
    stack — 2-D block distribution over ``grid`` when attached, so the
    root-front work of a big 2-D problem is genuinely sharded
    (reference: ChangeFrontType.hpp's switch to distributed 2-D fronts,
    numeric/Process.hpp). Eliminates the leading ns columns:

        F11 = L11 D1 L11^T          (dense unpivoted LDL)
        L21 = F21 L11^{-T} D1^{-1}  (Trsm + diagonal scale)
        S22 = F22 - L21 D1 L21^T    (Gemm)

    Returns the front in the batched-kernel's packed layout: L panel
    with D on the leading diagonal in columns [:ns], Schur in
    [ns:, ns:]."""
    import jax.numpy as jnp

    from ..core.dmatrix import DistMatrix
    from ..core.grid import Grid
    from ..core.types import LOWER, MC, MR, RIGHT, TRANSPOSE, UNIT
    from ..blas.gemm import Gemm
    from ..blas.level1 import Transpose as _T
    from ..blas.trsm import Trsm
    from ..core.types import NORMAL
    from ..lapack.ldl import LDL

    g = grid if grid is not None else Grid(1, 1)
    A11 = DistMatrix.from_global(jnp.asarray(F1[:ns, :ns]), MC, MR, g)
    F11 = LDL(A11, conjugate=False)
    pk11 = np.asarray(F11.global_array())
    d1 = np.diagonal(pk11).copy()
    out = np.array(F1)
    out[:ns, :ns] = np.tril(pk11)
    out[:ns, :ns][np.arange(ns), np.arange(ns)] = d1
    if f > ns:
        L1 = F11.with_data(jnp.tril(F11.data, -1)
                           + jnp.eye(F11.data.shape[0], dtype=F11.dtype))
        A21 = DistMatrix.from_global(jnp.asarray(F1[ns:f, :ns]), MC, MR, g)
        X = Trsm(RIGHT, LOWER, TRANSPOSE, UNIT, 1.0, L1, A21)
        Xh = np.asarray(X.global_array())
        safe = np.where(d1 == 0, 1.0, d1)
        L21 = Xh / safe[None, :]
        LD = DistMatrix.from_global(jnp.asarray(L21 * d1[None, :]), MC,
                                    MR, g)
        L21dm = DistMatrix.from_global(jnp.asarray(L21), MC, MR, g)
        upd = np.asarray(Gemm(NORMAL, TRANSPOSE, 1.0, LD,
                              L21dm).global_array())
        out[ns:f, :ns] = L21
        out[ns:f, ns:f] = F1[ns:f, ns:f] - upd
    return out


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

    pos = np.empty(n, np.int64)  # scratch: global row -> front position

    def _assemble(s: int, fp: int) -> np.ndarray:
        """Assemble supernode s's (fp, fp) front: vectorized scatter of
        A's lower-triangle columns (no per-nonzero Python loop) +
        extend-add of the children's Schur updates."""
        c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
        ns = c1 - c0
        rows_s = sym.sn_rows[s]
        f = ns + rows_s.shape[0]
        F1 = np.zeros((fp, fp), dtype)
        pos[c0:c1] = np.arange(ns)
        pos[rows_s] = ns + np.arange(rows_s.shape[0])
        p0, p1 = int(colptr[c0]), int(colptr[c1])
        rr = rowind[p0:p1]
        cnt = np.diff(colptr[c0:c1 + 1])
        cc = np.repeat(np.arange(ns, dtype=np.int64), cnt)
        keep = rr >= (cc + c0)     # lower triangle only
        # CSC rows are unique per column => no duplicate (row, col)
        # pairs, so fancy-indexed += is a complete scatter-add
        F1[pos[rr[keep]], cc[keep]] += values[p0:p1][keep]
        for c in children[s]:
            U = updates[c]
            if U is None:
                continue
            rc = sym.sn_rows[c]
            wh = pos[rc]
            F1[np.ix_(wh, wh)] += U
            updates[c] = None
        if fp > f:
            F1[range(f, fp), range(f, fp)] = 1.0
        return F1

    def _unpack(s: int, Fb: np.ndarray) -> None:
        c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
        ns, f = int(sn_ns[s]), int(sn_f[s])
        panels[s] = Fb[:f, :ns].copy()
        d[c0:c1] = np.diagonal(Fb)[:ns]
        updates[s] = Fb[ns:f, ns:f].copy() if f > ns else None

    for lev in sym.levels:
        # big fronts route through the dense 2-D-distributed partial LDL
        # (ChangeFrontType.hpp); the rest bucket by padded front size
        buckets: Dict[int, List[int]] = {}
        dense_sns: List[int] = []
        for s in lev:
            s = int(s)
            if int(sn_f[s]) >= _DENSE_FRONT_MIN:
                dense_sns.append(s)
            else:
                buckets.setdefault(_pad_up(int(sn_f[s])), []).append(s)
        for s in dense_sns:
            ns, f = int(sn_ns[s]), int(sn_f[s])
            out = _factor_front_dense(_assemble(s, f), ns, f, grid)
            _unpack(s, out)
        for fp, sns in buckets.items():
            B = len(sns)
            F = np.stack([_assemble(s, fp) for s in sns])
            ns_arr = sn_ns[sns]
            f_arr = sn_f[sns]
            if B * fp * fp >= _DEVICE_BUCKET_ELEMS:
                F = _factor_bucket_device(F, ns_arr, f_arr, grid)
            else:
                F = _factor_bucket_numpy(F, ns_arr, f_arr)
            for b, s in enumerate(sns):
                _unpack(s, F[b])

    return SupernodalLDLFactorization(n, sym.perm, sym, panels, d)


def _solve_buckets(sym: SupernodalSymbolic, lev: np.ndarray):
    """Bucket a level's supernodes by padded (panel width, below-rows)
    shape for batched triangular sweeps."""
    buckets: Dict[tuple, List[int]] = {}
    for s in lev:
        s = int(s)
        ns = int(sym.sn_start[s + 1] - sym.sn_start[s])
        m = int(sym.sn_rows[s].shape[0])
        key = (_pad_up(ns), _pad_up(m) if m else 0)
        buckets.setdefault(key, []).append(s)
    return buckets


def solve(fact: SupernodalLDLFactorization, b: np.ndarray) -> np.ndarray:
    """Triangular sweeps over the supernode forest, BATCHED per level
    (reference: numeric/ solve over the etree). Each level's supernodes
    are independent, so the unit-lower panel solves run as one batched
    ``np.linalg.solve`` per shape bucket and the below-panel updates as
    one batched matmul + a duplicate-accumulating scatter-add — the
    round-2 sweep was a sequential per-supernode loop."""
    sym = fact.sym
    b = np.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    x = b[fact.perm, :].astype(np.result_type(fact.d, b), copy=True)
    nrhs = x.shape[1]

    def _batch(sns, nsp, mp):
        B = len(sns)
        L11 = np.broadcast_to(np.eye(nsp, dtype=x.dtype),
                              (B, nsp, nsp)).copy()
        P21 = np.zeros((B, mp, nsp), x.dtype) if mp else None
        for i, s in enumerate(sns):
            ns = int(sym.sn_start[s + 1] - sym.sn_start[s])
            P = fact.panels[s]
            L11[i, :ns, :ns] = np.tril(P[:ns, :ns], -1) \
                + np.eye(ns, dtype=x.dtype)
            if mp:
                m = P.shape[0] - ns
                P21[i, :m, :ns] = P[ns:, :ns]
        return L11, P21

    # forward sweep, leaves first
    for lev in sym.levels:
        for (nsp, mp), sns in _solve_buckets(sym, lev).items():
            B = len(sns)
            L11, P21 = _batch(sns, nsp, mp)
            X1 = np.zeros((B, nsp, nrhs), x.dtype)
            for i, s in enumerate(sns):
                c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
                X1[i, :c1 - c0] = x[c0:c1]
            Y = np.linalg.solve(L11, X1)
            for i, s in enumerate(sns):
                c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
                x[c0:c1] = Y[i, :c1 - c0]
            if mp:
                Z = P21 @ Y                       # (B, mp, nrhs)
                rows_cat = np.concatenate(
                    [sym.sn_rows[s] for s in sns])
                z_cat = np.concatenate(
                    [Z[i, :sym.sn_rows[s].shape[0]]
                     for i, s in enumerate(sns)], axis=0)
                # ancestor rows can repeat across the level's fronts
                np.subtract.at(x, rows_cat, z_cat)
    # diagonal
    x /= fact.d[:, None]
    # backward sweep, root level first
    for lev in reversed(sym.levels):
        for (nsp, mp), sns in _solve_buckets(sym, lev).items():
            B = len(sns)
            L11, P21 = _batch(sns, nsp, mp)
            X1 = np.zeros((B, nsp, nrhs), x.dtype)
            for i, s in enumerate(sns):
                c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
                X1[i, :c1 - c0] = x[c0:c1]
            if mp:
                XR = np.zeros((B, mp, nrhs), x.dtype)
                for i, s in enumerate(sns):
                    rows = sym.sn_rows[s]
                    XR[i, :rows.shape[0]] = x[rows]
                X1 -= np.transpose(P21, (0, 2, 1)) @ XR
            Y = np.linalg.solve(np.transpose(L11, (0, 2, 1)), X1)
            for i, s in enumerate(sns):
                c0, c1 = int(sym.sn_start[s]), int(sym.sn_start[s + 1])
                x[c0:c1] = Y[i, :c1 - c0]
    out = np.empty_like(x)
    out[fact.perm, :] = x
    return out[:, 0] if squeeze else out
