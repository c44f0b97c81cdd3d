"""Graph / DistGraph: adjacency structure for sparse symbolic analysis.

Reference: the original Elemental core sparse classes (Graph, DistGraph)
that the Hydrogen fork DELETED (SURVEY §0: only a dangling reference in
include/El/lapack_like/factor/ldl/sparse/numeric.hpp remains) — rebuilt
fresh here as the spec requires. Host-side numpy: symbolic analysis is
setup-time graph work (SURVEY §2.6)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class Graph:
    """Undirected adjacency structure in CSR-ish (offsets, targets) form
    (the reference Graph's sources/targets representation)."""

    def __init__(self, num_vertices: int):
        self.n = num_vertices
        self._edges: List[Tuple[int, int]] = []
        self.offsets: Optional[np.ndarray] = None
        self.targets: Optional[np.ndarray] = None

    def connect(self, u: int, v: int) -> None:
        """Queue an undirected edge (reference: Graph::Connect/QueueConnection)."""
        self._edges.append((u, v))
        if u != v:
            self._edges.append((v, u))

    def process_queues(self) -> None:
        """Build CSR (reference: ProcessQueues)."""
        if not self._edges:
            self.offsets = np.zeros(self.n + 1, np.int64)
            self.targets = np.zeros(0, np.int32)
            return
        e = np.unique(np.asarray(self._edges, np.int64), axis=0)
        src, dst = e[:, 0], e[:, 1]
        counts = np.bincount(src, minlength=self.n)
        self.offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.targets = dst.astype(np.int32)

    @staticmethod
    def from_pattern(colptr: np.ndarray, rowind: np.ndarray, n: int
                     ) -> "Graph":
        g = Graph(n)
        for j in range(n):
            for p in range(colptr[j], colptr[j + 1]):
                i = int(rowind[p])
                if i != j:
                    g._edges.append((i, j))
                    g._edges.append((j, i))
        g.process_queues()
        return g

    def neighbors(self, v: int) -> np.ndarray:
        return self.targets[self.offsets[v]:self.offsets[v + 1]]


def nested_dissection(g: Graph, leaf_size: int = 32) -> np.ndarray:
    """Fill-reducing ordering by recursive BFS bisection with
    minimum-degree leaves (reference role:
    factor/LDL/sparse/symbolic/NestedDissection.cpp, which used parMETIS/
    AMD; here BFS level-set separators + the native MD ordering)."""
    from ..native import amd_order

    n = g.n
    order: List[int] = []

    def recurse(vertices: np.ndarray):
        m = vertices.shape[0]
        if m == 0:
            return
        if m <= leaf_size:
            # minimum-degree on the subgraph
            sub = {v: k for k, v in enumerate(vertices)}
            cp = [0]
            ri = []
            for v in vertices:
                nb = [sub[u] for u in g.neighbors(v) if u in sub]
                ri.extend(sorted(nb))
                cp.append(len(ri))
            perm = amd_order(np.asarray(cp, np.int64),
                             np.asarray(ri, np.int32), m)
            order.extend(vertices[perm].tolist())
            return
        # BFS from an arbitrary vertex; split at the median level
        sub = set(vertices.tolist())
        start = int(vertices[0])
        level = {start: 0}
        frontier = [start]
        lev = 0
        while frontier:
            lev += 1
            nxt = []
            for v in frontier:
                for u in g.neighbors(v):
                    u = int(u)
                    if u in sub and u not in level:
                        level[u] = lev
                        nxt.append(u)
            frontier = nxt
        # disconnected remainder gets its own partition
        unreached = [v for v in vertices if int(v) not in level]
        levels = np.asarray([level.get(int(v), -1) for v in vertices])
        reached = vertices[levels >= 0]
        rl = levels[levels >= 0]
        med = int(np.median(rl))
        left = reached[rl < med]
        sep = reached[rl == med]
        right = reached[rl > med]
        if left.size == 0 or right.size == 0:
            # bisection failed (e.g. a clique); min-degree the whole set
            sub2 = {v: k for k, v in enumerate(vertices)}
            cp = [0]
            ri = []
            for v in vertices:
                nb = [sub2[u] for u in g.neighbors(v) if u in sub2]
                ri.extend(sorted(nb))
                cp.append(len(ri))
            perm = amd_order(np.asarray(cp, np.int64),
                             np.asarray(ri, np.int32), vertices.shape[0])
            order.extend(vertices[perm].tolist())
            return
        recurse(left)
        recurse(right)
        if unreached:
            recurse(np.asarray(unreached))
        order.extend(sep.tolist())  # separator last

    recurse(np.arange(n))
    return np.asarray(order, np.int64)


class DistGraph(Graph):
    """Distributed graph (reference: DistGraph — vertex-block ownership
    with sources/targets partitioned by owning rank).

    Single-controller TPU design: symbolic traversals stay host-side
    (as Graph), but after ``process_queues`` the edge list is genuinely
    partitioned: contiguous vertex blocks of ceil(n/p) per device (the
    reference's Blocksize ownership map), host views per rank via
    ``local_sources/local_targets``, and the full (src, tgt) arrays
    resident on the mesh (1-D sharded by source block) for
    device-consuming passes."""

    def __init__(self, num_vertices: int, grid=None):
        super().__init__(num_vertices)
        from ..core.grid import Grid

        self.grid = grid or Grid.default()
        self.edge_src = None   # (Ep,) int32 on device, sharded
        self.edge_tgt = None   # (Ep,) int32 on device, sharded

    def vertex_owner(self, v: int) -> int:
        p = self.grid.size
        blk = -(-self.n // p)
        return min(int(v) // blk, p - 1)

    def local_vertex_range(self, rank: int) -> Tuple[int, int]:
        p = self.grid.size
        blk = -(-self.n // p)
        return rank * blk, min((rank + 1) * blk, self.n)

    def local_sources(self, rank: int) -> np.ndarray:
        """CSR offsets restricted to the rank's vertex block."""
        v0, v1 = self.local_vertex_range(rank)
        return self.offsets[v0:v1 + 1] - self.offsets[v0]

    def local_targets(self, rank: int) -> np.ndarray:
        v0, v1 = self.local_vertex_range(rank)
        return self.targets[self.offsets[v0]:self.offsets[v1]]

    def process_queues(self) -> None:
        super().process_queues()
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        p = self.grid.size
        cnt = np.diff(self.offsets)
        src = np.repeat(np.arange(self.n, dtype=np.int32), cnt)
        E = src.shape[0]
        Ep = max(-(-E // p) * p, p)
        pad = Ep - E
        src = np.concatenate([src, np.full(pad, -1, np.int32)])
        tgt = np.concatenate([self.targets.astype(np.int32),
                              np.full(pad, -1, np.int32)])
        sh = NamedSharding(self.grid.mesh, P(("mc", "mr")))
        self.edge_src = jax.device_put(jnp.asarray(src), sh)
        self.edge_tgt = jax.device_put(jnp.asarray(tgt), sh)
