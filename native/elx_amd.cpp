// Minimum-degree ordering for sparse symmetric factorization.
//
// Clean-room replacement for the role of the vendored
// external/suite_sparse AMD (reference: external/suite_sparse/src/amd/,
// ~5.6k LoC, used by the multifrontal LDL's nested-dissection symbolic
// phase, src/lapack_like/factor/LDL/sparse/symbolic/). This is a plain
// quotient-graph minimum-degree (no approximate-degree aggressive
// absorption); orderings differ from AMD but serve the same fill-
// reducing role. Host-side, sequential — ordering is setup-time graph
// work (SURVEY §2.6 plan).
//
// C API:
//   int elx_amd(int n, const long long* colptr, const int* rowind,
//               int* perm);
// Pattern is CSC of the full symmetric matrix (diagonal optional).
// perm[k] = index of the k-th pivot (image form).

#include <vector>
#include <set>
#include <algorithm>
#include <cstdint>

extern "C" int elx_amd(int n, const long long* colptr, const int* rowind,
                       int* perm) {
    if (n <= 0) return 1;
    std::vector<std::set<int>> adj(n);
    for (int j = 0; j < n; ++j) {
        for (long long p = colptr[j]; p < colptr[j + 1]; ++p) {
            int i = rowind[p];
            if (i == j || i < 0 || i >= n) continue;
            adj[i].insert(j);
            adj[j].insert(i);
        }
    }
    std::vector<char> eliminated(n, 0);
    // bucketed degree lists: O(1) min-degree pick (the former linear
    // scan made the ordering O(n^2) — ~84 s at 90k dof)
    std::vector<int> bhead(n + 1, -1), bnext(n, -1), bprev(n, -1),
        deg(n, 0);
    auto bucket_remove = [&](int v) {
        if (bprev[v] != -1) bnext[bprev[v]] = bnext[v];
        else bhead[deg[v]] = bnext[v];
        if (bnext[v] != -1) bprev[bnext[v]] = bprev[v];
        bprev[v] = bnext[v] = -1;
    };
    auto bucket_insert = [&](int v, int d) {
        deg[v] = d;
        bprev[v] = -1;
        bnext[v] = bhead[d];
        if (bhead[d] != -1) bprev[bhead[d]] = v;
        bhead[d] = v;
    };
    for (int v = 0; v < n; ++v) bucket_insert(v, (int)adj[v].size());
    int mindeg = 0;
    for (int k = 0; k < n; ++k) {
        while (mindeg <= n && bhead[mindeg] == -1) ++mindeg;
        int best = bhead[mindeg];
        bucket_remove(best);
        perm[k] = best;
        eliminated[best] = 1;
        // form clique among neighbours, remove best
        std::vector<int> nbrs(adj[best].begin(), adj[best].end());
        for (int u : nbrs) adj[u].erase(best);
        for (size_t a = 0; a < nbrs.size(); ++a) {
            int u = nbrs[a];
            for (size_t b = a + 1; b < nbrs.size(); ++b) {
                int v = nbrs[b];
                if (adj[u].insert(v).second) adj[v].insert(u);
            }
        }
        for (int u : nbrs) {
            int d = (int)adj[u].size();
            if (d != deg[u]) {
                bucket_remove(u);
                bucket_insert(u, d);
            }
            if (d < mindeg) mindeg = d;
        }
        adj[best].clear();
    }
    return 0;
}
