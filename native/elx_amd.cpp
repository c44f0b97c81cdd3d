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
    // bucketed degrees
    for (int k = 0; k < n; ++k) {
        // pick min-degree vertex (tie -> smallest index for determinism)
        int best = -1;
        size_t best_deg = (size_t)-1;
        for (int v = 0; v < n; ++v) {
            if (eliminated[v]) continue;
            size_t dv = adj[v].size();
            if (dv < best_deg) {
                best_deg = dv;
                best = v;
            }
        }
        perm[k] = best;
        eliminated[best] = 1;
        // form clique among neighbours, remove best
        std::vector<int> nbrs(adj[best].begin(), adj[best].end());
        for (int u : nbrs) adj[u].erase(best);
        for (size_t a = 0; a < nbrs.size(); ++a) {
            int u = nbrs[a];
            if (eliminated[u]) continue;
            for (size_t b = a + 1; b < nbrs.size(); ++b) {
                int v = nbrs[b];
                if (eliminated[v]) continue;
                adj[u].insert(v);
                adj[v].insert(u);
            }
        }
        adj[best].clear();
    }
    return 0;
}
