// Supernodal symbolic analysis for the multifrontal sparse LDL.
//
// Native replacement for the Python symbolic phase of
// elementalx/sparse/supernodal.py (reference role:
// src/lapack_like/factor/LDL/sparse/symbolic/ — the reference performs
// this host-side graph work on every rank; here it is one sequential
// C++ pass). Given the ORIGINAL CSC pattern and a fill-reducing
// ordering, computes in one call:
//   * the permuted pattern's elimination tree (Liu's algorithm),
//   * a postorder, and the total ordering permT = perm0 ∘ post,
//   * the relabeled etree and per-column L structures (child->parent
//     pattern propagation in postorder with stamp-array dedup),
//   * fundamental supernodes (width-capped) with their below-panel
//     row structures in CSR form.
//
// C API (all int64 buffers caller-allocated):
//   long long elx_sn_symbolic(
//       int n, const long long* colptr, const int* rowind,
//       const long long* perm0, int sn_max,
//       long long* permT,      // out (n)
//       long long* parent,     // out (n)  relabeled etree
//       long long* sn_start,   // out (n+1), nsn+1 entries used
//       long long* snid,       // out (n)
//       long long* sn_parent,  // out (n),  nsn entries used
//       long long* rowptr,     // out (n+1), nsn+1 entries used
//       long long* rows,       // out (cap)
//       long long cap);
// Returns nsn on success; -(needed) when ``cap`` is too small (call
// again with that capacity); -1 on bad input.

#include <algorithm>
#include <vector>
#include <cstdint>

namespace {

void etree_liu(int n, const std::vector<long long>& cp,
               const std::vector<int>& ri, std::vector<long long>& parent) {
    std::vector<long long> ancestor(n, -1);
    parent.assign(n, -1);
    for (int j = 0; j < n; ++j) {
        for (long long p = cp[j]; p < cp[j + 1]; ++p) {
            long long i = ri[p];
            if (i >= j) continue;
            while (true) {
                long long a = ancestor[i];
                ancestor[i] = j;
                if (a == -1) {
                    if (parent[i] == -1 && i != j) parent[i] = j;
                    break;
                }
                if (a == j) break;
                i = a;
            }
        }
    }
}

void postorder_tree(int n, const std::vector<long long>& parent,
                    std::vector<long long>& post) {
    // children lists via counting sort
    std::vector<long long> head(n, -1), next(n, -1);
    for (int v = n - 1; v >= 0; --v) {   // reversed: children ascending
        long long p = parent[v];
        if (p != -1) { next[v] = head[p]; head[p] = v; }
    }
    post.clear();
    post.reserve(n);
    std::vector<long long> stack;
    for (int r = 0; r < n; ++r) {
        if (parent[r] != -1) continue;
        // iterative DFS emitting children before the parent
        stack.push_back(~(long long)r);
        while (!stack.empty()) {
            long long v = stack.back(); stack.pop_back();
            if (v < 0) {                  // first visit
                v = ~v;
                stack.push_back(v);       // emit after children
                // push children (they are in ascending order via head)
                std::vector<long long> kids;
                for (long long c = head[v]; c != -1; c = next[c])
                    kids.push_back(c);
                for (auto it = kids.rbegin(); it != kids.rend(); ++it)
                    stack.push_back(~*it);
            } else {
                post.push_back(v);
            }
        }
    }
}

}  // namespace

extern "C" long long elx_sn_symbolic(
    int n, const long long* colptr, const int* rowind,
    const long long* perm0, int sn_max,
    long long* permT, long long* parent_out, long long* sn_start,
    long long* snid, long long* sn_parent, long long* rowptr,
    long long* rows, long long cap) {
    if (n <= 0 || sn_max <= 0) return -1;
    long long nnz = colptr[n];

    // ---- permuted pattern A(p0, p0) in CSC (pattern only) ----
    std::vector<long long> inv(n);
    for (int k = 0; k < n; ++k) inv[perm0[k]] = k;
    auto permute = [&](const std::vector<long long>& prm_inv,
                       const long long* cp_in, const int* ri_in,
                       std::vector<long long>& cp_out,
                       std::vector<int>& ri_out) {
        std::vector<long long> cnt(n + 1, 0);
        for (int j = 0; j < n; ++j)
            for (long long p = cp_in[j]; p < cp_in[j + 1]; ++p)
                ++cnt[prm_inv[j] + 1];
        for (int j = 0; j < n; ++j) cnt[j + 1] += cnt[j];
        cp_out = cnt;                       // copy of running offsets
        ri_out.assign(nnz, 0);
        std::vector<long long> w(cp_out.begin(), cp_out.end() - 1);
        for (int j = 0; j < n; ++j) {
            long long nj = prm_inv[j];
            for (long long p = cp_in[j]; p < cp_in[j + 1]; ++p)
                ri_out[w[nj]++] = (int)prm_inv[ri_in[p]];
        }
    };

    std::vector<long long> cp1;
    std::vector<int> ri1;
    permute(inv, colptr, rowind, cp1, ri1);

    // ---- etree + postorder on the perm0-relabeled pattern ----
    std::vector<long long> par1, post;
    etree_liu(n, cp1, ri1, par1);
    postorder_tree(n, par1, post);

    // total ordering permT = perm0[post]; relabel pattern by post
    std::vector<long long> inv2(n);
    for (int k = 0; k < n; ++k) inv2[post[k]] = k;
    for (int k = 0; k < n; ++k) permT[k] = perm0[post[k]];

    std::vector<long long> cp2;
    std::vector<int> ri2;
    permute(inv2, cp1.data(), ri1.data(), cp2, ri2);

    std::vector<long long> parent;
    etree_liu(n, cp2, ri2, parent);
    for (int j = 0; j < n; ++j) parent_out[j] = parent[j];

    // ---- per-column L structures: postorder propagation ----
    // (after relabeling, the natural order IS a postorder, so when
    // column pj is processed every child's struct is already final)
    std::vector<std::vector<int>> structs(n);
    std::vector<long long> stamp(n, -1);
    for (int j = 0; j < n; ++j) {
        for (long long p = cp2[j]; p < cp2[j + 1]; ++p) {
            int i = ri2[p];
            if (i > j && stamp[i] != j) { stamp[i] = j; structs[j].push_back(i); }
        }
    }
    // children lists of the relabeled etree
    std::vector<long long> chead(n, -1), cnext(n, -1);
    for (int v = 0; v < n; ++v) {
        long long p = parent[v];
        if (p != -1) { cnext[v] = chead[p]; chead[p] = v; }
    }
    // merge child structs into each parent, grouped BY PARENT so the
    // dedup stamp (keyed n + pj, disjoint from the pass-1 keys) is
    // never invalidated by interleaved merges into other parents
    for (int pj = 0; pj < n; ++pj) {
        if (chead[pj] == -1) continue;
        long long key = (long long)n + pj;
        for (int i : structs[pj]) stamp[i] = key;
        for (long long j = chead[pj]; j != -1; j = cnext[j]) {
            for (int i : structs[j]) {
                if (i == pj) continue;
                if (stamp[i] != key) {
                    stamp[i] = key;
                    structs[pj].push_back(i);
                }
            }
        }
    }

    // ---- fundamental supernodes (width-capped) ----
    long long nsn = 0;
    sn_start[0] = 0;
    for (int j = 1; j < n; ++j) {
        bool fuse = parent[j - 1] == j
            && (long long)structs[j - 1].size() == (long long)structs[j].size() + 1
            && j - sn_start[nsn] < sn_max;
        if (!fuse) sn_start[++nsn] = j;
    }
    sn_start[++nsn] = n;  // nsn now = count
    for (long long s = 0; s < nsn; ++s)
        for (long long j = sn_start[s]; j < sn_start[s + 1]; ++j)
            snid[j] = s;
    for (long long s = 0; s < nsn; ++s) {
        long long lj = sn_start[s + 1] - 1;
        long long pj = parent[lj];
        sn_parent[s] = pj == -1 ? -1 : snid[pj];
    }

    // ---- per-supernode rows (struct of the last column), CSR ----
    long long total = 0;
    for (long long s = 0; s < nsn; ++s)
        total += (long long)structs[sn_start[s + 1] - 1].size();
    if (total > cap) return -total;
    rowptr[0] = 0;
    for (long long s = 0; s < nsn; ++s) {
        auto& v = structs[sn_start[s + 1] - 1];
        std::sort(v.begin(), v.end());
        for (size_t t = 0; t < v.size(); ++t)
            rows[rowptr[s] + (long long)t] = v[t];
        rowptr[s + 1] = rowptr[s] + (long long)v.size();
    }
    return nsn;
}
