// Native host-side chordal analysis: greedy minimum-degree ordering and
// symbolic Cholesky (chordal extension).
//
// The reference reaches these through QDLDL's AMD + logical factorization
// (reference: src/chordal_decomposition/trees.jl:634-642). Here they are
// plain C++ called via ctypes — they run once per solve at setup time, but
// for 10k+-vertex aggregate sparsity graphs the pure-Python fallback
// (cosmo_tpu/chordal/graph.py) takes minutes while this takes fractions of
// a second.
//
// Build: g++ -O3 -shared -fPIC chordal.cpp -o _chordal.so
#include <cstdint>
#include <vector>
#include <algorithm>
#include <unordered_set>

extern "C" {

// Greedy minimum-degree ordering.
//  n        : number of vertices
//  nnz      : number of (undirected, deduplicated, no-self-loop) edges * 2
//  adj_i/j  : edge endpoints, both directions present
//  perm_out : [n] vertex eliminated at step k
int64_t min_degree(int64_t n, int64_t nnz, const int64_t* adj_i,
                   const int64_t* adj_j, int64_t* perm_out) {
    std::vector<std::unordered_set<int64_t>> adj(n);
    for (int64_t e = 0; e < nnz; ++e) {
        if (adj_i[e] != adj_j[e]) adj[adj_i[e]].insert(adj_j[e]);
    }
    std::vector<char> alive(n, 1);
    // simple bucketed minimum-degree selection
    std::vector<int64_t> degree(n);
    for (int64_t v = 0; v < n; ++v) degree[v] = (int64_t)adj[v].size();

    for (int64_t k = 0; k < n; ++k) {
        // find min-degree alive vertex (linear scan; fine for <= ~1e5)
        int64_t best = -1, best_deg = INT64_MAX;
        for (int64_t v = 0; v < n; ++v) {
            if (alive[v] && degree[v] < best_deg) {
                best = v;
                best_deg = degree[v];
                if (best_deg == 0) break;
            }
        }
        perm_out[k] = best;
        alive[best] = 0;
        // eliminate: clique the neighborhood
        std::vector<int64_t> nbrs(adj[best].begin(), adj[best].end());
        for (int64_t u : nbrs) {
            adj[u].erase(best);
            for (int64_t w : nbrs) {
                if (w != u) adj[u].insert(w);
            }
        }
        for (int64_t u : nbrs) degree[u] = (int64_t)adj[u].size();
        adj[best].clear();
    }
    return 0;
}

// Symbolic Cholesky of the permuted adjacency + I.
//  perm     : ordering (tree vertex v <-> original vertex perm[v])
//  cap      : capacity of rowval_out
//  colptr_out : [n+1]
//  rowval_out : [cap] subdiagonal pattern of L, column-major (permuted coords)
// Returns nnz(L), or -(needed) if cap was insufficient.
int64_t symbolic_cholesky(int64_t n, int64_t nnz, const int64_t* adj_i,
                          const int64_t* adj_j, const int64_t* perm,
                          int64_t cap, int64_t* colptr_out,
                          int64_t* rowval_out) {
    std::vector<int64_t> iperm(n);
    for (int64_t v = 0; v < n; ++v) iperm[perm[v]] = v;

    // permuted higher adjacency
    std::vector<std::vector<int64_t>> higher(n);
    for (int64_t e = 0; e < nnz; ++e) {
        int64_t pu = iperm[adj_i[e]], pv = iperm[adj_j[e]];
        if (pv > pu) higher[pu].push_back(pv);
    }

    // Struct(L_j) = Adj+(j) U ( U_{c: parent(c)=j} Struct(L_c) \ {j} )
    std::vector<std::vector<int64_t>> cols(n);
    std::vector<std::vector<int64_t>> children(n);
    std::vector<int64_t> mark(n, -1);
    int64_t total = 0;
    for (int64_t j = 0; j < n; ++j) {
        std::vector<int64_t>& col = cols[j];
        for (int64_t r : higher[j]) {
            if (mark[r] != j) { mark[r] = j; col.push_back(r); }
        }
        for (int64_t c : children[j]) {
            for (int64_t r : cols[c]) {
                if (r != j && mark[r] != j) { mark[r] = j; col.push_back(r); }
            }
            cols[c].shrink_to_fit();
        }
        std::sort(col.begin(), col.end());
        total += (int64_t)col.size();
        if (!col.empty()) children[col[0]].push_back(j);
    }
    if (total > cap) return -total;
    int64_t ptr = 0;
    for (int64_t j = 0; j < n; ++j) {
        colptr_out[j] = ptr;
        for (int64_t r : cols[j]) rowval_out[ptr++] = r;
    }
    colptr_out[n] = ptr;
    return total;
}

}  // extern "C"
