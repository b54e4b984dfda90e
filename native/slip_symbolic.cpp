// Native symbolic layer: fill-reducing orderings + elimination-tree tools.
//
// The reference's ordering layer is native C (AMD/Source/amd_2.c's
// elimination loop, COLAMD/Source/colamd.c); this is the framework's
// native equivalent, exposed through a C ABI and bound from Python with
// ctypes (slip_lu_tpu/ordering/native.py). The algorithms mirror the
// pure-Python oracles in slip_lu_tpu/ordering/{amd,colamd}.py exactly —
// same greedy exact-degree minimum-degree elimination, same lazy-deletion
// min-heap with (degree, vertex) keys and vertex-index tie-break — so the
// permutations are bit-identical to the Python fallback (asserted in
// tests/test_native_symbolic.py).
//
// Build: `make -C native` -> libslip_symbolic.so.

#include <cstdint>
#include <cstring>
#include <queue>
#include <set>
#include <vector>

using std::int64_t;

namespace {

// Greedy exact-minimum-degree elimination over an adjacency structure.
// Matches the Python oracle: pop (degree, vertex) pairs from a min-heap,
// skip stale entries, eliminate, clique the live neighbors, recompute
// exact live degrees of the touched vertices, push refreshed keys.
void min_degree_eliminate(std::vector<std::set<int64_t>>& adj,
                          int64_t n, int64_t* out) {
    std::vector<char> alive(n, 1);
    std::vector<int64_t> degree(n);
    using Key = std::pair<int64_t, int64_t>;  // (degree, vertex)
    std::priority_queue<Key, std::vector<Key>, std::greater<Key>> heap;
    for (int64_t v = 0; v < n; ++v) {
        degree[v] = static_cast<int64_t>(adj[v].size());
        heap.push({degree[v], v});
    }
    for (int64_t k = 0; k < n; ++k) {
        int64_t v = -1;
        for (;;) {
            Key top = heap.top();
            heap.pop();
            if (alive[top.second] && top.first == degree[top.second]) {
                v = top.second;
                break;
            }
        }
        out[k] = v;
        alive[v] = 0;
        std::vector<int64_t> nbrs;
        for (int64_t u : adj[v])
            if (alive[u]) nbrs.push_back(u);
        for (int64_t u : nbrs) {
            adj[u].erase(v);
            for (int64_t w : nbrs)
                if (w != u) adj[u].insert(w);
            int64_t d = 0;
            for (int64_t w : adj[u])
                if (alive[w]) ++d;
            degree[u] = d;
            heap.push({d, u});
        }
        adj[v].clear();
    }
}

}  // namespace

extern "C" {

// AMD-style ordering: minimum degree on the pattern of A + A^T.
// (reference: AMD/Source/amd_order.c, amd_1.c, amd_2.c)
int slip_amd_order(int64_t m, int64_t n, const int64_t* p, const int64_t* i,
                   int64_t* out) {
    if (m != n || n < 0) return -1;
    std::vector<std::set<int64_t>> adj(n);
    for (int64_t col = 0; col < n; ++col) {
        for (int64_t idx = p[col]; idx < p[col + 1]; ++idx) {
            int64_t row = i[idx];
            if (row < 0 || row >= m) return -1;
            if (row != col) {
                adj[row].insert(col);
                adj[col].insert(row);
            }
        }
    }
    min_degree_eliminate(adj, n, out);
    return 0;
}

// COLAMD-style ordering: minimum degree on the pattern of A^T A
// (column-intersection graph), columns only.
// (reference: COLAMD/Source/colamd.c, entry colamd_l)
int slip_colamd_order(int64_t m, int64_t n, const int64_t* p,
                      const int64_t* i, int64_t* out) {
    if (m < 0 || n < 0) return -1;
    std::vector<std::vector<int64_t>> cols_of_row(m);
    for (int64_t col = 0; col < n; ++col) {
        for (int64_t idx = p[col]; idx < p[col + 1]; ++idx) {
            int64_t row = i[idx];
            if (row < 0 || row >= m) return -1;
            cols_of_row[row].push_back(col);
        }
    }
    std::vector<std::set<int64_t>> adj(n);
    for (int64_t r = 0; r < m; ++r) {
        const auto& cols = cols_of_row[r];
        for (int64_t a : cols)
            for (int64_t b : cols)
                if (a != b) adj[a].insert(b);
    }
    min_degree_eliminate(adj, n, out);
    return 0;
}

// Column elimination tree of A (tree of the Cholesky factor of A^T A):
// parent[j] = min { k > j : L(k,j) != 0 } under the column ordering, the
// standard path-compression algorithm (reference counterpart: the etree
// logic implicit in the reach/dfs of slip_ref_triangular_solve.c; used
// here to build level schedules for panel parallelism).
int slip_col_etree(int64_t m, int64_t n, const int64_t* p, const int64_t* i,
                   int64_t* parent) {
    std::vector<int64_t> prev_col(m, -1), ancestor(n, -1);
    for (int64_t col = 0; col < n; ++col) parent[col] = -1;
    for (int64_t col = 0; col < n; ++col) {
        for (int64_t idx = p[col]; idx < p[col + 1]; ++idx) {
            int64_t row = i[idx];
            if (row < 0 || row >= m) return -1;
            int64_t r = prev_col[row] >= 0 ? prev_col[row] : col;
            // walk up with path compression
            while (r != -1 && r < col) {
                int64_t next = ancestor[r];
                ancestor[r] = col;
                if (next == -1) { parent[r] = col; break; }
                r = next;
            }
            prev_col[row] = col;
        }
    }
    return 0;
}

// Postorder of a forest given parent[] (reference counterpart:
// AMD/Source/amd_postorder.c). Children are visited in index order.
int slip_postorder(int64_t n, const int64_t* parent, int64_t* post) {
    std::vector<int64_t> head(n, -1), next(n, -1);
    // build child lists in reverse so traversal visits children ascending
    for (int64_t v = n - 1; v >= 0; --v) {
        int64_t par = parent[v];
        if (par >= 0 && par < n) {
            next[v] = head[par];
            head[par] = v;
        } else if (par >= n) {
            return -1;
        }
    }
    int64_t cnt = 0;
    std::vector<int64_t> stack;
    for (int64_t root = 0; root < n; ++root) {
        if (parent[root] >= 0) continue;
        stack.push_back(root);
        while (!stack.empty()) {
            int64_t v = stack.back();
            if (head[v] != -1) {
                int64_t c = head[v];
                head[v] = next[c];
                stack.push_back(c);
            } else {
                post[cnt++] = v;
                stack.pop_back();
            }
        }
    }
    return cnt == n ? 0 : -1;
}

}  // extern "C"
