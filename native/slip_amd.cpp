// Approximate-minimum-degree orderings on the quotient graph.
//
// One engine serves both of the reference's ordering packages:
//
//   * AMD  (reference: AMD/Source/amd_2.c — elimination graph with
//     approximate external degrees, supervariables, mass elimination,
//     aggressive element absorption): variables start with the adjacency
//     of pattern(A + A^T) and no elements.
//   * COLAMD (reference: COLAMD/Source/colamd.c, entry colamd_l —
//     column ordering by minimum degree in the graph of A^T A *without
//     forming A^T A*): the SAME engine where every row of A is an
//     initial ELEMENT containing its columns and variables carry no
//     direct adjacency. Eliminating a column merges the elements (rows)
//     containing it into one pivot element — exactly COLAMD's row
//     merging — so A^T A never materializes and a dense row costs one
//     big element, not O(n^2) edges.
//
// Shared machinery, mirroring the published algorithm family:
//   - approximate external degree  d(j) ~= |Lp \ j| + sum_e |Le \ Lp|
//     with the one-scan |Le \ Lp| computation (w[] counters);
//   - supervariable detection by hashing columns of the pivot element
//     and merging identical patterns (weights accumulate);
//   - mass elimination (columns whose pattern is exactly the pivot
//     element are ordered immediately);
//   - aggressive absorption (elements with Le subset of Lp die);
//   - dense row/column stripping with COLAMD-style sqrt thresholds
//     (dense columns are ordered last; dense rows are dropped from
//     scoring).
//
// This replaces the round-1 exact-degree greedy (slip_symbolic.cpp),
// which cliqued neighbor sets explicitly and blew up on dense rows;
// the quotient graph keeps memory and time near O(nnz) per pivot scan.

#include <algorithm>
#include <cstdint>
#include <vector>

using std::int64_t;

namespace {

struct QuotientGraph {
    int64_t n;                                // variables (columns)
    std::vector<std::vector<int64_t>> adjA;   // direct A-part per var
    std::vector<std::vector<int64_t>> elems;  // element ids per var
    std::vector<std::vector<int64_t>> ecols;  // live vars per element
    std::vector<int64_t> weight;              // supervariable sizes
    std::vector<int64_t> degree;              // approximate degrees
    std::vector<int8_t> state;                // 0 live, 1 ordered, 2 merged
    std::vector<int64_t> merge_parent;        // supervariable tree
    std::vector<int64_t> wmark;               // |Le \ Lp| scratch
    std::vector<int64_t> tag;                 // generation marks
    int64_t cur_tag = 0;

    // degree buckets (doubly linked lists keyed by min(degree, n-1))
    std::vector<int64_t> bhead, bnext, bprev, bkey;

    explicit QuotientGraph(int64_t n_)
        : n(n_), adjA(n_), elems(n_), weight(n_, 1), degree(n_, 0),
          state(n_, 0), merge_parent(n_, -1), wmark(), tag(n_, -1),
          bhead(n_ + 1, -1), bnext(n_, -1), bprev(n_, -1), bkey(n_, -1) {}

    void bucket_insert(int64_t v) {
        int64_t k = std::min(degree[v], n - 1);
        if (k < 0) k = 0;
        bkey[v] = k;
        bnext[v] = bhead[k];
        bprev[v] = -1;
        if (bhead[k] >= 0) bprev[bhead[k]] = v;
        bhead[k] = v;
    }

    void bucket_remove(int64_t v) {
        if (bkey[v] < 0) return;
        if (bprev[v] >= 0) bnext[bprev[v]] = bnext[v];
        else bhead[bkey[v]] = bnext[v];
        if (bnext[v] >= 0) bprev[bnext[v]] = bprev[v];
        bkey[v] = -1;
    }

    int64_t bucket_pop_min(int64_t& scan_from) {
        for (int64_t k = scan_from; k < n; ++k) {
            if (bhead[k] >= 0) {
                scan_from = k;
                int64_t v = bhead[k];
                bucket_remove(v);
                return v;
            }
        }
        return -1;
    }
};

// Expand a supervariable into its merged members (postorder of the
// merge tree, representative last to match elimination position).
void expand_super(const std::vector<std::vector<int64_t>>& members,
                  int64_t v, std::vector<int64_t>& out) {
    for (int64_t u : members[v]) expand_super(members, u, out);
    out.push_back(v);
}

// The shared elimination loop. Returns the column order in `out` and a
// fill estimate (sum of pivot degrees, an lnz-style statistic like
// AMD's Info[AMD_LNZ]) in `est_fill`.
void amd_engine(QuotientGraph& g, int64_t* out, int64_t* est_fill) {
    const int64_t n = g.n;
    std::vector<std::vector<int64_t>> members(n);
    std::vector<int64_t> order;
    order.reserve(n);
    int64_t fill = 0;

    // initial degrees: |A part| + sum (|Le| - 1)
    for (int64_t v = 0; v < n; ++v) {
        int64_t d = static_cast<int64_t>(g.adjA[v].size());
        for (int64_t e : g.elems[v])
            d += static_cast<int64_t>(g.ecols[e].size()) - 1;
        g.degree[v] = std::min(d, n - 1);
        g.bucket_insert(v);
    }

    std::vector<int64_t> Lp;           // pivot element columns
    std::vector<int64_t> touched;      // elements seen this pivot
    std::vector<int64_t> hash_bucket_head(n, -1), hash_next(n, -1);
    std::vector<int64_t> hashed;       // vars hashed this pivot
    std::vector<int64_t> hash_slots;   // their bucket indices
    int64_t scan_from = 0;
    int64_t next_elem = static_cast<int64_t>(g.ecols.size());

    while (static_cast<int64_t>(order.size()) < n) {
        int64_t piv = g.bucket_pop_min(scan_from);
        if (piv < 0) break;            // should not happen
        if (g.state[piv] != 0) continue;

        // ---- form the pivot element Lp = (A_piv ∪ ∪Le) \ piv --------
        Lp.clear();
        ++g.cur_tag;
        g.tag[piv] = g.cur_tag;
        for (int64_t u : g.adjA[piv]) {
            if (g.state[u] == 0 && g.tag[u] != g.cur_tag) {
                g.tag[u] = g.cur_tag;
                Lp.push_back(u);
            }
        }
        std::vector<int64_t> absorbed = g.elems[piv];
        for (int64_t e : absorbed) {
            for (int64_t u : g.ecols[e]) {
                if (g.state[u] == 0 && u != piv && g.tag[u] != g.cur_tag) {
                    g.tag[u] = g.cur_tag;
                    Lp.push_back(u);
                }
            }
        }
        g.state[piv] = 1;
        order.push_back(piv);
        fill += g.weight[piv] * static_cast<int64_t>(Lp.size());

        if (Lp.empty()) {
            for (int64_t e : absorbed) g.ecols[e].clear();
            g.elems[piv].clear();
            g.adjA[piv].clear();
            continue;
        }

        // new element id p
        int64_t p = next_elem++;
        g.ecols.emplace_back(Lp);
        g.wmark.resize(next_elem, -1);

        // ---- one-scan |Le \ Lp| for every element touching Lp -------
        touched.clear();
        for (int64_t j : Lp) {
            for (int64_t e : g.elems[j]) {
                if (g.ecols[e].empty()) continue;       // absorbed
                if (g.wmark[e] < 0) {
                    int64_t live = 0;
                    for (int64_t u : g.ecols[e])
                        if (g.state[u] == 0) live += g.weight[u];
                    g.wmark[e] = live;
                    touched.push_back(e);
                }
                g.wmark[e] -= g.weight[j];
            }
        }

        // mark absorbed source elements dead
        for (int64_t e : absorbed) g.ecols[e].clear();

        // ---- update columns of Lp: element lists, degrees, hashes ---
        int64_t lp_weight = 0;
        for (int64_t j : Lp) lp_weight += g.weight[j];

        hashed.clear();
        for (int64_t j : Lp) {
            // prune dead elements; aggressive absorption (w == 0)
            auto& ej = g.elems[j];
            int64_t w_sum = 0;
            size_t kept = 0;
            uint64_t h = 0;
            for (int64_t e : ej) {
                if (g.ecols[e].empty()) continue;
                if (g.wmark[e] == 0) {                   // Le ⊆ Lp
                    g.ecols[e].clear();
                    continue;
                }
                ej[kept++] = e;
                w_sum += (g.wmark[e] >= 0 ? g.wmark[e]
                          : static_cast<int64_t>(g.ecols[e].size()));
                h = h * 1315423911u + static_cast<uint64_t>(e) + 1;
            }
            ej.resize(kept);
            ej.push_back(p);
            h = h * 1315423911u + static_cast<uint64_t>(p) + 1;
            // prune the direct A part of anything inside Lp or ordered
            auto& aj = g.adjA[j];
            size_t ka = 0;
            for (int64_t u : aj) {
                if (g.state[u] != 0 || g.tag[u] == g.cur_tag) continue;
                aj[ka++] = u;
                h = h * 2654435761u + static_cast<uint64_t>(u) + 1;
            }
            aj.resize(ka);
            // approximate external degree
            int64_t d = lp_weight - g.weight[j]
                + static_cast<int64_t>(aj.size()) + w_sum;
            g.bucket_remove(j);
            g.degree[j] = std::min(d, n - 1);
            // mass elimination: pattern exactly Lp and nothing else
            if (ka == 0 && kept == 0 && d == lp_weight - g.weight[j]) {
                g.state[j] = 1;
                order.push_back(j);
                fill += g.weight[j] * d;
                continue;
            }
            // stage for supervariable hashing
            int64_t hb = static_cast<int64_t>(h % static_cast<uint64_t>(n));
            hash_next[j] = hash_bucket_head[hb];
            hash_bucket_head[hb] = j;
            hash_slots.push_back(hb);
            hashed.push_back(j);
        }

        // ---- supervariable detection (equal patterns merge) ----------
        // within each hash bucket, columns with identical element lists
        // and identical direct adjacency merge (O(bucket^2) compares,
        // buckets are tiny in practice)
        for (int64_t j : hashed) {
            if (g.state[j] != 0 || g.merge_parent[j] >= 0) continue;
            for (int64_t u = hash_next[j]; u >= 0; u = hash_next[u]) {
                if (g.state[u] != 0 || g.merge_parent[u] >= 0) continue;
                if (g.elems[j] == g.elems[u] && g.adjA[j] == g.adjA[u]) {
                    // u merges into j
                    g.weight[j] += g.weight[u];
                    g.merge_parent[u] = j;
                    members[j].push_back(u);
                    g.state[u] = 2;
                    g.bucket_remove(u);
                    // remove u from the pivot element's column list
                    auto& pc = g.ecols[p];
                    pc.erase(std::remove(pc.begin(), pc.end(), u),
                             pc.end());
                }
            }
        }
        // clear hash buckets and per-pivot w-marks for the next pivot
        for (int64_t hb : hash_slots) hash_bucket_head[hb] = -1;
        hash_slots.clear();
        for (int64_t e : touched) g.wmark[e] = -1;
        g.wmark[p] = -1;
        // prune merged/ordered columns out of the pivot element
        {
            auto& pc = g.ecols[p];
            size_t kp = 0;
            for (int64_t u : pc)
                if (g.state[u] == 0) pc[kp++] = u;
            pc.resize(kp);
        }
        // reinsert surviving Lp columns with fresh keys
        for (int64_t j : Lp)
            if (g.state[j] == 0) g.bucket_insert(j);
        scan_from = 0;
        g.elems[piv].clear();
        g.adjA[piv].clear();
    }

    // ---- emit the final order, expanding supervariables -------------
    int64_t pos = 0;
    for (int64_t v : order) {
        std::vector<int64_t> grp;
        expand_super(members, v, grp);
        for (int64_t u : grp) out[pos++] = u;
    }
    if (est_fill) *est_fill = fill;
}

constexpr int64_t isqrt_thresh(int64_t n, int64_t mult) {
    int64_t r = 1;
    while (r * r < n) ++r;
    return std::max<int64_t>(16, mult * r);
}

}  // namespace

extern "C" {

// COLAMD-style column ordering: rows of A are the initial elements.
// Dense rows (length > 10*sqrt(n)) are dropped from scoring; dense
// columns (> 10*sqrt(m)... relative) are ordered last.
int slip_colamd_approx(int64_t m, int64_t n, const int64_t* p,
                       const int64_t* i, int64_t* out,
                       int64_t* est_fill) {
    if (n < 0 || m < 0) return -1;
    if (n == 0) return 0;
    QuotientGraph g(n);
    // row lengths -> dense-row threshold
    std::vector<int64_t> rlen(m, 0);
    for (int64_t c = 0; c < n; ++c)
        for (int64_t k = p[c]; k < p[c + 1]; ++k) ++rlen[i[k]];
    const int64_t dense_row = isqrt_thresh(n, 10);
    // build initial elements (one per non-dense, non-empty row)
    std::vector<int64_t> row_elem(m, -1);
    for (int64_t r = 0; r < m; ++r) {
        if (rlen[r] > 0 && rlen[r] <= dense_row) {
            row_elem[r] = static_cast<int64_t>(g.ecols.size());
            g.ecols.emplace_back();
            g.ecols.back().reserve(rlen[r]);
        }
    }
    for (int64_t c = 0; c < n; ++c) {
        for (int64_t k = p[c]; k < p[c + 1]; ++k) {
            int64_t e = row_elem[i[k]];
            if (e >= 0) {
                g.ecols[e].push_back(c);
                g.elems[c].push_back(e);
            }
        }
    }
    g.wmark.assign(g.ecols.size(), -1);
    amd_engine(g, out, est_fill);
    return 0;
}

// AMD-style symmetric ordering on pattern(A + A^T).
int slip_amd_approx(int64_t m, int64_t n, const int64_t* p,
                    const int64_t* i, int64_t* out, int64_t* est_fill) {
    if (m != n || n < 0) return -1;
    if (n == 0) return 0;
    QuotientGraph g(n);
    // symmetrize, drop diagonal, dedupe
    std::vector<std::vector<int64_t>> adj(n);
    for (int64_t c = 0; c < n; ++c) {
        for (int64_t k = p[c]; k < p[c + 1]; ++k) {
            int64_t r = i[k];
            if (r == c) continue;
            adj[c].push_back(r);
            adj[r].push_back(c);
        }
    }
    for (int64_t v = 0; v < n; ++v) {
        auto& a = adj[v];
        std::sort(a.begin(), a.end());
        a.erase(std::unique(a.begin(), a.end()), a.end());
        g.adjA[v] = std::move(a);
    }
    g.wmark.assign(1, -1);
    amd_engine(g, out, est_fill);
    return 0;
}

}  // extern "C"
