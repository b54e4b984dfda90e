// Native static-schedule builder for the sparse device path.
//
// C++ twin of slip_lu_tpu/tpu/schedule.py::build_schedule (which remains
// the oracle and fallback): maximum-transversal diagonal placement +
// symbolic right-looking elimination under a given column ordering,
// emitting the padded per-step schedules (pivot column/row/tile slots,
// history levels, forward/back substitution schedules) the device kernel
// consumes. Iteration orders use ordered sets so the output is
// bit-identical to the Python builder (asserted in
// tests/test_native_schedule.py).
//
// The reference's counterpart work is the per-column reach/DFS
// (slip_reach.c / slip_dfs.c) done dynamically during factorization; here
// the whole pattern evolution is precomputed once on the host.
//
// C ABI (ctypes): build -> opaque handle; sizes -> fill -> free.

#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <unordered_map>
#include <vector>

using std::int32_t;
using std::int64_t;

namespace {

struct Schedule {
    int64_t n = 0, E = 0, rmax = 0, cmax = 0, umax = 0, lnz = 0, unz = 0;
    int64_t nnzA = 0;
    bool singular = false;
    std::vector<int32_t> row_of, col_of, init_pos;
    std::vector<int32_t> col_pos, col_hist, row_pos, row_hist;
    std::vector<int32_t> diag_pos, diag_hist;
    std::vector<int32_t> tile_pos, tile_hist;
    std::vector<int32_t> fwd_hist, fwd_xk_hist;
    std::vector<int32_t> bwd_pos, bwd_row;
    std::vector<int64_t> transversal;  // r[k] = original row pivoting step k
};

// Maximum bipartite matching, iterative augmenting DFS in CSC order —
// mirrors schedule.py::max_transversal exactly. `prefer` (optional,
// length n) gives a preferred row per column (the true diagonal under
// the fill ordering) claimed in a first pass — without it the matching
// drifts off-diagonal and symbolic fill explodes on matrices whose
// natural pivots ARE the diagonal (the common case after AMD/COLAMD).
bool transversal(int64_t n, const std::vector<std::vector<int64_t>>& rows_of_col,
                 std::vector<int64_t>& match_col, const int64_t* prefer) {
    std::vector<int64_t> match_row(n, -1);
    match_col.assign(n, -1);
    if (prefer) {
        for (int64_t c = 0; c < n; ++c) {
            int64_t pr = prefer[c];
            if (pr < 0 || pr >= n || match_row[pr] >= 0) continue;
            for (int64_t r2 : rows_of_col[c])
                if (r2 == pr) {
                    match_row[pr] = c;
                    match_col[c] = pr;
                    break;
                }
        }
    }
    // iterative DFS with explicit stack replicating the recursive order
    std::vector<int64_t> stack_col, stack_ri;
    std::vector<char> seen(n, 0);
    for (int64_t c0 = 0; c0 < n; ++c0) {
        if (match_col[c0] >= 0) continue;
        std::fill(seen.begin(), seen.end(), 0);
        stack_col.assign(1, c0);
        stack_ri.assign(1, 0);
        bool found = false;
        // path of (col, row-chosen) pairs for augmentation
        std::vector<std::pair<int64_t, int64_t>> path;
        while (!stack_col.empty()) {
            int64_t c = stack_col.back();
            int64_t& ri = stack_ri.back();
            const auto& rows = rows_of_col[c];
            bool descended = false;
            while (ri < static_cast<int64_t>(rows.size())) {
                int64_t r = rows[ri++];
                if (seen[r]) continue;
                seen[r] = 1;
                if (match_row[r] < 0) {
                    // augment along the path
                    path.emplace_back(c, r);
                    for (auto& pr : path) {
                        match_row[pr.second] = pr.first;
                        match_col[pr.first] = pr.second;
                    }
                    found = true;
                    break;
                }
                path.emplace_back(c, r);
                stack_col.push_back(match_row[r]);
                stack_ri.push_back(0);
                descended = true;
                break;
            }
            if (found) break;
            if (!descended) {
                stack_col.pop_back();
                stack_ri.pop_back();
                if (!path.empty()) path.pop_back();
            }
        }
        if (!found) return false;
    }
    return true;
}

}  // namespace

extern "C" {

void* slip_schedule_build(int64_t m, int64_t n, const int64_t* p,
                          const int64_t* i, const unsigned char* nz_mask,
                          const int64_t* q, const int64_t* fixed_r) {
    if (m != n || n < 0) return nullptr;
    auto* S = new Schedule();
    S->n = n;
    // columns of B = A[:, q]; nz_mask marks numerically nonzero A slots
    std::vector<std::vector<int64_t>> rows_of_col(n);
    std::vector<std::pair<int64_t, int64_t>> entriesA;  // (orig row, col)
    for (int64_t c = 0; c < n; ++c) {
        int64_t oc = q[c];
        for (int64_t idx = p[oc]; idx < p[oc + 1]; ++idx) {
            entriesA.emplace_back(i[idx], c);
            if (!nz_mask || nz_mask[idx])
                rows_of_col[c].push_back(i[idx]);
        }
    }
    S->nnzA = static_cast<int64_t>(entriesA.size());
    std::vector<int64_t> r;
    if (fixed_r) {
        // pinned pivot-row sequence (cancellation repair): pivots come
        // from a successful numeric factorization, no matching needed
        r.assign(fixed_r, fixed_r + n);
    } else if (!transversal(n, rows_of_col, r, q)) {
        S->singular = true;
        return S;
    }
    S->transversal.assign(r.begin(), r.end());
    std::vector<int64_t> rinv(n);
    for (int64_t k = 0; k < n; ++k) rinv[r[k]] = k;

    std::vector<std::set<int64_t>> pattern(n), cols_of_row(n);
    for (int64_t c = 0; c < n; ++c) {
        int64_t oc = q[c];
        for (int64_t idx = p[oc]; idx < p[oc + 1]; ++idx) {
            int64_t br = rinv[i[idx]];
            pattern[c].insert(br);
            cols_of_row[br].insert(c);
        }
    }
    std::unordered_map<int64_t, int32_t> hist, slot;
    hist.reserve(16 * n);
    slot.reserve(16 * n);
    auto key = [n](int64_t a, int64_t b) { return a * n + b; };
    auto get_slot = [&](int64_t a, int64_t b) -> int32_t {
        auto k2 = key(a, b);
        auto it = slot.find(k2);
        if (it != slot.end()) return it->second;
        int32_t s = static_cast<int32_t>(S->row_of.size());
        slot.emplace(k2, s);
        S->row_of.push_back(static_cast<int32_t>(a));
        S->col_of.push_back(static_cast<int32_t>(b));
        return s;
    };
    for (int64_t c = 0; c < n; ++c)
        for (int64_t rr : pattern[c]) get_slot(rr, c);

    std::vector<std::vector<int32_t>> sc(n), sch(n), sr(n), srh(n), fh(n);
    std::vector<std::vector<std::vector<int32_t>>> st(n), sth(n);
    S->diag_pos.assign(n, 0);
    S->diag_hist.assign(n, 0);
    S->fwd_xk_hist.assign(n, 0);
    std::vector<int32_t> rhs_hist(n, 0);
    auto geth = [&](int64_t a, int64_t b) -> int32_t {
        auto it = hist.find(key(a, b));
        return it == hist.end() ? 0 : it->second;
    };

    for (int64_t k = 0; k < n; ++k) {
        if (!pattern[k].count(k)) {
            S->singular = true;
            return S;
        }
        std::vector<int64_t> rk, ck;
        for (int64_t v : pattern[k])
            if (v > k) rk.push_back(v);
        for (int64_t v : cols_of_row[k])
            if (v > k) ck.push_back(v);
        S->diag_pos[k] = get_slot(k, k);
        S->diag_hist[k] = geth(k, k);
        for (int64_t v : rk) {
            sc[k].push_back(get_slot(v, k));
            sch[k].push_back(geth(v, k));
        }
        for (int64_t v : ck) {
            sr[k].push_back(get_slot(k, v));
            srh[k].push_back(geth(k, v));
        }
        st[k].resize(rk.size());
        sth[k].resize(rk.size());
        for (size_t a = 0; a < rk.size(); ++a) {
            int64_t ii = rk[a];
            for (int64_t jj : ck) {
                st[k][a].push_back(get_slot(ii, jj));
                sth[k][a].push_back(geth(ii, jj));
                if (!pattern[jj].count(ii)) {
                    pattern[jj].insert(ii);
                    cols_of_row[ii].insert(jj);
                }
                hist[key(ii, jj)] = static_cast<int32_t>(k + 1);
            }
        }
        for (int64_t v : rk) hist[key(v, k)] = static_cast<int32_t>(k);
        for (int64_t v : ck) hist[key(k, v)] = static_cast<int32_t>(k);
        hist[key(k, k)] = static_cast<int32_t>(k);
        for (int64_t v : rk) fh[k].push_back(rhs_hist[v]);
        S->fwd_xk_hist[k] = rhs_hist[k];
        for (int64_t v : rk) rhs_hist[v] = static_cast<int32_t>(k + 1);
        rhs_hist[k] = static_cast<int32_t>(k);
    }

    S->E = static_cast<int64_t>(S->row_of.size());
    int64_t rmax = 1, cmax = 1;
    for (int64_t k = 0; k < n; ++k) {
        rmax = std::max<int64_t>(rmax, sc[k].size());
        cmax = std::max<int64_t>(cmax, sr[k].size());
    }
    S->rmax = rmax;
    S->cmax = cmax;
    int32_t E32 = static_cast<int32_t>(S->E);
    S->col_pos.assign(n * rmax, E32);
    S->col_hist.assign(n * rmax, 0);
    S->row_pos.assign(n * cmax, E32);
    S->row_hist.assign(n * cmax, 0);
    S->fwd_hist.assign(n * rmax, 0);
    S->tile_pos.assign(n * rmax * cmax, E32);
    S->tile_hist.assign(n * rmax * cmax, 0);
    S->lnz = n;
    S->unz = n;
    for (int64_t k = 0; k < n; ++k) {
        S->lnz += static_cast<int64_t>(sc[k].size());
        S->unz += static_cast<int64_t>(sr[k].size());
        for (size_t a = 0; a < sc[k].size(); ++a) {
            S->col_pos[k * rmax + a] = sc[k][a];
            S->col_hist[k * rmax + a] = sch[k][a];
            S->fwd_hist[k * rmax + a] = fh[k][a];
        }
        for (size_t a = 0; a < sr[k].size(); ++a) {
            S->row_pos[k * cmax + a] = sr[k][a];
            S->row_hist[k * cmax + a] = srh[k][a];
        }
        for (size_t a = 0; a < st[k].size(); ++a)
            for (size_t b2 = 0; b2 < st[k][a].size(); ++b2) {
                S->tile_pos[(k * rmax + a) * cmax + b2] = st[k][a][b2];
                S->tile_hist[(k * rmax + a) * cmax + b2] = sth[k][a][b2];
            }
    }
    // back substitution: above-diagonal U slots per column
    std::vector<std::vector<std::pair<int32_t, int32_t>>> bw(n);
    int64_t umax = 1;
    for (int64_t j = 0; j < n; ++j) {
        for (int64_t ii : pattern[j])
            if (ii < j)
                bw[j].emplace_back(get_slot(ii, j),
                                   static_cast<int32_t>(ii));
        umax = std::max<int64_t>(umax, bw[j].size());
    }
    S->umax = umax;
    S->bwd_pos.assign(n * umax, E32);
    S->bwd_row.assign(n * umax, static_cast<int32_t>(n));
    for (int64_t j = 0; j < n; ++j)
        for (size_t a = 0; a < bw[j].size(); ++a) {
            S->bwd_pos[j * umax + a] = bw[j][a].first;
            S->bwd_row[j * umax + a] = bw[j][a].second;
        }
    // original-entry slots (B-row = rinv[orig row])
    S->init_pos.resize(entriesA.size());
    for (size_t t = 0; t < entriesA.size(); ++t) {
        int64_t br = rinv[entriesA[t].first];
        S->init_pos[t] = slot.at(key(br, entriesA[t].second));
    }
    return S;
}

int slip_schedule_sizes(void* h, int64_t* out) {
    auto* S = static_cast<Schedule*>(h);
    if (!S) return -1;
    out[0] = S->singular ? -1 : S->E;
    out[1] = S->rmax;
    out[2] = S->cmax;
    out[3] = S->umax;
    out[4] = S->lnz;
    out[5] = S->unz;
    out[6] = S->nnzA;
    return 0;
}

int slip_schedule_fill(void* h, int32_t* row_of, int32_t* col_of,
                       int32_t* init_pos, int32_t* col_pos,
                       int32_t* col_hist, int32_t* row_pos,
                       int32_t* row_hist, int32_t* diag_pos,
                       int32_t* diag_hist, int32_t* tile_pos,
                       int32_t* tile_hist, int32_t* fwd_hist,
                       int32_t* fwd_xk_hist, int32_t* bwd_pos,
                       int32_t* bwd_row, int64_t* transversal_out) {
    auto* S = static_cast<Schedule*>(h);
    if (!S || S->singular) return -1;
    auto cp = [](auto& v, auto* dst) {
        std::memcpy(dst, v.data(), v.size() * sizeof(v[0]));
    };
    cp(S->row_of, row_of);
    cp(S->col_of, col_of);
    cp(S->init_pos, init_pos);
    cp(S->col_pos, col_pos);
    cp(S->col_hist, col_hist);
    cp(S->row_pos, row_pos);
    cp(S->row_hist, row_hist);
    cp(S->diag_pos, diag_pos);
    cp(S->diag_hist, diag_hist);
    cp(S->tile_pos, tile_pos);
    cp(S->tile_hist, tile_hist);
    cp(S->fwd_hist, fwd_hist);
    cp(S->fwd_xk_hist, fwd_xk_hist);
    cp(S->bwd_pos, bwd_pos);
    cp(S->bwd_row, bwd_row);
    cp(S->transversal, transversal_out);
    return 0;
}

void slip_schedule_free(void* h) { delete static_cast<Schedule*>(h); }

}  // extern "C"
