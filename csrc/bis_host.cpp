// Native host data layer for basic_iterative_solvers_tpu.
//
// The reference implements its entire host pipeline in C++ (mmio parser,
// COO->CRS conversion, L/U splitting, diagonal peeling, ILU(0) — see
// /root/reference/utilities/{mmio.cpp,utilities.hpp,LU_factors.hpp}).  This
// library is the TPU framework's equivalent: single-pass C++ loops for the
// setup-time host work, called from Python via ctypes (_native.py), with
// NumPy fallbacks kept as test oracles.
//
// All functions are extern "C", operate on caller-allocated buffers, and
// return 0 on success or a negative error code:
//   -1 generic failure        -2 duplicate (row,col) entry
//   -3 missing diagonal       -4 zero diagonal (row via out-param where
//   present; bis_ilu0 returns -(1000+i) with i = the missing-diagonal row)
//
// Index conventions match the Python layer: row_ptr int64, col/I/J int32,
// values double.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Matrix Market triplet parsing (hot loop of the .mtx reader; the analog of
// mm_read_mtx_crd_data, /root/reference/utilities/mmio.cpp and the optional
// fast_matrix_market path, /root/reference/sparse_matrix.hpp:230-259).
//
// Parses up to max_entries "i j [v]" lines from text (skipping blank lines
// and '%' comments), writing 0-based indices.  with_value=0 -> pattern file,
// V filled with pattern_value.  Returns the number of entries parsed, or a
// negative error code on malformed input.
// ---------------------------------------------------------------------------
long long bis_parse_triplets(const char* text, long long len,
                             long long max_entries, int with_value,
                             double pattern_value,
                             int32_t* I, int32_t* J, double* V) {
    const char* p = text;
    const char* end = text + len;
    long long count = 0;
    while (p < end && count < max_entries) {
        // skip whitespace/newlines
        while (p < end && isspace((unsigned char)*p)) ++p;
        if (p >= end) break;
        if (*p == '%') {  // comment line
            while (p < end && *p != '\n') ++p;
            continue;
        }
        char* q;
        long i = strtol(p, &q, 10);
        if (q == p) return -1;
        p = q;
        long j = strtol(p, &q, 10);
        if (q == p) return -1;
        p = q;
        double v = pattern_value;
        if (with_value) {
            v = strtod(p, &q);
            if (q == p) return -1;
            p = q;
        }
        I[count] = (int32_t)(i - 1);
        J[count] = (int32_t)(j - 1);
        V[count] = v;
        ++count;
    }
    return count;
}

// ---------------------------------------------------------------------------
// COO -> CSR with row-major (row, col) ordering and duplicate detection
// (convert_coo_to_crs analog, /root/reference/utilities/utilities.hpp:326-367,
// plus the fast-mmio sort, sparse_matrix.hpp:20-57).  LSD counting sort:
// stable by column, then stable by row -> fully (row, col)-sorted in two
// O(nnz) passes with no comparison sort.
// ---------------------------------------------------------------------------
int bis_coo_to_csr(long long nnz, int32_t n_rows, int32_t n_cols,
                   const int32_t* I, const int32_t* J, const double* V,
                   int64_t* row_ptr, int32_t* col, double* val) {
    std::vector<int64_t> counts((size_t)(n_cols > n_rows ? n_cols : n_rows) + 1, 0);
    std::vector<int32_t> tmpI((size_t)nnz);
    std::vector<int32_t> tmpJ((size_t)nnz);
    std::vector<double> tmpV((size_t)nnz);

    // pass 1: stable counting sort by column
    for (long long k = 0; k < nnz; ++k) {
        int32_t j = J[k];
        if (j < 0 || j >= n_cols || I[k] < 0 || I[k] >= n_rows) return -1;
        ++counts[(size_t)j];
    }
    int64_t acc = 0;
    for (int32_t j = 0; j < n_cols; ++j) {
        int64_t c = counts[(size_t)j];
        counts[(size_t)j] = acc;
        acc += c;
    }
    for (long long k = 0; k < nnz; ++k) {
        int64_t dst = counts[(size_t)J[k]]++;
        tmpI[(size_t)dst] = I[k];
        tmpJ[(size_t)dst] = J[k];
        tmpV[(size_t)dst] = V[k];
    }

    // pass 2: stable counting sort by row (column order preserved per row)
    std::memset(counts.data(), 0, sizeof(int64_t) * ((size_t)n_rows + 1));
    for (long long k = 0; k < nnz; ++k) ++counts[(size_t)tmpI[(size_t)k]];
    acc = 0;
    for (int32_t i = 0; i < n_rows; ++i) {
        int64_t c = counts[(size_t)i];
        row_ptr[i] = acc;
        counts[(size_t)i] = acc;
        acc += c;
    }
    row_ptr[n_rows] = acc;
    for (long long k = 0; k < nnz; ++k) {
        int64_t dst = counts[(size_t)tmpI[(size_t)k]]++;
        col[dst] = tmpJ[(size_t)k];
        val[dst] = tmpV[(size_t)k];
    }

    // duplicate detection on the sorted output
    for (int32_t i = 0; i < n_rows; ++i)
        for (int64_t k = row_ptr[i] + 1; k < row_ptr[i + 1]; ++k)
            if (col[k] == col[k - 1]) return -2;
    return 0;
}

// ---------------------------------------------------------------------------
// L/U split: one counting pass + one fill pass producing all four parts
// (split_LU_new analog, /root/reference/utilities/LU_factors.hpp:122-309).
// Outputs: L (lower+diag), Ls (strict lower), U (upper+diag), Us (strict
// upper).  Caller sizes col/val arrays from the returned row_ptrs after
// calling bis_split_lu_count.
// ---------------------------------------------------------------------------
void bis_split_lu_count(int32_t n_rows, const int64_t* row_ptr,
                        const int32_t* col,
                        int64_t* L_ptr, int64_t* Ls_ptr,
                        int64_t* U_ptr, int64_t* Us_ptr) {
    int64_t nL = 0, nLs = 0, nU = 0, nUs = 0;
    L_ptr[0] = Ls_ptr[0] = U_ptr[0] = Us_ptr[0] = 0;
    for (int32_t i = 0; i < n_rows; ++i) {
        for (int64_t k = row_ptr[i]; k < row_ptr[i + 1]; ++k) {
            int32_t j = col[k];
            if (j <= i) ++nL;
            if (j < i) ++nLs;
            if (j >= i) ++nU;
            if (j > i) ++nUs;
        }
        L_ptr[i + 1] = nL;
        Ls_ptr[i + 1] = nLs;
        U_ptr[i + 1] = nU;
        Us_ptr[i + 1] = nUs;
    }
}

void bis_split_lu_fill(int32_t n_rows, const int64_t* row_ptr,
                       const int32_t* col, const double* val,
                       const int64_t* L_ptr, int32_t* L_col, double* L_val,
                       const int64_t* Ls_ptr, int32_t* Ls_col, double* Ls_val,
                       const int64_t* U_ptr, int32_t* U_col, double* U_val,
                       const int64_t* Us_ptr, int32_t* Us_col, double* Us_val) {
    for (int32_t i = 0; i < n_rows; ++i) {
        int64_t pL = L_ptr[i], pLs = Ls_ptr[i], pU = U_ptr[i], pUs = Us_ptr[i];
        for (int64_t k = row_ptr[i]; k < row_ptr[i + 1]; ++k) {
            int32_t j = col[k];
            double v = val[k];
            if (j <= i) { L_col[pL] = j; L_val[pL] = v; ++pL; }
            if (j < i)  { Ls_col[pLs] = j; Ls_val[pLs] = v; ++pLs; }
            if (j >= i) { U_col[pU] = j; U_val[pU] = v; ++pU; }
            if (j > i)  { Us_col[pUs] = j; Us_val[pUs] = v; ++pUs; }
        }
    }
}

// ---------------------------------------------------------------------------
// Diagonal peel (peel_diag_crs analog, LU_factors.hpp:783-878).  D[i] = 0
// when missing.  Returns 0, or a small error enum with the offending row
// written to *bad_row: -3 = missing diagonal, -4 = |diag| < zero_tol
// (checks enabled via flags bit0 = check_missing, bit1 = check_zero).
// Non-overlapping encodings — row-in-return-code schemes collide once the
// row index crosses the next code's base.
// ---------------------------------------------------------------------------
long long bis_peel_diag(int32_t n_rows, const int64_t* row_ptr,
                        const int32_t* col, const double* val,
                        double zero_tol, int flags, double* D,
                        int64_t* bad_row) {
    *bad_row = -1;
    for (int32_t i = 0; i < n_rows; ++i) {
        double d = 0.0;
        int found = 0;
        for (int64_t k = row_ptr[i]; k < row_ptr[i + 1]; ++k) {
            if (col[k] == i) { d = val[k]; found = 1; break; }
        }
        if (!found && (flags & 1)) { *bad_row = i; return -3; }
        if (found && (flags & 2) && std::fabs(d) < zero_tol) {
            *bad_row = i;
            return -4;
        }
        D[i] = d;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// ILU(0): row-wise IKJ elimination restricted to A's pattern, with the
// reference's pivot guards (LU_factors.hpp:337-430,602,639-642):
//   * skip elimination pivots with |U(k,k)| < 1e-16
//   * replace final diagonals with |d| < pivot_tol by sign(d)*pivot_rep
// lu_val is A.val copied by the caller; modified in place.  w_pos is an
// n_cols scratch the caller allocates (int64, initialized here).
// Returns 0 or -(1000+i) for a missing diagonal in row i.
// ---------------------------------------------------------------------------
long long bis_ilu0(int32_t n_rows, int32_t n_cols, const int64_t* row_ptr,
                   const int32_t* col, double* lu_val,
                   double pivot_tol, double pivot_rep) {
    std::vector<int64_t> diag_pos((size_t)n_rows, -1);
    for (int32_t i = 0; i < n_rows; ++i)
        for (int64_t k = row_ptr[i]; k < row_ptr[i + 1]; ++k)
            if (col[k] == i) { diag_pos[(size_t)i] = k; break; }
    for (int32_t i = 0; i < n_rows; ++i)
        if (diag_pos[(size_t)i] < 0) return -(1000LL + i);

    std::vector<int64_t> w_pos((size_t)n_cols, -1);
    for (int32_t i = 0; i < n_rows; ++i) {
        int64_t s = row_ptr[i], e = row_ptr[i + 1];
        for (int64_t k = s; k < e; ++k) w_pos[(size_t)col[k]] = k;
        for (int64_t p = s; p < e; ++p) {
            int32_t k = col[p];
            if (k >= i) break;
            double pivot = lu_val[diag_pos[(size_t)k]];
            if (std::fabs(pivot) < 1e-16) continue;
            double factor = lu_val[p] / pivot;
            lu_val[p] = factor;
            for (int64_t q = diag_pos[(size_t)k] + 1; q < row_ptr[k + 1]; ++q) {
                int64_t tgt = w_pos[(size_t)col[q]];
                if (tgt >= 0) lu_val[tgt] -= factor * lu_val[q];
            }
        }
        double d = lu_val[diag_pos[(size_t)i]];
        if (std::fabs(d) < pivot_tol)
            lu_val[diag_pos[(size_t)i]] = (d >= 0.0 ? 1.0 : -1.0) * pivot_rep;
        for (int64_t k = s; k < e; ++k) w_pos[(size_t)col[k]] = -1;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Level sets for triangular solves (the SMAX level-scheduler analog,
// LU_factors.hpp:559-569): level[i] = 1 + max over the row's strict pattern.
// upper=1 walks rows N-1..0 (backward substitution dependencies).
// ---------------------------------------------------------------------------
void bis_level_sets(int32_t n_rows, const int64_t* row_ptr,
                    const int32_t* col, int upper, int32_t* level) {
    if (!upper) {
        for (int32_t i = 0; i < n_rows; ++i) {
            int32_t lv = -1;
            for (int64_t k = row_ptr[i]; k < row_ptr[i + 1]; ++k) {
                int32_t lj = level[col[k]];
                if (lj > lv) lv = lj;
            }
            level[i] = lv + 1;
        }
    } else {
        for (int32_t i = n_rows - 1; i >= 0; --i) {
            int32_t lv = -1;
            for (int64_t k = row_ptr[i]; k < row_ptr[i + 1]; ++k) {
                int32_t lj = level[col[k]];
                if (lj > lv) lv = lj;
            }
            level[i] = lv + 1;
        }
    }
}

// ---------------------------------------------------------------------------
// BFS / RCM orderings (the SMAX permute_mat analog,
// /root/reference/utilities/smax_helpers.hpp:44-80 + PERM_MODE,
// CMakeLists.txt:128-136).  Reordering shrinks triangular-solve level counts
// (wavefront depth), which is what makes the exact SpTRSV scan practical on
// TPU.  perm[new_index] = old_index.  Pattern is taken as given (callers pass
// A whose pattern is structurally symmetric for the matrices of interest;
// unreached components are appended in natural order).
// reverse=1 gives RCM (Cuthill-McKee reversed); sort_by_degree=1 orders each
// BFS frontier by ascending degree (the CM rule).
// ---------------------------------------------------------------------------
void bis_bfs_perm(int32_t n_rows, const int64_t* row_ptr, const int32_t* col,
                  int reverse, int sort_by_degree, int32_t* perm) {
    std::vector<unsigned char> seen((size_t)n_rows, 0);
    std::vector<int32_t> queue;
    queue.reserve((size_t)n_rows);
    std::vector<int32_t> nbrs;
    long long head = 0;
    for (int32_t start = 0; start < n_rows; ++start) {
        if (seen[(size_t)start]) continue;
        // component seed: lowest-degree unseen node scan is O(n^2) worst
        // case; use the natural-order seed (matches simple BFS modes).
        seen[(size_t)start] = 1;
        queue.push_back(start);
        while (head < (long long)queue.size()) {
            int32_t u = queue[(size_t)head++];
            nbrs.clear();
            for (int64_t k = row_ptr[u]; k < row_ptr[u + 1]; ++k) {
                int32_t v = col[k];
                if (v >= 0 && v < n_rows && !seen[(size_t)v]) {
                    seen[(size_t)v] = 1;
                    nbrs.push_back(v);
                }
            }
            if (sort_by_degree) {
                // insertion sort by degree (frontiers are small)
                for (size_t a = 1; a < nbrs.size(); ++a) {
                    int32_t x = nbrs[a];
                    int64_t dx = row_ptr[x + 1] - row_ptr[x];
                    size_t b = a;
                    while (b > 0) {
                        int32_t y = nbrs[b - 1];
                        if (row_ptr[y + 1] - row_ptr[y] <= dx) break;
                        nbrs[b] = y;
                        --b;
                    }
                    nbrs[b] = x;
                }
            }
            for (int32_t v : nbrs) queue.push_back(v);
        }
    }
    if (reverse) {
        for (int32_t i = 0; i < n_rows; ++i)
            perm[i] = queue[(size_t)(n_rows - 1 - i)];
    } else {
        for (int32_t i = 0; i < n_rows; ++i) perm[i] = queue[(size_t)i];
    }
}

// ---------------------------------------------------------------------------
// Greedy graph coloring (the SMAX C/PC/PC_BAL permutation-mode analog,
// /root/reference/utilities/smax_helpers.hpp:25-28, CMakeLists.txt:128-136).
// Sequential first-fit over the CSR row pattern (assumed structurally
// symmetric, like bis_bfs_perm); balanced=1 picks the least-loaded
// admissible color (PC_BAL).  Returns the number of colors used.
// A proper coloring makes rows of one color mutually independent, so exact
// GS sweeps/triangular solves become #colors parallel steps.
// ---------------------------------------------------------------------------
long long bis_greedy_color(int32_t n_rows, const int64_t* row_ptr,
                           const int32_t* col, int balanced,
                           int32_t* colors) {
    for (int32_t i = 0; i < n_rows; ++i) colors[i] = -1;
    std::vector<int32_t> mark;   // mark[c] == i  <=>  color c used by a nbr
    std::vector<int64_t> load;   // rows per color (balanced mode)
    for (int32_t i = 0; i < n_rows; ++i) {
        for (int64_t k = row_ptr[i]; k < row_ptr[i + 1]; ++k) {
            int32_t j = col[k];
            if (j == i || j < 0 || j >= n_rows) continue;
            int32_t cj = colors[j];
            if (cj >= 0) mark[(size_t)cj] = i;
        }
        int32_t c = -1;
        if (balanced) {
            int64_t best_load = -1;
            for (size_t cc = 0; cc < load.size(); ++cc) {
                if (mark[cc] != i && (best_load < 0 || load[cc] < best_load)) {
                    c = (int32_t)cc;
                    best_load = load[cc];
                }
            }
        } else {
            for (size_t cc = 0; cc < load.size(); ++cc)
                if (mark[cc] != i) { c = (int32_t)cc; break; }
        }
        if (c < 0) {
            c = (int32_t)load.size();
            mark.push_back(-1);
            load.push_back(0);
        }
        colors[i] = c;
        ++load[(size_t)c];
    }
    return (long long)load.size();
}

// ---------------------------------------------------------------------------
// Symmetric permutation A' = P A P^T with column-sorted rows:
// A'[new_i, inv[j]] = A[perm[new_i], j].
// ---------------------------------------------------------------------------
void bis_permute_csr(int32_t n_rows, const int64_t* row_ptr,
                     const int32_t* col, const double* val,
                     const int32_t* perm, const int32_t* inv_perm,
                     int64_t* out_ptr, int32_t* out_col, double* out_val) {
    out_ptr[0] = 0;
    for (int32_t ni = 0; ni < n_rows; ++ni) {
        int32_t oi = perm[ni];
        out_ptr[ni + 1] = out_ptr[ni] + (row_ptr[oi + 1] - row_ptr[oi]);
    }
    std::vector<std::pair<int32_t, double>> row;
    for (int32_t ni = 0; ni < n_rows; ++ni) {
        int32_t oi = perm[ni];
        row.clear();
        for (int64_t k = row_ptr[oi]; k < row_ptr[oi + 1]; ++k)
            row.emplace_back(inv_perm[col[k]], val[k]);
        // insertion sort by new column (rows are short)
        for (size_t a = 1; a < row.size(); ++a) {
            auto x = row[a];
            size_t b = a;
            while (b > 0 && row[b - 1].first > x.first) {
                row[b] = row[b - 1];
                --b;
            }
            row[b] = x;
        }
        int64_t o = out_ptr[ni];
        for (size_t a = 0; a < row.size(); ++a) {
            out_col[o + (int64_t)a] = row[a].first;
            out_val[o + (int64_t)a] = row[a].second;
        }
    }
}

// ---------------------------------------------------------------------------
// CSR SpMV host oracle (native_spmv analog, /root/reference/kernels.hpp:22-42)
// — used for explicit final residuals on host matrices.
// ---------------------------------------------------------------------------
void bis_spmv_csr(int32_t n_rows, const int64_t* row_ptr, const int32_t* col,
                  const double* val, const double* x, double* y) {
    for (int32_t i = 0; i < n_rows; ++i) {
        double acc = 0.0;
        for (int64_t k = row_ptr[i]; k < row_ptr[i + 1]; ++k)
            acc += val[k] * x[col[k]];
        y[i] = acc;
    }
}

}  // extern "C"
