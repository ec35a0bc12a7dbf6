// hipm.cpp — sparse LDL' factorization for the interior-point Newton
// systems: the TPU-native framework's answer to the reference's HiPO
// FactorHiGHS supernodal LDL' (highs/ipm/hipo/factorhighs/Analyse.cpp,
// Factorise.cpp) and its AMD ordering extra.
//
// Design: the IPM's normal matrix M = K Theta K' + D changes VALUES
// every iteration but never its PATTERN, so the expensive work is done
// once (ordering + elimination tree + symbolic L) and each iteration
// pays only the numeric refactorization:
//
//   analyze:  minimum-degree ordering on the quotient graph (element
//             absorption + external-degree approximation, the same
//             device as SuiteSparse AMD), elimination tree, column
//             counts, symbolic L pattern
//   factor:   up-looking sparse LDL' over the fixed pattern with
//             dynamic diagonal regularization on small pivots (role of
//             FactorHiGHS's static+dynamic regularization)
//   solve:    P' L D L' P x = b triangular solves
//
// Everything is plain C++ with C linkage, called from python via
// ctypes (highs_tpu/solvers/ipm/sparse_ldl.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimum-degree ordering on the quotient graph.
//
// Nodes are eliminated in order of (approximate) external degree; an
// eliminated node becomes an ELEMENT whose adjacency is the union of
// its remaining neighbors; elements reached through an eliminated
// node are absorbed.  Degrees are approximated by the sum of element
// sizes minus self (AMD's bound) — exact enough for fill reduction,
// far cheaper than exact degrees.
struct MinDegree {
  int n;
  // adjacency storage: per node, a list of plain-node neighbors and a
  // list of element ids it belongs to
  std::vector<std::vector<int32_t>> adj;    // node -> nodes
  std::vector<std::vector<int32_t>> elems;  // node -> elements
  std::vector<std::vector<int32_t>> elem_nodes;  // element -> nodes
  std::vector<int32_t> degree;
  std::vector<uint8_t> eliminated;
  std::vector<int32_t> stamp;
  int32_t mark = 0;

  explicit MinDegree(int n_, const int64_t* Ap, const int32_t* Ai)
      : n(n_), adj(n_), elems(n_), degree(n_, 0), eliminated(n_, 0),
        stamp(n_, -1) {
    for (int j = 0; j < n; ++j) {
      for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
        const int i = Ai[p];
        if (i != j) adj[j].push_back(i);
      }
      std::sort(adj[j].begin(), adj[j].end());
      adj[j].erase(std::unique(adj[j].begin(), adj[j].end()),
                   adj[j].end());
      degree[j] = (int32_t)adj[j].size();
    }
  }

  // gather the current neighborhood of v (plain neighbors + members of
  // its elements), deduplicated with the stamp array
  void neighborhood(int v, std::vector<int32_t>& out) {
    out.clear();
    ++mark;
    stamp[v] = mark;
    for (int32_t u : adj[v])
      if (!eliminated[u] && stamp[u] != mark) {
        stamp[u] = mark;
        out.push_back(u);
      }
    for (int32_t e : elems[v])
      for (int32_t u : elem_nodes[e])
        if (!eliminated[u] && u != v && stamp[u] != mark) {
          stamp[u] = mark;
          out.push_back(u);
        }
  }

  // returns false when the quotient-graph work exceeds `max_work`
  // (fill-catastrophic structure: the caller falls back to an
  // iterative Newton solver instead of a hopeless factorization)
  bool order(int32_t* perm, int64_t max_work) {
    int64_t work = 0;
    // simple bucketed degree lists
    std::vector<std::vector<int32_t>> bucket(n + 1);
    std::vector<int32_t> where(n, 0);
    for (int j = 0; j < n; ++j) {
      const int d = std::min(degree[j], n);
      bucket[d].push_back(j);
      where[j] = d;
    }
    std::vector<int32_t> nbr;
    int mindeg = 0;
    for (int k = 0; k < n; ++k) {
      int v = -1;
      while (v < 0) {
        while (mindeg <= n && bucket[mindeg].empty()) ++mindeg;
        if (mindeg > n) {  // all remaining are stale entries
          for (int j = 0; j < n; ++j)
            if (!eliminated[j]) { v = j; break; }
          break;
        }
        const int cand = bucket[mindeg].back();
        bucket[mindeg].pop_back();
        if (eliminated[cand] || where[cand] != mindeg) continue;
        v = cand;
      }
      perm[k] = v;
      eliminated[v] = 1;
      neighborhood(v, nbr);
      work += (int64_t)nbr.size();
      if (max_work > 0 && work > max_work) return false;
      // v becomes an element with node set nbr; its elements absorb
      const int32_t e_new = (int32_t)elem_nodes.size();
      elem_nodes.push_back(nbr);
      for (int32_t u : nbr) {
        // drop absorbed elements of u (those containing v), add e_new
        auto& eu = elems[u];
        size_t w = 0;
        for (size_t r = 0; r < eu.size(); ++r) {
          const auto& en = elem_nodes[eu[r]];
          if (!std::binary_search(en.begin(), en.end(), (int32_t)v))
            eu[w++] = eu[r];
        }
        eu.resize(w);
        eu.push_back(e_new);
        // prune plain adjacency of eliminated nodes lazily
        auto& au = adj[u];
        size_t w2 = 0;
        for (size_t r = 0; r < au.size(); ++r)
          if (!eliminated[au[r]]) au[w2++] = au[r];
        au.resize(w2);
        // approximate external degree: plain neighbors + sum of
        // element sizes (upper bound on the true degree)
        int32_t d = (int32_t)au.size();
        for (int32_t e : eu) d += (int32_t)elem_nodes[e].size() - 1;
        d = std::min(d, n);
        where[u] = d;
        bucket[d].push_back(u);
        if (d < mindeg) mindeg = d;
      }
      // keep element node list sorted for binary_search above
      std::sort(elem_nodes[e_new].begin(), elem_nodes[e_new].end());
    }
    return true;
  }
};

struct LdlHandle {
  int n = 0;
  std::vector<int32_t> perm, iperm;
  // permuted pattern of the UPPER triangle (CSC by permuted column)
  std::vector<int64_t> Up;
  std::vector<int32_t> Ui;
  // elimination tree + symbolic L (CSC, no diagonal)
  std::vector<int32_t> parent;
  std::vector<int64_t> Lp;
  std::vector<int32_t> Li;
  std::vector<double> Lx;
  std::vector<double> D;
  // scratch
  std::vector<int32_t> flag, pattern;
  std::vector<double> y;
  int64_t lnnz = 0;
  int n_reg = 0;  // pivots regularized in the last factor
};

}  // namespace

extern "C" {

void* hx_ldl_analyze_capped(int n, const int64_t* Ap, const int32_t* Ai,
                            int64_t max_work, int64_t max_fill);

// Analyze the symmetric pattern of M (full CSC, n x n): ordering,
// etree, symbolic factorization.  Returns an opaque handle.
void* hx_ldl_analyze(int n, const int64_t* Ap, const int32_t* Ai) {
  return hx_ldl_analyze_capped(n, Ap, Ai, 0, 0);
}

// As hx_ldl_analyze but aborts (returns NULL) when the ordering work
// exceeds `max_work` or the symbolic fill exceeds `max_fill`
// (0 = unlimited) — the cheap blowup probe dispatch uses before
// committing to a sparse-direct IPM.
void* hx_ldl_analyze_capped(int n, const int64_t* Ap, const int32_t* Ai,
                            int64_t max_work, int64_t max_fill) {
  LdlHandle* h = new LdlHandle();
  h->n = n;
  h->perm.resize(n);
  h->iperm.resize(n);
  {
    MinDegree md(n, Ap, Ai);
    if (!md.order(h->perm.data(), max_work)) {
      delete h;
      return nullptr;
    }
  }
  for (int k = 0; k < n; ++k) h->iperm[h->perm[k]] = k;

  // permuted upper-triangular pattern: entry (i,j) with
  // iperm[i] <= iperm[j] lands in column iperm[j]
  std::vector<int64_t> cnt(n + 1, 0);
  for (int j = 0; j < n; ++j) {
    const int pj = h->iperm[j];
    for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
      const int pi = h->iperm[Ai[p]];
      ++cnt[(pi <= pj ? pj : pi) + 1];
    }
  }
  h->Up.assign(n + 1, 0);
  for (int j = 0; j < n; ++j) h->Up[j + 1] = h->Up[j] + cnt[j + 1];
  h->Ui.resize(h->Up[n]);
  std::vector<int64_t> fill(n, 0);
  for (int j = 0; j < n; ++j) {
    const int pj = h->iperm[j];
    for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
      const int pi = h->iperm[Ai[p]];
      const int col = pi <= pj ? pj : pi;
      const int row = pi <= pj ? pi : pj;
      h->Ui[h->Up[col] + fill[col]++] = row;
    }
  }
  // dedup rows within each column
  for (int j = 0; j < n; ++j) {
    int32_t* b = h->Ui.data() + h->Up[j];
    int32_t* e = h->Ui.data() + h->Up[j] + fill[j];
    std::sort(b, e);
    fill[j] = std::unique(b, e) - b;
  }
  // compact
  {
    std::vector<int64_t> np(n + 1, 0);
    for (int j = 0; j < n; ++j) np[j + 1] = np[j] + fill[j];
    std::vector<int32_t> ni(np[n]);
    for (int j = 0; j < n; ++j)
      std::memcpy(ni.data() + np[j], h->Ui.data() + h->Up[j],
                  fill[j] * sizeof(int32_t));
    h->Up.swap(np);
    h->Ui.swap(ni);
  }

  // elimination tree + column counts (up-looking reach)
  h->parent.assign(n, -1);
  std::vector<int32_t> ancestor(n, -1);
  std::vector<int64_t> colcount(n, 0);
  h->flag.assign(n, -1);
  for (int j = 0; j < n; ++j) {
    h->flag[j] = j;
    for (int64_t p = h->Up[j]; p < h->Up[j + 1]; ++p) {
      int i = h->Ui[p];
      if (i >= j) continue;
      // walk up the tree from i to the root/j, path-compressing
      while (h->flag[i] != j) {
        if (h->parent[i] == -1) h->parent[i] = j;
        ++colcount[i];  // L has an entry in column i, row j
        h->flag[i] = j;
        i = h->parent[i];
      }
    }
  }
  h->Lp.assign(n + 1, 0);
  for (int j = 0; j < n; ++j) h->Lp[j + 1] = h->Lp[j] + colcount[j];
  h->lnnz = h->Lp[n];
  if (max_fill > 0 && h->lnnz > max_fill) {
    delete h;
    return nullptr;
  }
  h->Li.resize(h->lnnz);
  h->Lx.resize(h->lnnz);
  h->D.resize(n);
  h->pattern.resize(n);
  h->y.resize(n);
  // symbolic fill of Li: repeat the reach, appending row indices
  std::vector<int64_t> lfill(n, 0);
  std::fill(h->flag.begin(), h->flag.end(), -1);
  for (int j = 0; j < n; ++j) {
    h->flag[j] = j;
    for (int64_t p = h->Up[j]; p < h->Up[j + 1]; ++p) {
      int i = h->Ui[p];
      if (i >= j) continue;
      while (h->flag[i] != j) {
        h->Li[h->Lp[i] + lfill[i]++] = j;  // row j in column i
        h->flag[i] = j;
        i = h->parent[i];
      }
    }
  }
  return h;
}

void hx_ldl_destroy(void* hv) { delete static_cast<LdlHandle*>(hv); }

int64_t hx_ldl_lnnz(void* hv) {
  return static_cast<LdlHandle*>(hv)->lnnz;
}

int hx_ldl_n_reg(void* hv) {
  return static_cast<LdlHandle*>(hv)->n_reg;
}

// Numeric up-looking LDL' over the analyzed pattern.  `Ax` must have
// the SAME pattern (Ap/Ai) as passed to analyze.  Pivots smaller than
// `reg_floor` * (column scale) are bumped to it (dynamic
// regularization); returns the number regularized.
int hx_ldl_factor(void* hv, const int64_t* Ap, const int32_t* Ai,
                  const double* Ax, double reg_floor) {
  LdlHandle* h = static_cast<LdlHandle*>(hv);
  const int n = h->n;
  // permuted upper-triangle VALUES aligned with h->Up/Ui: rebuild by
  // scattering (duplicates summed)
  std::vector<double>& y = h->y;
  std::vector<double> uval(h->Up[n], 0.0);
  {
    // map (row,col) -> slot via per-column binary search.  The input
    // is the FULL symmetric matrix, so each off-diagonal pair appears
    // twice; only the copy whose permuted row <= permuted col is
    // taken (the other copy maps to the same upper slot and would
    // double it).
    for (int j = 0; j < n; ++j) {
      const int pj = h->iperm[j];
      for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
        const int pi = h->iperm[Ai[p]];
        if (pi > pj) continue;
        const int32_t* b = h->Ui.data() + h->Up[pj];
        const int32_t* e = h->Ui.data() + h->Up[pj + 1];
        const int32_t* it = std::lower_bound(b, e, pi);
        uval[h->Up[pj] + (it - b)] += Ax[p];
      }
    }
  }
  // original (permuted) diagonal per column: the regularization floor
  // is RELATIVE to it — late-IPM normal matrices span ~20 orders of
  // magnitude across the diagonal, so any global floor either does
  // nothing or falsely regularizes hundreds of healthy small pivots
  std::vector<double> diag0(n, 0.0);
  for (int j = 0; j < n; ++j)
    for (int64_t p = h->Up[j]; p < h->Up[j + 1]; ++p)
      if (h->Ui[p] == j) diag0[j] = std::fabs(uval[p]);
  std::vector<int64_t> lnz(n, 0);
  std::vector<int32_t>& flag = h->flag;
  std::vector<int32_t>& pattern = h->pattern;
  std::fill(flag.begin(), flag.end(), -1);
  h->n_reg = 0;
  for (int j = 0; j < n; ++j) {
    // pattern of row j of L = tree reach of upper entries of column j
    int top = n;
    flag[j] = j;
    y[j] = 0.0;
    for (int64_t p = h->Up[j]; p < h->Up[j + 1]; ++p) {
      const int i0 = h->Ui[p];
      y[i0] += uval[p];
      if (i0 == j) continue;
      int len = 0, i = i0;
      while (flag[i] != j) {
        pattern[len++] = i;
        flag[i] = j;
        i = h->parent[i];
      }
      while (len > 0) pattern[--top] = pattern[--len];
    }
    // numeric sparse triangular solve along the pattern
    double dj = y[j];
    y[j] = 0.0;
    for (int t = top; t < n; ++t) {
      const int i = pattern[t];
      const double yi = y[i];
      y[i] = 0.0;
      // update y with column i of L (rows strictly below i; row j is
      // appended only after this loop, so it never self-touches)
      const int64_t p0 = h->Lp[i], p1 = h->Lp[i] + lnz[i];
      for (int64_t p = p0; p < p1; ++p)
        y[h->Li[p]] -= h->Lx[p] * yi;
      const double lji = yi / h->D[i];
      dj -= lji * yi;
      // store L(j,i)
      h->Li[h->Lp[i] + lnz[i]] = j;
      h->Lx[h->Lp[i] + lnz[i]] = lji;
      ++lnz[i];
    }
    const double floor_j =
        std::max(reg_floor * std::max(diag0[j], 1e-300), 1e-300);
    if (!(dj > floor_j)) {  // SPD expectation: bump small/neg pivots
      dj = floor_j;
      ++h->n_reg;
    }
    h->D[j] = dj;
  }
  return h->n_reg;
}

// As hx_ldl_factor but for QUASI-DEFINITE systems (Vanderbei): the
// caller supplies the expected pivot SIGN per (original) index — +1
// for the primal/Hessian block, -1 for the constraint block.  Signed
// LDL' of a quasi-definite matrix exists for any ordering; pivots that
// cross zero are bumped toward their expected sign (the QP
// regularization role of qpsolver/factor.hpp).
int hx_ldl_factor_signed(void* hv, const int64_t* Ap, const int32_t* Ai,
                         const double* Ax, double reg_floor,
                         const int8_t* sign) {
  LdlHandle* h = static_cast<LdlHandle*>(hv);
  const int n = h->n;
  std::vector<double>& y = h->y;
  std::vector<double> uval(h->Up[n], 0.0);
  for (int j = 0; j < n; ++j) {
    const int pj = h->iperm[j];
    for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
      const int pi = h->iperm[Ai[p]];
      if (pi > pj) continue;
      const int32_t* b = h->Ui.data() + h->Up[pj];
      const int32_t* e = h->Ui.data() + h->Up[pj + 1];
      const int32_t* it = std::lower_bound(b, e, pi);
      uval[h->Up[pj] + (it - b)] += Ax[p];
    }
  }
  std::vector<double> diag0(n, 0.0);
  for (int j = 0; j < n; ++j)
    for (int64_t p = h->Up[j]; p < h->Up[j + 1]; ++p)
      if (h->Ui[p] == j) diag0[j] = std::fabs(uval[p]);
  std::vector<int64_t> lnz(n, 0);
  std::vector<int32_t>& flag = h->flag;
  std::vector<int32_t>& pattern = h->pattern;
  std::fill(flag.begin(), flag.end(), -1);
  h->n_reg = 0;
  for (int j = 0; j < n; ++j) {
    int top = n;
    flag[j] = j;
    y[j] = 0.0;
    for (int64_t p = h->Up[j]; p < h->Up[j + 1]; ++p) {
      const int i0 = h->Ui[p];
      y[i0] += uval[p];
      if (i0 == j) continue;
      int len = 0, i = i0;
      while (flag[i] != j) {
        pattern[len++] = i;
        flag[i] = j;
        i = h->parent[i];
      }
      while (len > 0) pattern[--top] = pattern[--len];
    }
    double dj = y[j];
    y[j] = 0.0;
    for (int t = top; t < n; ++t) {
      const int i = pattern[t];
      const double yi = y[i];
      y[i] = 0.0;
      const int64_t p0 = h->Lp[i], p1 = h->Lp[i] + lnz[i];
      for (int64_t p = p0; p < p1; ++p)
        y[h->Li[p]] -= h->Lx[p] * yi;
      const double lji = yi / h->D[i];
      dj -= lji * yi;
      h->Li[h->Lp[i] + lnz[i]] = j;
      h->Lx[h->Lp[i] + lnz[i]] = lji;
      ++lnz[i];
    }
    const double sj = (sign && sign[h->perm[j]] < 0) ? -1.0 : 1.0;
    const double floor_j =
        std::max(reg_floor * std::max(diag0[j], 1e-300), 1e-300);
    if (!(sj * dj > floor_j)) {
      dj = sj * floor_j;
      ++h->n_reg;
    }
    h->D[j] = dj;
  }
  return h->n_reg;
}

// x := M^{-1} b using the factorization (b overwritten)
void hx_ldl_solve(void* hv, double* b) {
  LdlHandle* h = static_cast<LdlHandle*>(hv);
  const int n = h->n;
  std::vector<double>& y = h->y;
  for (int k = 0; k < n; ++k) y[k] = b[h->perm[k]];
  // L y' = y (L unit lower, stored by column)
  for (int i = 0; i < n; ++i) {
    const double yi = y[i];
    if (yi == 0.0) continue;
    for (int64_t p = h->Lp[i]; p < h->Lp[i + 1]; ++p)
      y[h->Li[p]] -= h->Lx[p] * yi;
  }
  for (int i = 0; i < n; ++i) y[i] /= h->D[i];
  // L' z = y
  for (int i = n - 1; i >= 0; --i) {
    double s = y[i];
    for (int64_t p = h->Lp[i]; p < h->Lp[i + 1]; ++p)
      s -= h->Lx[p] * y[h->Li[p]];
    y[i] = s;
  }
  for (int k = 0; k < n; ++k) b[h->perm[k]] = y[k];
}

}  // extern "C"
