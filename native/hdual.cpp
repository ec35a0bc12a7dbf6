// Bounded-variable revised DUAL simplex with persistent hot-start state.
//
// Native node-re-solve engine of the highs_tpu framework.  The reference
// keeps its dual simplex in C++ (highs/simplex/HEkkDual.cpp:1185-1280,
// CHUZR -> BTRAN -> PRICE -> CHUZC -> FTRANs -> update) because the pivot
// loop is strictly sequential and latency-bound — the part that does not
// map to TPU (SURVEY §3.1/§3.4).  This is an original implementation of
// the same textbook algorithm family (Koberstein-style bounded dual
// simplex), NOT a translation of the reference:
//
//  - leaving-row choice by dual steepest edge (reference parity:
//    HEkkDual dual_edge_weight_strategy; weights over basic positions,
//    Forrest–Goldfarb update using one extra FTRAN per pivot);
//  - bound-flip ratio test (BFRT) with a Harris-style two-pass
//    tolerance group (reference parity: HEkkDual BFRT + Harris);
//  - incremental reduced costs updated from the priced pivot row — no
//    full PRICE-against-all-columns scans per iteration (the
//    predecessor engine in hsimplex.cpp did two of them per pivot);
//  - sparse PRICE through a CSR copy of A (reference parity:
//    HighsSparseMatrix::priceByRowWithSwitch);
//  - persistent engine object: a MIP dive changes only variable bounds,
//    so the basis factorization survives across node re-solves
//    (reference parity: HighsLpRelaxation hot starts, HEkk iterate
//    put/get) — set_bounds + solve costs one FTRAN to refresh x_B, not
//    a refactorization;
//  - basis kernel: sparse left-looking LU (role of HFactor::build,
//    highs/util/HFactor.h:204) with product-form eta updates between
//    periodic refactorizations, plus an exact recompute of x_B and the
//    duals at every refactorization to bound drift.
//
// Dual phase-1 is handled the hot-start way: flip boxed nonbasics whose
// reduced cost has the wrong sign (costless), and report kNeedPrimal
// when a free/one-sided variable is dual infeasible so the caller can
// run its primal engine instead (at MIP nodes this never triggers:
// bound tightening preserves dual feasibility of the parent basis).
//
// C ABI only (used from Python via ctypes and from hx_mip_solve).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <chrono>
#include <cstdlib>
#include <queue>
#include <utility>
#include <vector>

namespace {

constexpr double kInf = 1e30;

enum Status : int8_t {
  kLower = 0,
  kBasic = 1,
  kUpper = 2,
  kZero = 3,  // nonbasic free at zero
};

enum Result : int {
  kOptimal = 0,
  kInfeasible = 1,
  kUnbounded = 2,
  kIterLimit = 3,
  kSingular = 4,
  kNeedPrimal = 5,  // start basis dual-infeasible beyond bound flips
  kObjCut = 6,      // dual objective passed the caller's cutoff
};

// ---------------------------------------------------------------------------
// Sparse left-looking LU with FORREST-TOMLIN updates (role of the
// reference HFactor's updateFT, util/HFactor.h:490): replacing a basis
// column updates U in place via a spike column + one sparse row eta,
// so solves stay at ~nnz(LU) instead of dragging a growing
// product-form eta chain through every FTRAN/BTRAN.
//
// U is held BOTH column-wise (Ucol: needed by the triangular solves)
// and row-wise (Urow: needed by the update's row elimination), over an
// EVOLVING elimination order `order` (kof = inverse).  Row etas collect
// the update's elimination multipliers and apply between the L-part
// and the U-part of each solve.
struct LU {
  int m = 0;
  std::vector<int> Lstart, Lrow;
  std::vector<double> Lval;
  std::vector<double> Upiv;
  std::vector<int> pivrow;  // position -> original row
  std::vector<int> qcol;    // position -> basis position
  std::vector<int> posq;    // basis position -> position (inverse)
  // Dynamic U (entries strictly above the diagonal in `order` terms),
  // stored FLAT in both column- and row-major segments with per-
  // segment headroom: solves walk contiguous memory instead of
  // chasing one heap vector per column (the former
  // vector<vector<pair>> layout cost a cache miss per column per
  // solve).  Deletions swap-remove inside the segment (entry order is
  // irrelevant — solves only need the full set per segment);
  // insertions append into the headroom or relocate the segment to
  // the end of the arena (reference parity: HFactor's arena-with-
  // relocation update storage).
  std::vector<int> Ucs, Uce, Ucap;   // col segment [Ucs,Uce), cap Ucap
  std::vector<int> Uci;              // row position of entry
  std::vector<double> Ucv;           // value
  std::vector<int> Urs, Ure, Urcap;  // row segment mirrors
  std::vector<int> Uri;              // col position of entry
  std::vector<double> Urv;
  int64_t u_nnz = 0;  // live off-diagonal entries (maintained)
  std::vector<int> order;  // elimination order: k-th eliminated position
  std::vector<int> kof;    // position -> index in order
  // flat row-eta chain: eta k targets eta_t[k] with terms
  // (eta_pos, eta_mult)[eta_start[k] .. eta_start[k+1])
  std::vector<int> eta_t, eta_start, eta_pos;
  std::vector<double> eta_mult;
  int64_t eta_nnz = 0;  // total stored eta entries since last factor
  void clear() {
    Lstart.assign(1, 0); Lrow.clear(); Lval.clear();
    Upiv.clear(); pivrow.clear(); qcol.clear(); posq.clear();
    Ucs.clear(); Uce.clear(); Ucap.clear(); Uci.clear(); Ucv.clear();
    Urs.clear(); Ure.clear(); Urcap.clear(); Uri.clear(); Urv.clear();
    u_nnz = 0;
    order.clear(); kof.clear();
    eta_t.clear(); eta_start.assign(1, 0); eta_pos.clear();
    eta_mult.clear(); eta_nnz = 0;
  }
  // append an entry to column `c` (headroom or relocation)
  void col_push(int c, int rowpos, double v) {
    if (Uce[c] == Ucap[c]) {
      const int len = Uce[c] - Ucs[c];
      const int ns = (int)Uci.size();
      const int ncap = len + std::max(4, len / 2 + 1);
      Uci.resize(ns + ncap);
      Ucv.resize(ns + ncap);
      std::memcpy(Uci.data() + ns, Uci.data() + Ucs[c],
                  len * sizeof(int));
      std::memcpy(Ucv.data() + ns, Ucv.data() + Ucs[c],
                  len * sizeof(double));
      Ucs[c] = ns; Uce[c] = ns + len; Ucap[c] = ns + ncap;
    }
    Uci[Uce[c]] = rowpos; Ucv[Uce[c]] = v; ++Uce[c];
  }
  void row_push(int r, int colpos, double v) {
    if (Ure[r] == Urcap[r]) {
      const int len = Ure[r] - Urs[r];
      const int ns = (int)Uri.size();
      const int ncap = len + std::max(4, len / 2 + 1);
      Uri.resize(ns + ncap);
      Urv.resize(ns + ncap);
      std::memcpy(Uri.data() + ns, Uri.data() + Urs[r],
                  len * sizeof(int));
      std::memcpy(Urv.data() + ns, Urv.data() + Urs[r],
                  len * sizeof(double));
      Urs[r] = ns; Ure[r] = ns + len; Urcap[r] = ns + ncap;
    }
    Uri[Ure[r]] = colpos; Urv[Ure[r]] = v; ++Ure[r];
  }
  void col_remove(int c, int rowpos) {
    for (int k = Ucs[c]; k < Uce[c]; ++k)
      if (Uci[k] == rowpos) {
        --Uce[c];
        Uci[k] = Uci[Uce[c]]; Ucv[k] = Ucv[Uce[c]];
        return;
      }
  }
  void row_remove(int r, int colpos) {
    for (int k = Urs[r]; k < Ure[r]; ++k)
      if (Uri[k] == colpos) {
        --Ure[r];
        Uri[k] = Uri[Ure[r]]; Urv[k] = Urv[Ure[r]];
        return;
      }
  }
};

struct Engine {
  int m = 0, n = 0, nv = 0;
  // per-variable primal tolerance scale (maps an absolute UNSCALED
  // feasibility tolerance into the scaled space: 1/c_j for columns,
  // r_i for logicals); empty = all ones
  std::vector<double> tolsc;
  // matrix views (owned copies: the engine outlives python temporaries)
  std::vector<int64_t> Ap;
  std::vector<int32_t> Ai;
  std::vector<double> Ax;
  std::vector<int64_t> Rp;
  std::vector<int32_t> Ri;
  std::vector<double> Rx;
  std::vector<double> cost;   // size nv (logicals cost 0)
  std::vector<double> lo, up; // size nv
  std::vector<int8_t> stat;
  std::vector<int32_t> basic;   // basis position -> variable
  std::vector<int32_t> posof;   // variable -> basis position or -1
  std::vector<double> xval;     // all variables
  std::vector<double> d;        // reduced costs (basic: 0)
  std::vector<double> dse;      // DSE weights per basis position
  LU lu;
  int since_refactor = 0;
  bool factored = false;
  // duals d depend only on (basis, cost): valid across bound-only
  // node re-solves (set_basis_from invalidates)
  bool d_valid = false;
  // scratch
  std::vector<double> wrow, wcol, wm, rho, tau, acol, fvec;
  std::vector<double> unitv, rho_copy, dxb, spike;
  std::vector<double> ft_acc;
  std::vector<char> ft_in;
  std::vector<double> arow;     // priced pivot row over variables
  std::vector<int32_t> arow_ix; // touched entries of arow (sparse mode)
  bool price_dense = false;     // last PRICE used the dense path
  int64_t iters_total = 0;

  void axpy_col(int j, double a, double* y) const {
    if (a == 0.0) return;
    if (j < n) {
      for (int64_t k = Ap[j]; k < Ap[j + 1]; ++k) y[Ai[k]] += a * Ax[k];
    } else {
      y[j - n] -= a;
    }
  }
  double dot_col(int j, const double* v) const {
    if (j < n) {
      double s = 0.0;
      for (int64_t k = Ap[j]; k < Ap[j + 1]; ++k) s += Ax[k] * v[Ai[k]];
      return s;
    }
    return -v[j - n];
  }
};

// dev-only section clocks for the dual loop (HX_TIMING=1), the role of
// the reference's SimplexTimer/FactorTimer clock sets
struct LoopClocks {
  double chuzr = 0, btran = 0, price = 0, chuzc = 0, ftran = 0,
         dse = 0, primal = 0, factor = 0, etc = 0;
  int64_t iters = 0, factors = 0;
  int64_t rho_nnz = 0, acol_nnz = 0, eta_cnt = 0;
  int64_t lu_fill = 0, basis_nnz = 0;  // accumulated at factor time
  int64_t degen = 0, flips = 0, verifies = 0;
  bool on = false;
  ~LoopClocks() {
    if (on && iters)
      fprintf(stderr,
              "[hx_dual clocks] iters=%lld factors=%lld chuzr=%.3f "
              "btran=%.3f price=%.3f chuzc=%.3f ftran=%.3f dse=%.3f "
              "primal=%.3f factor=%.3f etc=%.3f rho_nnz/it=%.0f "
              "acol_nnz/it=%.0f etas/it=%.1f fill=%.2f\n",
              (long long)iters, (long long)factors, chuzr, btran, price,
              chuzc, ftran, dse, primal, factor, etc,
              (double)rho_nnz / iters, (double)acol_nnz / iters,
              (double)eta_cnt / iters,
              basis_nnz ? (double)lu_fill / (double)basis_nnz : 0.0);
    if (on && iters)
      fprintf(stderr, "[hx_dual counts] degen=%lld flips=%lld "
              "verifies=%lld\n", (long long)degen, (long long)flips,
              (long long)verifies);
  }
};
static LoopClocks g_clk;
static struct ClkInit {
  ClkInit() { g_clk.on = getenv("HX_TIMING") != nullptr; }
} g_clk_init;
static inline double clk_now() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}
#define CLK(field, stmt)                      \
  do {                                        \
    if (g_clk.on) {                           \
      const double t0_ = clk_now();           \
      stmt;                                   \
      g_clk.field += clk_now() - t0_;         \
    } else {                                  \
      stmt;                                   \
    }                                         \
  } while (0)

// LU build over the current basis; on failure reports the dependent
// basis position for repair.
bool factor_once(Engine& e, int* fail_pos) {
  const int m = e.m;
  LU& lu = e.lu;
  lu.m = m;
  lu.clear();
  std::vector<int> colorder(m), nnz(m);
  for (int p = 0; p < m; ++p) {
    colorder[p] = p;
    int j = e.basic[p];
    nnz[p] = (j < e.n) ? int(e.Ap[j + 1] - e.Ap[j]) : 1;
  }
  std::stable_sort(colorder.begin(), colorder.end(),
                   [&](int a, int b) { return nnz[a] < nnz[b]; });
  std::vector<double> work(m, 0.0);
  std::vector<int> touched;
  touched.reserve(64);
  std::vector<char> intouch(m, 0);
  std::vector<int> rowassigned(m, -1);
  lu.pivrow.resize(m);
  lu.qcol.resize(m);
  lu.Upiv.resize(m);
  // columns append to a growing flat arena during build (headroom is
  // added per segment after the pattern is known); rows are filled in
  // a second pass once per-row counts exist
  lu.Ucs.assign(m, 0); lu.Uce.assign(m, 0); lu.Ucap.assign(m, 0);
  lu.Uci.clear(); lu.Ucv.clear();
  std::vector<std::pair<int, double>> centries;
  centries.reserve(64);
  auto touch = [&](int r) {
    if (!intouch[r]) { intouch[r] = 1; touched.push_back(r); }
  };
  // elimination worklist: min-heap over positions whose pivot row
  // appears in the current column (Gilbert–Peierls-style sparse
  // left-looking; the former linear scan over ALL previous positions
  // was O(m^2) per factorization and dominated refactor cost)
  std::priority_queue<int, std::vector<int>, std::greater<int>> elim;
  std::vector<char> inelim(m, 0);
  for (int pos = 0; pos < m; ++pos) {
    const int p = colorder[pos];
    const int j = e.basic[p];
    lu.qcol[pos] = p;
    touched.clear();
    auto seed = [&](int r) {
      touch(r);
      const int pos2 = rowassigned[r];
      if (pos2 >= 0 && !inelim[pos2]) {
        inelim[pos2] = 1;
        elim.push(pos2);
      }
    };
    if (j < e.n) {
      for (int64_t k = e.Ap[j]; k < e.Ap[j + 1]; ++k) {
        work[e.Ai[k]] = e.Ax[k];
        seed(e.Ai[k]);
      }
    } else {
      work[j - e.n] = -1.0;
      seed(j - e.n);
    }
    while (!elim.empty()) {
      const int pos2 = elim.top();
      elim.pop();
      inelim[pos2] = 0;
      const double t = work[lu.pivrow[pos2]];
      if (t == 0.0) continue;
      for (int k = lu.Lstart[pos2]; k < lu.Lstart[pos2 + 1]; ++k) {
        const int r = lu.Lrow[k];
        seed(r);
        work[r] -= lu.Lval[k] * t;
      }
    }
    centries.clear();
    for (int r : touched) {
      const int pos2 = rowassigned[r];
      if (pos2 >= 0 && work[r] != 0.0)
        centries.push_back({pos2, work[r]});
    }
    {
      const int len = (int)centries.size();
      const int cap = len + std::max(2, len / 4);
      const int ns = (int)lu.Uci.size();
      lu.Uci.resize(ns + cap);
      lu.Ucv.resize(ns + cap);
      for (int k = 0; k < len; ++k) {
        lu.Uci[ns + k] = centries[k].first;
        lu.Ucv[ns + k] = centries[k].second;
      }
      lu.Ucs[pos] = ns; lu.Uce[pos] = ns + len;
      lu.Ucap[pos] = ns + cap;
    }
    int piv = -1;
    double best = 1e-9;
    for (int r : touched) {
      if (rowassigned[r] >= 0) continue;
      const double v = std::fabs(work[r]);
      if (v > best) { best = v; piv = r; }
    }
    if (piv < 0) {
      for (int r : touched) { work[r] = 0.0; intouch[r] = 0; }
      *fail_pos = p;
      return false;
    }
    const double dpiv = work[piv];
    lu.Upiv[pos] = dpiv;
    lu.pivrow[pos] = piv;
    rowassigned[piv] = pos;
    for (int r : touched) {
      if (rowassigned[r] >= 0 || r == piv) continue;
      const double v = work[r];
      if (std::fabs(v) > 1e-14 * std::fabs(dpiv)) {
        lu.Lrow.push_back(r);
        lu.Lval.push_back(v / dpiv);
      }
    }
    lu.Lstart.push_back(int(lu.Lrow.size()));
    for (int r : touched) { work[r] = 0.0; intouch[r] = 0; }
  }
  lu.order.resize(m);
  lu.kof.resize(m);
  lu.posq.resize(m);
  for (int pos = 0; pos < m; ++pos) {
    lu.order[pos] = pos;
    lu.kof[pos] = pos;
    lu.posq[lu.qcol[pos]] = pos;
  }
  // second pass: row-major mirror of U with per-row headroom
  std::vector<int> rcnt(m, 0);
  int64_t total = 0;
  for (int pos = 0; pos < m; ++pos)
    for (int k = lu.Ucs[pos]; k < lu.Uce[pos]; ++k) ++rcnt[lu.Uci[k]];
  lu.Urs.resize(m); lu.Ure.resize(m); lu.Urcap.resize(m);
  int cur = 0;
  for (int r = 0; r < m; ++r) {
    const int cap = rcnt[r] + std::max(2, rcnt[r] / 4);
    lu.Urs[r] = cur; lu.Ure[r] = cur; lu.Urcap[r] = cur + cap;
    cur += cap;
    total += rcnt[r];
  }
  lu.Uri.resize(cur);
  lu.Urv.resize(cur);
  for (int pos = 0; pos < m; ++pos)
    for (int k = lu.Ucs[pos]; k < lu.Uce[pos]; ++k) {
      const int r = lu.Uci[k];
      lu.Uri[lu.Ure[r]] = pos;
      lu.Urv[lu.Ure[r]] = lu.Ucv[k];
      ++lu.Ure[r];
    }
  lu.u_nnz = total;
  return true;
}

bool factor(Engine& e) {
  for (int attempt = 0; attempt <= e.m; ++attempt) {
    int fail_pos = -1;
    if (factor_once(e, &fail_pos)) {
      e.since_refactor = 0;
      e.factored = true;
      if (g_clk.on) {
        g_clk.lu_fill +=
            (int64_t)e.lu.Lrow.size() + e.lu.u_nnz + e.m;
        int64_t bn = 0;
        for (int p = 0; p < e.m; ++p) {
          const int j = e.basic[p];
          bn += (j < e.n) ? (e.Ap[j + 1] - e.Ap[j]) : 1;
        }
        g_clk.basis_nnz += bn;
      }
      return true;
    }
    // basis repair: demote the dependent basic, bring in a logical
    int jd = e.basic[fail_pos];
    bool lo_fin = e.lo[jd] > -kInf;
    e.stat[jd] = lo_fin ? kLower : (e.up[jd] < kInf ? kUpper : kZero);
    e.posof[jd] = -1;
    int replacement = -1;
    for (int k = 0; k < e.m; ++k) {
      int i = (fail_pos + attempt + k) % e.m;
      int cand = e.n + i;
      if (cand != jd && e.stat[cand] != kBasic) { replacement = cand; break; }
    }
    if (replacement < 0) return false;
    e.stat[replacement] = kBasic;
    e.basic[fail_pos] = replacement;
    e.posof[replacement] = fail_pos;
  }
  return false;
}

// FTRAN pipeline with FT updates:  B = L~ M^{-1} U  (M = product of
// the unit row-eta eliminations), so  B^{-1}b = U^{-1} M (L-part of b).
// `spike_out` (optional, position-indexed) captures the vector AFTER
// the L-part and row etas but BEFORE the U back-substitution — exactly
// the Forrest-Tomlin spike of a would-be basis change to this column.
void ftran_full(Engine& e, double* b, double* x, double* spike_out) {
  const LU& lu = e.lu;
  const int m = lu.m;
  // L part (fixed factor-time order is valid: L is never updated)
  for (int pos = 0; pos < m; ++pos) {
    const double t = b[lu.pivrow[pos]];
    if (t == 0.0) continue;
    for (int k = lu.Lstart[pos]; k < lu.Lstart[pos + 1]; ++k)
      b[lu.Lrow[k]] -= lu.Lval[k] * t;
  }
  std::vector<double>& acc = e.wm;
  acc.resize(m);
  for (int pos = 0; pos < m; ++pos) acc[pos] = b[lu.pivrow[pos]];
  // row etas in creation order: acc[t] -= sum mult_k * acc[k]
  const int ne = (int)lu.eta_t.size();
  for (int eix = 0; eix < ne; ++eix) {
    double s = acc[lu.eta_t[eix]];
    for (int k = lu.eta_start[eix]; k < lu.eta_start[eix + 1]; ++k)
      s -= lu.eta_mult[k] * acc[lu.eta_pos[k]];
    acc[lu.eta_t[eix]] = s;
  }
  if (spike_out)
    for (int pos = 0; pos < m; ++pos) spike_out[pos] = acc[pos];
  // U back substitution over the CURRENT elimination order
  for (int k = m - 1; k >= 0; --k) {
    const int pos = lu.order[k];
    const double xv = acc[pos] / lu.Upiv[pos];
    x[lu.qcol[pos]] = xv;
    if (xv == 0.0) continue;
    for (int t = lu.Ucs[pos]; t < lu.Uce[pos]; ++t)
      acc[lu.Uci[t]] -= lu.Ucv[t] * xv;
  }
}

// y = B^{-T} eb for eb over basis positions; y over rows
void btran_vec(Engine& e, const double* eb, double* y) {
  const LU& lu = e.lu;
  const int m = lu.m;
  std::vector<double>& z = e.wm;
  z.resize(m);
  // U' forward solve over the current elimination order
  for (int k = 0; k < m; ++k) {
    const int pos = lu.order[k];
    double s = eb[lu.qcol[pos]];
    for (int t = lu.Ucs[pos]; t < lu.Uce[pos]; ++t)
      s -= lu.Ucv[t] * z[lu.Uci[t]];
    z[pos] = s / lu.Upiv[pos];
  }
  // row-eta transposes in reverse creation order
  for (int eix = (int)lu.eta_t.size() - 1; eix >= 0; --eix) {
    const double zt = z[lu.eta_t[eix]];
    if (zt != 0.0)
      for (int k = lu.eta_start[eix]; k < lu.eta_start[eix + 1]; ++k)
        z[lu.eta_pos[k]] -= lu.eta_mult[k] * zt;
  }
  // L' back solve (fixed factor-time order)
  for (int i = 0; i < m; ++i) y[i] = 0.0;
  for (int pos = 0; pos < m; ++pos) y[lu.pivrow[pos]] = z[pos];
  for (int pos = m - 1; pos >= 0; --pos) {
    double s = y[lu.pivrow[pos]];
    for (int k = lu.Lstart[pos]; k < lu.Lstart[pos + 1]; ++k)
      s -= lu.Lval[k] * y[lu.Lrow[k]];
    y[lu.pivrow[pos]] = s;
  }
}

// alpha = B^{-1} W_j over basis positions (optionally capturing the
// FT spike for a subsequent basis change on this column)
void ftran_col_spike(Engine& e, int j, double* alpha, double* spike) {
  std::vector<double>& col = e.wcol;
  col.assign(e.m, 0.0);
  e.axpy_col(j, 1.0, col.data());
  ftran_full(e, col.data(), alpha, spike);
}

void ftran_col(Engine& e, int j, double* alpha) {
  ftran_col_spike(e, j, alpha, nullptr);
}

// alpha = B^{-1} v for a dense row-indexed v (consumed)
void ftran_vec(Engine& e, double* v, double* alpha) {
  ftran_full(e, v, alpha, nullptr);
}

// recompute x_B from the nonbasic values (one base solve)
void compute_basics(Engine& e) {
  std::vector<double> rhs(e.m, 0.0);
  for (int j = 0; j < e.nv; ++j) {
    if (e.stat[j] == kBasic) continue;
    double v = 0.0;
    if (e.stat[j] == kLower) v = e.lo[j];
    else if (e.stat[j] == kUpper) v = e.up[j];
    e.xval[j] = v;
    e.axpy_col(j, -v, rhs.data());
  }
  std::vector<double> xb(e.m);
  ftran_vec(e, rhs.data(), xb.data());
  for (int p = 0; p < e.m; ++p) e.xval[e.basic[p]] = xb[p];
}

// recompute reduced costs d = c - W' y with y = B^{-T} c_B
void compute_duals(Engine& e) {
  std::vector<double> cb(e.m);
  for (int p = 0; p < e.m; ++p) cb[p] = e.cost[e.basic[p]];
  std::vector<double> y(e.m);
  btran_vec(e, cb.data(), y.data());
  for (int j = 0; j < e.nv; ++j)
    e.d[j] = (e.stat[j] == kBasic) ? 0.0
                                   : e.cost[j] - e.dot_col(j, y.data());
}

// Forrest-Tomlin basis-change update (reference HFactor updateFT,
// util/HFactor.h:490): basis slot `slot_r` receives the column whose
// FT spike (position-indexed, captured by ftran_col_spike) is given.
// Returns false when the implied new pivot is numerically unsafe —
// the caller refactorizes instead (same recourse the reference takes).
bool ft_update(Engine& e, int slot_r, const double* spike) {
  LU& lu = e.lu;
  const int m = lu.m;
  const int t = lu.posq[slot_r];
  // 1. detach the old column t from the row lists
  for (int k = lu.Ucs[t]; k < lu.Uce[t]; ++k)
    lu.row_remove(lu.Uci[k], t);
  lu.u_nnz -= lu.Uce[t] - lu.Ucs[t];
  lu.Uce[t] = lu.Ucs[t];
  // 2. move t to the end of the elimination order
  const int kt = lu.kof[t];
  for (int k = kt; k + 1 < m; ++k) {
    lu.order[k] = lu.order[k + 1];
    lu.kof[lu.order[k]] = k;
  }
  lu.order[m - 1] = t;
  lu.kof[t] = m - 1;
  // 3. eliminate the old row t (its entries now sit below the
  //    diagonal) with a sparse accumulator processed in elimination
  //    order; multipliers become one row eta
  double diag = spike[t];
  double smax = std::fabs(diag);
  std::vector<double>& acc = e.ft_acc;
  std::vector<char>& inacc = e.ft_in;
  if ((int)acc.size() != m) { acc.assign(m, 0.0); inacc.assign(m, 0); }
  std::priority_queue<std::pair<int, int>,
                      std::vector<std::pair<int, int>>,
                      std::greater<std::pair<int, int>>> heap;
  for (int k = lu.Urs[t]; k < lu.Ure[t]; ++k) {
    // row t is eliminated: its entries leave the U columns too (they
    // would sit below the diagonal after the reorder)
    const int cpos = lu.Uri[k];
    lu.col_remove(cpos, t);
    --lu.u_nnz;
    acc[cpos] = lu.Urv[k];
    if (!inacc[cpos]) { inacc[cpos] = 1;
      heap.push({lu.kof[cpos], cpos}); }
  }
  lu.Ure[t] = lu.Urs[t];
  const int eta_terms0 = (int)lu.eta_pos.size();
  while (!heap.empty()) {
    const int cpos = heap.top().second;
    heap.pop();
    if (!inacc[cpos]) continue;
    inacc[cpos] = 0;
    const double v = acc[cpos];
    acc[cpos] = 0.0;
    if (v == 0.0) continue;
    const double mult = v / lu.Upiv[cpos];
    if (std::fabs(mult) <= 1e-14) continue;
    lu.eta_pos.push_back(cpos);
    lu.eta_mult.push_back(mult);
    diag -= mult * spike[cpos];
    for (int k = lu.Urs[cpos]; k < lu.Ure[cpos]; ++k) {
      const int c2 = lu.Uri[k];
      acc[c2] -= mult * lu.Urv[k];
      if (!inacc[c2]) { inacc[c2] = 1;
        heap.push({lu.kof[c2], c2}); }
    }
  }
  // 4. install the spike as the new column t (all other entries are
  //    above the diagonal now that t is eliminated last)
  for (int pos = 0; pos < m; ++pos) {
    if (pos == t) continue;
    const double v = spike[pos];
    if (std::fabs(v) > 1e-14) {
      smax = std::max(smax, std::fabs(v));
      lu.col_push(t, pos, v);
      lu.row_push(pos, t, v);
      ++lu.u_nnz;
    }
  }
  // 5. stability: an unsafe new pivot poisons every later solve
  if (!(std::fabs(diag) > 1e-9 && std::fabs(diag) > 1e-7 * smax)) {
    // roll back the partially-recorded eta terms (the caller
    // refactorizes, which clears everything anyway, but keep the
    // chain consistent for any diagnostic path)
    lu.eta_pos.resize(eta_terms0);
    lu.eta_mult.resize(eta_terms0);
    return false;
  }
  lu.Upiv[t] = diag;
  if ((int)lu.eta_pos.size() > eta_terms0) {
    lu.eta_nnz += (int64_t)lu.eta_pos.size() - eta_terms0;
    lu.eta_t.push_back(t);
    lu.eta_start.push_back((int)lu.eta_pos.size());
  }
  return true;
}

double ptol_of(const Engine& e, int j, double tol_p) {
  // ABSOLUTE unscaled feasibility: scale the tolerance by the
  // variable's scaling factor only (never by bound magnitude — a
  // bound-relative tolerance admits points whose unscaled row
  // violation exceeds the MIP's absolute mip_feasibility_tolerance;
  // observed as rejected "incumbents" on bell5's 1e7-rhs rows).
  const double s = e.tolsc.empty() ? 1.0 : e.tolsc[j];
  return tol_p * s;
}

// flip boxed nonbasics to the reduced-cost-consistent bound; returns
// false if a non-boxed variable is dual infeasible (needs primal)
bool restore_dual_feasibility(Engine& e, double tol_d) {
  bool flipped = false;
  for (int j = 0; j < e.nv; ++j) {
    if (e.stat[j] == kBasic) continue;
    if (e.up[j] - e.lo[j] <= 0.0) continue;  // fixed: any sign fine
    const double dj = e.d[j];
    if (e.stat[j] == kLower && dj < -tol_d) {
      if (e.up[j] < kInf) { e.stat[j] = kUpper; flipped = true; }
      else return false;
    } else if (e.stat[j] == kUpper && dj > tol_d) {
      if (e.lo[j] > -kInf) { e.stat[j] = kLower; flipped = true; }
      else return false;
    } else if (e.stat[j] == kZero && std::fabs(dj) > tol_d) {
      // free variable with nonzero reduced cost: dual infeasible
      return false;
    }
  }
  if (flipped) compute_basics(e);
  return true;
}

// The dual simplex main loop.  Assumes factored basis, fresh x_B and d.
int dual_loop(Engine& e, double tol_p, double tol_d, int max_iter,
              double time_limit_s, int* iters_out, double obj_cut) {
  const auto t_start = std::chrono::steady_clock::now();
  auto out_of_time = [&]() {
    if (time_limit_s <= 0.0 || time_limit_s > 1e19) return false;
    const std::chrono::duration<double> el =
        std::chrono::steady_clock::now() - t_start;
    return el.count() > time_limit_s;
  };
  const int m = e.m;
  int iters = 0;
  int verify = 0;
  if ((int)e.dse.size() != m) e.dse.assign(m, 1.0);
  e.rho.resize(m);
  e.tau.resize(m);
  e.acol.resize(m);
  e.arow.assign(e.nv, 0.0);
  e.arow_ix.clear();
  std::vector<int> cand;
  cand.reserve(64);
  struct BP { int j; double ratio; double aabs; int seq; };
  std::vector<BP> bps;
  bps.reserve(64);

  while (true) {
    if (iters >= max_iter) { *iters_out = iters; return kIterLimit; }
    if ((iters & 127) == 0 && out_of_time()) {
      *iters_out = iters;
      return kIterLimit;
    }
    // objective cutoff (MIP bound pruning): stop early once the dual
    // objective proves the node cannot beat the incumbent.  Dual
    // simplex objectives are monotonically nondecreasing, so the
    // current objective is a valid lower bound when primal-feasible
    // intermediate iterates are dual feasible.
    if (obj_cut < kInf && (iters & 15) == 0) {
      double ob = 0.0;
      for (int j = 0; j < e.nv; ++j) ob += e.cost[j] * e.xval[j];
      if (ob > obj_cut) { *iters_out = iters; return kObjCut; }
    }

    // ---- CHUZR: most-infeasible basic scaled by DSE weight ------------
    int rr = -1;
    double best_score = 0.0;
    double delta = 0.0;   // x_jb - violated bound (sign tells direction)
    const double t_chuzr0 = g_clk.on ? clk_now() : 0.0;
    for (int p = 0; p < m; ++p) {
      const int jb = e.basic[p];
      const double v = e.xval[jb];
      const double tj = 10.0 * ptol_of(e, jb, tol_p);
      double infs = 0.0;
      if (v < e.lo[jb] - tj) infs = e.lo[jb] - v;
      else if (v > e.up[jb] + tj) infs = v - e.up[jb];
      if (infs > 0.0) {
        const double sc = infs * infs / std::max(e.dse[p], 1e-10);
        if (sc > best_score) {
          best_score = sc;
          rr = p;
          delta = (v < e.lo[jb]) ? v - e.lo[jb] : v - e.up[jb];
        }
      }
    }
    if (g_clk.on) g_clk.chuzr += clk_now() - t_chuzr0;
    if (rr < 0) {
      // primal feasible: optimality additionally requires dual
      // feasibility of the final point.  Verify both on a fresh
      // factorization — a wrong-sign boxed reduced cost here means
      // the point is feasible-but-suboptimal (flip and keep pivoting;
      // the flip may re-introduce primal infeasibility).
      if (verify++ < 3 && !e.lu.eta_t.empty()) {
        if (!factor(e)) { *iters_out = iters; return kSingular; }
        compute_basics(e);
        compute_duals(e);
        if (!restore_dual_feasibility(e, 10.0 * tol_d)) {
          *iters_out = iters;
          return kNeedPrimal;
        }
        continue;
      }
      if (restore_dual_feasibility(e, 10.0 * tol_d)) {
        bool clean = true;
        for (int p = 0; p < m; ++p) {
          const int jb = e.basic[p];
          const double v = e.xval[jb];
          const double tj = 10.0 * ptol_of(e, jb, tol_p);
          if (v < e.lo[jb] - tj || v > e.up[jb] + tj) { clean = false; break; }
        }
        if (clean) {
          *iters_out = iters;
          return kOptimal;
        }
        if (verify < 24) continue;  // flips broke primal: keep pivoting
        *iters_out = iters;
        return kIterLimit;
      }
      *iters_out = iters;
      return kNeedPrimal;
    }
    const int jl = e.basic[rr];
    const double target = (delta < 0.0) ? e.lo[jl] : e.up[jl];
    const double s = (delta < 0.0) ? -1.0 : 1.0;  // sign of delta

    // ---- BTRAN: rho = B^{-T} e_rr --------------------------------------
    // (wm is clobbered by btran internals; keep a persistent unit
    // scratch - a heap alloc + O(m) memset per iteration otherwise)
    if ((int)e.unitv.size() != m) e.unitv.assign(m, 0.0);
    e.unitv[rr] = 1.0;
    CLK(btran, btran_vec(e, e.unitv.data(), e.rho.data()));
    e.unitv[rr] = 0.0;

    // ---- PRICE: pivot row over nonbasic variables via CSR --------------
    // with a density switch (reference priceByRowWithSwitch role):
    // when rho is dense the per-entry zero-check + index-list pushes
    // cost more than they save — accumulate straight into the dense
    // row and let the consumers sweep all variables instead.
    const double t_price0 = g_clk.on ? clk_now() : 0.0;
    if (e.price_dense)
      std::fill(e.arow.begin(), e.arow.end(), 0.0);
    else
      for (int32_t ix : e.arow_ix) e.arow[ix] = 0.0;
    e.arow_ix.clear();
    int rho_nnz = 0;
    for (int i = 0; i < m; ++i) rho_nnz += (e.rho[i] != 0.0);
    e.price_dense = 4 * rho_nnz > m;
    if (e.price_dense) {
      for (int i = 0; i < m; ++i) {
        const double ri = e.rho[i];
        if (ri == 0.0) continue;
        for (int64_t k = e.Rp[i]; k < e.Rp[i + 1]; ++k)
          e.arow[e.Ri[k]] += ri * e.Rx[k];
        e.arow[e.n + i] -= ri;
      }
    } else {
      for (int i = 0; i < m; ++i) {
        const double ri = e.rho[i];
        if (ri == 0.0) continue;
        for (int64_t k = e.Rp[i]; k < e.Rp[i + 1]; ++k) {
          const int j = e.Ri[k];
          if (e.arow[j] == 0.0) e.arow_ix.push_back(j);
          e.arow[j] += ri * e.Rx[k];
        }
        const int jlog = e.n + i;
        if (e.arow[jlog] == 0.0) e.arow_ix.push_back(jlog);
        e.arow[jlog] -= ri;
      }
    }

    if (g_clk.on) {
      g_clk.price += clk_now() - t_price0;
      for (int i = 0; i < m; ++i) if (e.rho[i] != 0.0) ++g_clk.rho_nnz;
      g_clk.eta_cnt += (int64_t)e.lu.eta_t.size();
    }
    // ---- CHUZC: BFRT + Harris two-pass ---------------------------------
    // candidates F: nonbasic j whose reduced cost would degrade as the
    // dual step grows; ratio |d_j / alpha_j|
    const double t_chuzc0 = g_clk.on ? clk_now() : 0.0;
    bps.clear();
    double flip_slope = std::fabs(delta);  // remaining primal infeas.
    const int n_scan =
        e.price_dense ? e.nv : (int)e.arow_ix.size();
    for (int t_s = 0; t_s < n_scan; ++t_s) {
      const int j = e.price_dense ? t_s : e.arow_ix[t_s];
      if (e.stat[j] == kBasic) continue;
      const double aj = e.arow[j];
      if (std::fabs(aj) < 1e-9) continue;
      const double range = e.up[j] - e.lo[j];
      if (range <= 0.0) continue;  // fixed never enters
      bool in_f = false;
      if (e.stat[j] == kLower) in_f = (s * aj > 0.0);
      else if (e.stat[j] == kUpper) in_f = (s * aj < 0.0);
      else if (e.stat[j] == kZero) in_f = true;
      if (!in_f) continue;
      const double ratio = std::fabs(e.d[j]) / std::fabs(aj);
      bps.push_back(BP{j, ratio, std::fabs(aj), (int)bps.size()});
    }
    if (bps.empty()) {
      // dual unbounded => primal infeasible; verify on fresh factor
      if (verify++ < 2) {
        if (!factor(e)) { *iters_out = iters; return kSingular; }
        compute_basics(e);
        compute_duals(e);
        if (!restore_dual_feasibility(e, 10.0 * tol_d)) {
          *iters_out = iters;
          return kNeedPrimal;
        }
        continue;
      }
      // certificate sanity before declaring infeasible: the violated
      // row must be meaningfully infeasible, and no entering
      // candidate may exist even at a much smaller pivot threshold
      // (a 1e-9 cutoff can hide legitimate tiny pivots on degenerate
      // instances and turn a stall into a false certificate)
      if (std::fabs(delta) < 1e3 * ptol_of(e, jl, tol_p)) {
        *iters_out = iters;
        return kIterLimit;  // phantom infeasibility: inconclusive
      }
      bool tiny_candidate = false;
      for (int t_s = 0; t_s < n_scan; ++t_s) {
        const int j = e.price_dense ? t_s : e.arow_ix[t_s];
        if (e.stat[j] == kBasic) continue;
        const double aj = e.arow[j];
        if (std::fabs(aj) < 1e-12 || std::fabs(aj) >= 1e-9) continue;
        if (e.up[j] - e.lo[j] <= 0.0) continue;
        bool in_f = false;
        if (e.stat[j] == kLower) in_f = (s * aj > 0.0);
        else if (e.stat[j] == kUpper) in_f = (s * aj < 0.0);
        else if (e.stat[j] == kZero) in_f = true;
        if (in_f) { tiny_candidate = true; break; }
      }
      *iters_out = iters;
      return tiny_candidate ? kIterLimit : kInfeasible;
    }
    // min-heap on ratio: the BFRT walk consumes breakpoints in ratio
    // order but typically stops after a handful of flips, so a heap
    // (O(k + t log k)) replaces the former full sort (O(k log k))
    static const bool chuzc_arb =
        getenv("HX_CHUZC_ARBITRARY_TIES") != nullptr;
    auto bp_gt = [](const BP& a, const BP& b) {
      // tie-break on insertion order: keeps entering-variable choice
      // identical to the former stable sort on degenerate ties (ties
      // are common; arbitrary heap order was enough to reshape whole
      // MIP trees)
      if (a.ratio != b.ratio) return a.ratio > b.ratio;
      return chuzc_arb ? false : a.seq > b.seq;
    };
    std::make_heap(bps.begin(), bps.end(), bp_gt);

    // BFRT walk: flip boxed breakpoints while the leaving variable
    // remains infeasible after accounting for their flips
    int q = -1;
    double q_ratio = 0.0, q_aabs = 0.0;
    std::vector<int> flips;
    size_t heap_sz = bps.size();
    while (heap_sz > 0) {
      const BP top = bps.front();
      const int j = top.j;
      const double range = e.up[j] - e.lo[j];
      const double consumed = std::fabs(e.arow[j]) * range;
      const bool boxed = (e.lo[j] > -kInf) && (e.up[j] < kInf) &&
                         e.stat[j] != kZero;
      if (boxed && flip_slope - consumed > 10.0 * ptol_of(e, jl, tol_p)
          && heap_sz > 1) {
        flip_slope -= consumed;
        flips.push_back(j);
        std::pop_heap(bps.begin(), bps.begin() + heap_sz, bp_gt);
        --heap_sz;
        continue;
      }
      q = j;
      q_ratio = top.ratio;
      q_aabs = top.aabs;
      std::pop_heap(bps.begin(), bps.begin() + heap_sz, bp_gt);
      --heap_sz;
      break;
    }
    if (q < 0) {
      const BP top = bps.front();
      q = top.j; q_ratio = top.ratio; q_aabs = top.aabs;
      heap_sz = 0;
    }
    // Harris pass 2 inside the tolerance window: among breakpoints with
    // ratio <= ratio_sel + reltol, take the largest |alpha| (stability)
    {
      const double win = q_ratio + tol_d / std::max(q_aabs, 1e-4);
      double best_a = q_aabs;
      while (heap_sz > 0 && bps.front().ratio <= win) {
        if (bps.front().aabs > best_a) {
          best_a = bps.front().aabs;
          q = bps.front().j;
        }
        std::pop_heap(bps.begin(), bps.begin() + heap_sz, bp_gt);
        --heap_sz;
      }
    }
    if (g_clk.on) g_clk.chuzc += clk_now() - t_chuzc0;
    const double apq_row = e.arow[q];
    if (std::fabs(apq_row) < 1e-9) {
      if (!factor(e)) { *iters_out = iters; return kSingular; }
      compute_basics(e);
      compute_duals(e);
      if (++verify > 6) { *iters_out = iters; return kSingular; }
      continue;
    }

    // ---- dual update from the priced row (incremental d) ---------------
    const double theta_d = e.d[q] / apq_row;
    if (e.price_dense) {
      for (int j = 0; j < e.nv; ++j) {
        if (e.stat[j] == kBasic || j == q) continue;
        e.d[j] -= theta_d * e.arow[j];
      }
    } else {
      for (int32_t j : e.arow_ix) {
        if (e.stat[j] == kBasic || j == q) continue;
        e.d[j] -= theta_d * e.arow[j];
      }
    }
    e.d[jl] = -theta_d;
    e.d[q] = 0.0;

    if (g_clk.on) {
      g_clk.flips += (int64_t)flips.size();
      if (std::fabs(theta_d) < 1e-12) ++g_clk.degen;
    }
    // ---- apply the accumulated bound flips (one aggregated FTRAN) ------
    if (!flips.empty()) {
      e.fvec.assign(m, 0.0);
      for (int j : flips) {
        const double dx = (e.stat[j] == kLower) ? (e.up[j] - e.lo[j])
                                                : (e.lo[j] - e.up[j]);
        e.stat[j] = (e.stat[j] == kLower) ? kUpper : kLower;
        e.xval[j] += dx;
        e.axpy_col(j, dx, e.fvec.data());
      }
      e.dxb.resize(m);
      ftran_vec(e, e.fvec.data(), e.dxb.data());
      for (int p = 0; p < m; ++p) e.xval[e.basic[p]] -= e.dxb[p];
    }

    // ---- FTRAN entering column (captures the FT spike) -----------------
    e.spike.resize(m);
    CLK(ftran, ftran_col_spike(e, q, e.acol.data(), e.spike.data()));
    if (g_clk.on)
      for (int p2 = 0; p2 < m; ++p2)
        if (e.acol[p2] != 0.0) ++g_clk.acol_nnz;
    const double apq = e.acol[rr];
    if (std::fabs(apq) < 1e-9 ||
        std::fabs(apq - apq_row) >
            1e-5 * std::max(1.0, std::fabs(apq))) {
      // row/column pivot disagreement: numerical drift — refresh
      if (!factor(e)) { *iters_out = iters; return kSingular; }
      compute_basics(e);
      compute_duals(e);
      if (!restore_dual_feasibility(e, 10.0 * tol_d)) {
        *iters_out = iters;
        return kNeedPrimal;
      }
      if (++verify > 6) { *iters_out = iters; return kSingular; }
      continue;
    }

    // ---- DSE weight update (Forrest–Goldfarb; HEkkDual parity) ---------
    // tau = B^{-1} rho
    {
      const double t_dse0 = g_clk.on ? clk_now() : 0.0;
      e.rho_copy = e.rho;
      ftran_vec(e, e.rho_copy.data(), e.tau.data());
      if (g_clk.on) g_clk.dse += clk_now() - t_dse0;
    }
    const double w_r = std::max(e.dse[rr], 1e-10);
    const double new_w_enter = w_r / (apq * apq);
    for (int p = 0; p < m; ++p) {
      if (p == rr) continue;
      const double ap = e.acol[p];
      if (ap == 0.0) continue;
      const double g = ap / apq;
      double w = e.dse[p] - 2.0 * g * e.tau[p] + g * g * w_r;
      e.dse[p] = std::max(w, 1e-4 * (g * g * w_r));
    }
    e.dse[rr] = std::max(new_w_enter, 1e-10);

    // ---- primal step -----------------------------------------------------
    const double delta_now = e.xval[jl] - target;  // after flips
    const double theta_p = delta_now / apq;
    const double t_pr0 = g_clk.on ? clk_now() : 0.0;
    for (int p = 0; p < m; ++p) e.xval[e.basic[p]] -= theta_p * e.acol[p];
    if (g_clk.on) g_clk.primal += clk_now() - t_pr0;
    const double xq_new = e.xval[q] + theta_p;
    // leaving goes to its violated bound; entering becomes basic
    e.stat[jl] = (target == e.lo[jl] && e.lo[jl] > -kInf) ? kLower : kUpper;
    e.xval[jl] = target;
    e.posof[jl] = -1;
    e.stat[q] = kBasic;
    e.basic[rr] = q;
    e.posof[q] = rr;
    e.xval[q] = xq_new;
    ++iters;
    ++e.iters_total;
    ++g_clk.iters;

    // ---- factorization update -------------------------------------------
    // Adaptive reinversion on ETA MASS, not a fixed pivot count: the
    // product-form chain's solve cost is its stored nonzeros, so
    // refactor as soon as applying the chain costs more than ~2 fresh
    // LU solves (reference HFactor avoids the growth altogether with
    // Forrest-Tomlin updates; the mass rule gets most of that win).
    const int64_t lu_nnz =
        (int64_t)e.lu.Lrow.size() + e.lu.u_nnz + e.m;
    static const char* env_em = getenv("HX_ETA_MASS");
    static const double eta_mass_f = env_em ? atof(env_em) : 1.0;
    if (std::fabs(apq) < 1e-7 || ++e.since_refactor >= 100 ||
        e.lu.eta_nnz > (int64_t)(eta_mass_f *
                        std::max<int64_t>(lu_nnz, 2LL * e.m))) {
      const double t_f0 = g_clk.on ? clk_now() : 0.0;
      if (!factor(e)) { *iters_out = iters; return kSingular; }
      compute_basics(e);
      compute_duals(e);
      if (g_clk.on) { g_clk.factor += clk_now() - t_f0; ++g_clk.factors; }
      if (!restore_dual_feasibility(e, 10.0 * tol_d)) {
        *iters_out = iters;
        return kNeedPrimal;
      }
    } else if (!ft_update(e, rr, e.spike.data())) {
      // FT pivot unsafe: fall back to a fresh factorization
      if (!factor(e)) { *iters_out = iters; return kSingular; }
      compute_basics(e);
      compute_duals(e);
      if (!restore_dual_feasibility(e, 10.0 * tol_d)) {
        *iters_out = iters;
        return kNeedPrimal;
      }
    }
    if ((iters & 511) == 0) verify = 0;  // allow later re-verification
  }
}

// initialize basis from a status vector (or all-logical)
void set_basis_from(Engine& e, const int8_t* basis_in) {
  e.stat.assign(e.nv, kLower);
  e.basic.assign(e.m, 0);
  e.posof.assign(e.nv, -1);
  int n_basic = 0;
  if (basis_in) {
    for (int j = 0; j < e.nv; ++j) {
      e.stat[j] = basis_in[j];
      if (e.stat[j] == kBasic) {
        if (n_basic < e.m) {
          e.basic[n_basic] = j;
          e.posof[j] = n_basic;
          ++n_basic;
        } else {
          e.stat[j] = kLower;
        }
      }
      if (e.stat[j] == kLower && e.lo[j] <= -kInf)
        e.stat[j] = (e.up[j] < kInf) ? kUpper : kZero;
      else if (e.stat[j] == kUpper && e.up[j] >= kInf)
        e.stat[j] = (e.lo[j] > -kInf) ? kLower : kZero;
    }
    for (int i = 0; i < e.m && n_basic < e.m; ++i) {
      if (e.stat[e.n + i] != kBasic) {
        e.stat[e.n + i] = kBasic;
        e.basic[n_basic] = e.n + i;
        e.posof[e.n + i] = n_basic;
        ++n_basic;
      }
    }
  }
  if (!basis_in || n_basic != e.m) {
    for (int j = 0; j < e.nv; ++j) {
      bool lo_fin = e.lo[j] > -kInf;
      bool up_fin = e.up[j] < kInf;
      e.stat[j] = lo_fin ? kLower : (up_fin ? kUpper : kZero);
      e.posof[j] = -1;
    }
    for (int i = 0; i < e.m; ++i) {
      e.stat[e.n + i] = kBasic;
      e.basic[i] = e.n + i;
      e.posof[e.n + i] = i;
    }
  }
  e.factored = false;
  e.d_valid = false;
  e.dse.assign(e.m, 1.0);
}

// clamp nonbasic statuses to the current bounds (after bound changes)
void sanitize_nonbasic(Engine& e) {
  for (int j = 0; j < e.nv; ++j) {
    if (e.stat[j] == kBasic) continue;
    if (e.stat[j] == kLower && e.lo[j] <= -kInf)
      e.stat[j] = (e.up[j] < kInf) ? kUpper : kZero;
    else if (e.stat[j] == kUpper && e.up[j] >= kInf)
      e.stat[j] = (e.lo[j] > -kInf) ? kLower : kZero;
  }
}

int engine_solve(Engine& e, double tol_p, double tol_d, int max_iter,
                 double time_limit_s, int* iters_out, double obj_cut) {
  if (!e.factored) {
    if (!factor(e)) { *iters_out = 0; return kSingular; }
    e.d_valid = false;
  }
  compute_basics(e);
  if (!e.d_valid) compute_duals(e);
  if (!restore_dual_feasibility(e, 10.0 * tol_d)) {
    *iters_out = 0;
    e.d_valid = true;  // d matches the (unchanged) basis
    return kNeedPrimal;
  }
  const int res = dual_loop(e, tol_p, tol_d, max_iter, time_limit_s,
                            iters_out, obj_cut);
  // the loop maintains d incrementally for the current basis (exact
  // recompute at every refactor); singular exits lose that invariant
  e.d_valid = res != kSingular;
  return res;
}

// Dual phase-1 by temporary boxing (Koberstein's subproblem approach):
// when a start basis is dual infeasible in an unbounded direction
// (kNeedPrimal), give every missing bound an artificial value so bound
// flips can restore dual feasibility, solve the boxed LP, then restore
// the true bounds and re-optimize from the now dual-feasible basis.
// Grows the artificial bound when it turns out binding.
long long g_phase1_count = 0;

int engine_solve_phase1(Engine& e, double tol_p, double tol_d,
                        int max_iter, double time_limit_s,
                        int* iters_out, double obj_cut) {
  int it1 = 0;
  int res = engine_solve(e, tol_p, tol_d, max_iter, time_limit_s, &it1,
                         obj_cut);
  *iters_out = it1;
  if (res != kNeedPrimal) return res;
  ++g_phase1_count;
  std::vector<double> lo_save(e.lo), up_save(e.up);
  double bigM = 1e7;
  for (int attempt = 0; attempt < 4 && res == kNeedPrimal;
       ++attempt, bigM *= 100.0) {
    for (int j = 0; j < e.nv; ++j) {
      e.lo[j] = lo_save[j] <= -kInf
                    ? (up_save[j] < kInf ? up_save[j] : 0.0) - bigM
                    : lo_save[j];
      e.up[j] = up_save[j] >= kInf
                    ? (lo_save[j] > -kInf ? lo_save[j] : 0.0) + bigM
                    : up_save[j];
    }
    for (int j = 0; j < e.nv; ++j)
      if (e.stat[j] == kZero) e.stat[j] = kLower;
    // no objective cutoff on the boxed problem: its optimum upper-
    // bounds the true one, so pruning on it would be invalid
    int it2 = 0;
    res = engine_solve(e, tol_p, tol_d, max_iter, time_limit_s, &it2,
                       kInf);
    *iters_out += it2;
    if (res == kOptimal) {
      for (int j = 0; j < e.nv; ++j) {
        const bool at_art_lo =
            lo_save[j] <= -kInf && e.xval[j] <= e.lo[j] + 1e-5 * bigM &&
            e.stat[j] != kBasic;
        const bool at_art_up =
            up_save[j] >= kInf && e.xval[j] >= e.up[j] - 1e-5 * bigM &&
            e.stat[j] != kBasic;
        if (at_art_lo || at_art_up) { res = kNeedPrimal; break; }
      }
    }
  }
  for (int j = 0; j < e.nv; ++j) { e.lo[j] = lo_save[j]; e.up[j] = up_save[j]; }
  sanitize_nonbasic(e);
  if (res != kOptimal) return res == kNeedPrimal ? kNeedPrimal : res;
  // final solve on the true bounds from the dual-feasible basis
  int it3 = 0;
  res = engine_solve(e, tol_p, tol_d, max_iter, time_limit_s, &it3,
                     obj_cut);
  *iters_out += it3;
  return res;
}

// Stall escalation: a solve that burns an abnormal iteration budget
// without concluding is almost always cycling on dual-degenerate ties.
// The reference dual simplex perturbs costs up front (HEkkDual cost
// perturbation) and removes them at the end; here the perturbation is
// applied lazily — only after a plain solve has demonstrably stalled —
// so hot MIP node re-solves (tens of pivots) stay exact and pay
// nothing.
int engine_solve_escalated(Engine& e, double tol_p, double tol_d,
                           int max_iter, double time_limit_s,
                           int* iters_out, double obj_cut) {
  const int cap =
      (int)std::min<int64_t>(max_iter, 2000 + 8LL * (int64_t)e.m);
  const auto t0 = std::chrono::steady_clock::now();
  auto time_left = [&]() {
    if (time_limit_s <= 0.0 || time_limit_s > 1e19) return true;
    const std::chrono::duration<double> el =
        std::chrono::steady_clock::now() - t0;
    return el.count() < time_limit_s - 1e-3;
  };
  int it1 = 0;
  int res = engine_solve_phase1(e, tol_p, tol_d, cap, time_limit_s,
                                &it1, obj_cut);
  *iters_out = it1;
  // kIterLimit covers both a burned budget and the loop's internal
  // stall verdicts (phantom infeasibility, verify loops) — all are
  // dual-degenerate cycling symptoms worth one perturbed retry.  A
  // kIterLimit caused by the TIME limit is not.
  if (res != kIterLimit || !time_left()) return res;
  std::vector<double> c_save(e.cost);
  uint64_t rs = 0x2545F4914F6CDD1DULL;
  for (int j = 0; j < e.nv; ++j) {
    rs ^= rs << 13; rs ^= rs >> 7; rs ^= rs << 17;
    const double r01 = (double)(rs & 0xffffff) / (double)0x1000000;
    const double mag =
        1e-7 * (std::fabs(e.cost[j]) + 1e-3) * (0.5 + r01);
    if (e.stat[j] == kLower) e.cost[j] += mag;
    else if (e.stat[j] == kUpper) e.cost[j] -= mag;
  }
  e.d_valid = false;
  int it2 = 0;
  // no objective cutoff while perturbed: the perturbed objective is
  // not the true one, so pruning on it would be invalid.  The retry
  // budget stays capped — a node re-solve must never burn a 100k
  // iteration budget on escalation alone.
  res = engine_solve_phase1(e, tol_p, tol_d, 2 * cap, time_limit_s,
                            &it2, kInf);
  *iters_out += it2;
  e.cost = c_save;
  e.d_valid = false;
  if (res != kOptimal && res != kInfeasible && res != kIterLimit)
    return res;
  // the clean re-entry gets the REMAINING user budget, not the stall
  // cap again: a hard-but-not-cycling LP with a large caller budget
  // must be allowed to finish after paying one escalation cycle
  const int left =
      (int)std::max<int64_t>((int64_t)cap,
                             (int64_t)max_iter - (int64_t)*iters_out);
  int it3 = 0;
  res = engine_solve_phase1(e, tol_p, tol_d, left, time_limit_s, &it3,
                            obj_cut);
  *iters_out += it3;
  return res;
}

void export_solution(const Engine& e, double* x_out, double* y_out,
                     double* z_out, int8_t* basis_out) {
  // final duals from the maintained d (refreshed at refactors)
  Engine& me = const_cast<Engine&>(e);
  std::vector<double> cb(e.m);
  for (int p = 0; p < e.m; ++p) cb[p] = e.cost[e.basic[p]];
  std::vector<double> y(e.m);
  btran_vec(me, cb.data(), y.data());
  for (int j = 0; j < e.n; ++j) {
    x_out[j] = e.xval[j];
    z_out[j] = (e.stat[j] == kBasic)
                   ? 0.0
                   : e.cost[j] - e.dot_col(j, y.data());
  }
  for (int i = 0; i < e.m; ++i) {
    const int j = e.n + i;
    y_out[i] = (e.stat[j] == kBasic) ? 0.0 : -e.dot_col(j, y.data());
  }
  if (basis_out)
    for (int j = 0; j < e.nv; ++j) basis_out[j] = e.stat[j];
}

Engine* build_engine(int m, int n, const int64_t* Ap, const int32_t* Ai,
                     const double* Ax, const int64_t* Rp,
                     const int32_t* Ri, const double* Rx,
                     const double* cost, const double* col_lo,
                     const double* col_up, const double* row_lo,
                     const double* row_up) {
  Engine* e = new Engine();
  e->m = m;
  e->n = n;
  e->nv = n + m;
  e->Ap.assign(Ap, Ap + n + 1);
  e->Ai.assign(Ai, Ai + Ap[n]);
  e->Ax.assign(Ax, Ax + Ap[n]);
  e->Rp.assign(Rp, Rp + m + 1);
  e->Ri.assign(Ri, Ri + Rp[m]);
  e->Rx.assign(Rx, Rx + Rp[m]);
  e->cost.assign(e->nv, 0.0);
  e->lo.resize(e->nv);
  e->up.resize(e->nv);
  for (int j = 0; j < n; ++j) {
    e->cost[j] = cost[j];
    e->lo[j] = col_lo[j] <= -kInf ? -kInf : col_lo[j];
    e->up[j] = col_up[j] >= kInf ? kInf : col_up[j];
  }
  for (int i = 0; i < m; ++i) {
    e->lo[n + i] = row_lo[i] <= -kInf ? -kInf : row_lo[i];
    e->up[n + i] = row_up[i] >= kInf ? kInf : row_up[i];
  }
  e->xval.assign(e->nv, 0.0);
  e->d.assign(e->nv, 0.0);
  return e;
}

// engine state snapshot for strong-branching probes: restoring a saved
// state (including the LU by value) is a memcpy, not a refactorization
struct EngineState {
  std::vector<int8_t> stat;
  std::vector<int32_t> basic, posof;
  std::vector<double> xval, d, dse, lo, up;
  LU lu;
  int since_refactor;
  bool factored;
};

void save_state(const Engine& e, EngineState& s) {
  s.stat = e.stat;
  s.basic = e.basic;
  s.posof = e.posof;
  s.xval = e.xval;
  s.d = e.d;
  s.dse = e.dse;
  s.lo = e.lo;
  s.up = e.up;
  s.lu = e.lu;
  s.since_refactor = e.since_refactor;
  s.factored = e.factored;
}

void restore_state(Engine& e, const EngineState& s) {
  e.stat = s.stat;
  e.basic = s.basic;
  e.posof = s.posof;
  e.xval = s.xval;
  e.d = s.d;
  e.dse = s.dse;
  e.lo = s.lo;
  e.up = s.up;
  e.lu = s.lu;
  e.since_refactor = s.since_refactor;
  e.factored = s.factored;
  e.d_valid = s.factored;  // snapshot's d matches its basis
}

// ---------------------------------------------------------------------------
// Propagation-based conflict analysis (role of the reference's
// HighsDomain reason/conflict stack + HighsConflictPool,
// highs/mip/HighsDomain.cpp, HighsConflictPool.cpp).
//
// Every bound tightened by a row records that row as its REASON.  When
// propagation hits an infeasible row, the bounds contributing to the
// violated activity side are resolved backwards — a propagated bound
// expands into the bounds of its reason row, a clause-derived bound
// expands into the falsified literals of its clause — until only
// branch decisions on BINARY variables remain.  Those decisions form a
// no-good clause ("not all of these fixings together"), stored in a
// pool and unit-propagated at every node.
struct ConflictPool {
  std::vector<int32_t> start{0};
  std::vector<int32_t> col;
  std::vector<int8_t> sgn;  // 1: satisfied by x=1, 0: satisfied by x=0
  int num() const { return (int)start.size() - 1; }
  void add(const std::vector<std::pair<int32_t, int8_t>>& lits) {
    for (auto& l : lits) { col.push_back(l.first); sgn.push_back(l.second); }
    start.push_back((int32_t)col.size());
  }
};

struct CflCtx {
  const double* root_lo = nullptr;  // global bounds (col space, size n)
  const double* root_up = nullptr;
  ConflictPool* pool = nullptr;
  std::vector<int32_t> reason_lo, reason_up;  // per col: row >=0,
                                              // -1 decision/root,
                                              // -(2+c) clause c
  std::vector<std::pair<int32_t, int8_t>> out;  // derived clause
  bool have_out = false;
};

enum CflSide : int8_t { kSideLo = 0, kSideUp = 1 };

// resolve the contributing bounds of (row i, violated side) to binary
// decision literals; fills ctx.out / ctx.have_out
void cfl_analyze(const Engine& e, CflCtx& ctx, const int8_t* is_int,
                 const double* lo, const double* up, int bad_row,
                 bool min_side) {
  ctx.have_out = false;
  ctx.out.clear();
  const int n = e.n;
  std::vector<std::pair<int32_t, int8_t>> work;  // (col, side)
  std::vector<int8_t> seen_lo(n, 0), seen_up(n, 0);
  auto push = [&](int j, int8_t side) {
    if (side == kSideLo) {
      if (seen_lo[j]) return;
      seen_lo[j] = 1;
    } else {
      if (seen_up[j]) return;
      seen_up[j] = 1;
    }
    work.push_back({(int32_t)j, side});
  };
  // seed: bounds contributing to the violated activity bound of bad_row.
  // min-activity violated uses lo for a>0 / up for a<0; max-activity
  // the opposite.
  for (int64_t k = e.Rp[bad_row]; k < e.Rp[bad_row + 1]; ++k) {
    const int j = e.Ri[k];
    const bool pos = e.Rx[k] > 0;
    push(j, (min_side == pos) ? kSideLo : kSideUp);
  }
  std::vector<std::pair<int32_t, int8_t>> lits;
  int expansions = 0;
  while (!work.empty()) {
    if (++expansions > 512 || (int)lits.size() > 48) return;  // too big
    auto [j, side] = work.back();
    work.pop_back();
    const double rl0 = ctx.root_lo[j], ru0 = ctx.root_up[j];
    // a bound still at its global value is universally true: no literal
    if (side == kSideLo && lo[j] <= rl0 + 1e-12) continue;
    if (side == kSideUp && up[j] >= ru0 - 1e-12) continue;
    const int32_t r = (side == kSideLo) ? ctx.reason_lo[j]
                                        : ctx.reason_up[j];
    if (r >= 0) {
      // propagated by row r: expand into that row's contributing
      // bounds (all other columns, plus the row side that was used)
      // lower-bound tightening of j by row r used: min-activity others
      // (res) when r's UPPER bound active, etc.  Conservatively expand
      // BOTH sides' contributors of the row except j itself.
      for (int64_t k = e.Rp[r]; k < e.Rp[r + 1]; ++k) {
        const int jj = e.Ri[k];
        if (jj == j) continue;
        const bool pos = e.Rx[k] > 0;
        // contributing bound for residual activity on either side
        push(jj, pos ? kSideLo : kSideUp);
        push(jj, pos ? kSideUp : kSideLo);
      }
      continue;
    }
    if (r <= -2) {
      // fixed by clause c: expand into the clause's other literals'
      // falsifying bounds
      const int c = -(r + 2);
      for (int32_t k = ctx.pool->start[c]; k < ctx.pool->start[c + 1];
           ++k) {
        const int jj = ctx.pool->col[k];
        if (jj == j) continue;
        // literal falsified means: sgn=1 -> x=0 (up bound), sgn=0 ->
        // x=1 (lo bound)
        push(jj, ctx.pool->sgn[k] ? kSideUp : kSideLo);
      }
      continue;
    }
    // decision literal: only binaries make a clause
    if (!is_int[j] || ctx.root_lo[j] < -0.5 || ctx.root_up[j] > 1.5)
      return;
    if (side == kSideLo && lo[j] >= 0.5) {
      lits.push_back({(int32_t)j, (int8_t)0});  // relax: x_j = 0
    } else if (side == kSideUp && up[j] <= 0.5) {
      lits.push_back({(int32_t)j, (int8_t)1});  // relax: x_j = 1
    } else {
      return;  // non-binary-valued decision bound
    }
  }
  if (lits.empty()) return;  // globally infeasible would be caught at root
  ctx.out = std::move(lits);
  ctx.have_out = true;
}

// unit-propagate the clause pool; returns false on an all-falsified
// clause (ctx records nothing for it — the clause itself is the
// conflict).  fixes record the clause as their reason.
bool cfl_propagate(CflCtx& ctx, const int8_t* is_int, double* lo,
                   double* up, bool* changed) {
  ConflictPool& P = *ctx.pool;
  for (int c = 0; c < P.num(); ++c) {
    int undecided = -1;
    int n_false = 0;
    const int len = P.start[c + 1] - P.start[c];
    bool sat = false;
    for (int32_t k = P.start[c]; k < P.start[c + 1]; ++k) {
      const int j = P.col[k];
      if (P.sgn[k]) {
        if (lo[j] >= 0.5) { sat = true; break; }
        if (up[j] <= 0.5) ++n_false; else undecided = k;
      } else {
        if (up[j] <= 0.5) { sat = true; break; }
        if (lo[j] >= 0.5) ++n_false; else undecided = k;
      }
    }
    if (sat) continue;
    if (n_false == len) return false;  // conflict
    if (n_false == len - 1 && undecided >= 0) {
      const int j = P.col[undecided];
      if (P.sgn[undecided]) {
        lo[j] = 1.0;
        if (!ctx.reason_lo.empty()) ctx.reason_lo[j] = -(2 + c);
      } else {
        up[j] = 0.0;
        if (!ctx.reason_up.empty()) ctx.reason_up[j] = -(2 + c);
      }
      if (lo[j] > up[j] + 1e-9) return false;
      *changed = true;
    }
  }
  return true;
}

// worklist-free activity-bound propagation over the rows (role of
// HighsDomain::propagate, highs/mip/HighsDomain.cpp; simple full
// rounds — the node problems here are small and the rounds vectorize
// over the CSR arrays).  Tightens lo/up in place; false = infeasible.
bool node_propagate(const Engine& e, const double* row_lo,
                    const double* row_up, const int8_t* is_int,
                    double feastol, int max_rounds, double* lo,
                    double* up, CflCtx* cfl = nullptr) {
  if (cfl) {
    cfl->reason_lo.assign(e.n, -1);
    cfl->reason_up.assign(e.n, -1);
    cfl->have_out = false;
  }
  const int m = e.m, n = e.n;
  for (int round = 0; round < max_rounds; ++round) {
    bool changed = false;
    for (int i = 0; i < m; ++i) {
      const double rl = row_lo[i], ru = row_up[i];
      if (rl <= -kInf && ru >= kInf) continue;
      // activity bounds
      double amin = 0.0, amax = 0.0;
      int ninf_min = 0, ninf_max = 0;
      for (int64_t k = e.Rp[i]; k < e.Rp[i + 1]; ++k) {
        const int j = e.Ri[k];
        const double a = e.Rx[k];
        const double l = lo[j], u = up[j];
        if (a > 0) {
          if (l <= -kInf) ++ninf_min; else amin += a * l;
          if (u >= kInf) ++ninf_max; else amax += a * u;
        } else {
          if (u >= kInf) ++ninf_min; else amin += a * u;
          if (l <= -kInf) ++ninf_max; else amax += a * l;
        }
      }
      const double row_scale =
          1.0 + std::max(std::fabs(amin), std::fabs(amax));
      if (ninf_max == 0 && rl > -kInf &&
          amax < rl - feastol * row_scale) {
        if (cfl) cfl_analyze(e, *cfl, is_int, lo, up, i, false);
        return false;
      }
      if (ninf_min == 0 && ru < kInf &&
          amin > ru + feastol * row_scale) {
        if (cfl) cfl_analyze(e, *cfl, is_int, lo, up, i, true);
        return false;
      }
      // tighten each variable from the residual activity
      for (int64_t k = e.Rp[i]; k < e.Rp[i + 1]; ++k) {
        const int j = e.Ri[k];
        const double a = e.Rx[k];
        const double l = lo[j], u = up[j];
        // residual min activity without j
        if (ru < kInf && ninf_min == 0) {
          const double res = amin - (a > 0 ? a * l : a * u);
          double nb = (ru - res) / a;
          if (a > 0) {
            if (is_int[j]) nb = std::floor(nb + feastol);
            if (nb < u - std::max(feastol, 1e-9 * std::fabs(u))) {
              up[j] = nb;
              if (cfl) cfl->reason_up[j] = i;
              if (up[j] < lo[j] - feastol) return false;
              changed = true;
            }
          } else {
            if (is_int[j]) nb = std::ceil(nb - feastol);
            if (nb > l + std::max(feastol, 1e-9 * std::fabs(l))) {
              lo[j] = nb;
              if (cfl) cfl->reason_lo[j] = i;
              if (lo[j] > up[j] + feastol) return false;
              changed = true;
            }
          }
        }
        if (rl > -kInf && ninf_max == 0) {
          const double res = amax - (a > 0 ? a * u : a * l);
          double nb = (rl - res) / a;
          if (a > 0) {
            if (is_int[j]) nb = std::ceil(nb - feastol);
            if (nb > l + std::max(feastol, 1e-9 * std::fabs(l))) {
              lo[j] = nb;
              if (cfl) cfl->reason_lo[j] = i;
              if (lo[j] > up[j] + feastol) return false;
              changed = true;
            }
          } else {
            if (is_int[j]) nb = std::floor(nb + feastol);
            if (nb < u - std::max(feastol, 1e-9 * std::fabs(u))) {
              up[j] = nb;
              if (cfl) cfl->reason_up[j] = i;
              if (up[j] < lo[j] - feastol) return false;
              changed = true;
            }
          }
        }
      }
      // NOTE: amin/amax intentionally not updated within the row pass;
      // the next round recomputes them (keeps the pass branch-light)
    }
    if (cfl && cfl->pool && cfl->pool->num()) {
      if (!cfl_propagate(*cfl, is_int, lo, up, &changed)) return false;
    }
    if (!changed) break;
  }
  return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// NATIVE ROOT CUT LOOP (hx_root_cuts)
//
// The role of the reference's evaluateRootNode separation rounds
// (highs/mip/HighsMipSolverData.cpp:1987-2143 + HighsSeparation.cpp:43-160)
// run entirely in native code: per round it solves the relaxation with the
// persistent dual engine above, separates tableau-MIR aggregates (from the
// engine's OWN basis factorization — HighsTableauSeparator.cpp role),
// single-row c-MIR (HighsCutGeneration role) and path-aggregation c-MIR
// (HighsPathSeparator role, via hx_path_mir from hcuts.cpp, linked into
// this library), postprocesses + dedups + diversity-filters the cuts, ages
// slack cut rows out of the LP, and applies the reference's tailing-off
// rules.  The Python orchestration keeps only the exotic separators
// (cliques, mixing, network cut-sets, mod-k) for the rounds after this
// loop plateaus — the ~100ms/round Python glue was the dominant cost of
// small-MIP solves.
// ---------------------------------------------------------------------------

// from hcuts.cpp (compiled into this shared library):
extern "C" int hx_mir_on_leq(
    int nnz, const int64_t* cols, const double* vals, double rhs,
    const double* x, const double* lo, const double* up,
    const int8_t* is_int, double feastol, int prefer_vbds,
    int64_t n_vb, const int64_t* vb_ptr, const int32_t* vb_y,
    const double* vb_c1, const double* vb_c0, const uint8_t* vb_isub,
    int out_cap, int64_t* out_cols, double* out_vals, double* out_rhs,
    double* out_eff);
extern "C" double hx_integral_scale(const double* values, int n,
                                    double deltadown, double deltaup,
                                    long long max_denom,
                                    double max_scale);
extern "C" int hx_path_mir(
    int m, int n, const int64_t* rp, const int32_t* ri, const double* rx,
    const double* row_lower, const double* row_upper, const double* lo,
    const double* up, const double* x, const int8_t* is_int,
    double feastol, int max_path, int max_starts, uint64_t seed,
    double time_budget_s, int64_t n_vb, const int64_t* vb_ptr,
    const int32_t* vb_y, const double* vb_c1, const double* vb_c0,
    const uint8_t* vb_isub, int max_cuts, int64_t nnz_cap,
    int64_t* out_indptr, int64_t* out_cols, double* out_vals,
    double* out_rhs, double* out_eff);

#include <algorithm>
#include <array>
#include <memory>
#include <unordered_set>

namespace {

struct RCut {
  std::vector<int64_t> cols;  // structural space, sorted ascending
  std::vector<double> vals;
  double rhs = 0.0;
  double eff = 0.0;
  uint64_t key = 0;
};

// content key over the normalized cut (mirror of cuts.Cut.key():
// quantized (cols, vals/||v||, rhs/||v||))
uint64_t rc_key(const std::vector<int64_t>& cols,
                const std::vector<double>& vals, double rhs) {
  double sq = 0.0;
  for (double v : vals) sq += v * v;
  double nrm = std::sqrt(sq);
  if (nrm <= 0.0) nrm = 1.0;
  uint64_t h = 1469598103934665603ULL;
  auto mix = [&h](uint64_t v) {
    h ^= v;
    h *= 1099511628211ULL;
    h ^= h >> 29;
  };
  for (size_t k = 0; k < cols.size(); ++k) {
    mix((uint64_t)cols[k]);
    mix((uint64_t)(int64_t)llround(vals[k] / nrm * 1e9));
  }
  mix((uint64_t)(int64_t)llround(rhs / nrm * 1e9));
  return h;
}

// numerical hygiene shared by all native separators (mirror of
// cuts._clean_cut / reference HighsCutGeneration::postprocessCut):
// drop tiny coefficients via the worst-case bound, reject huge
// dynamism, scale to integral coefficients when a small rational
// scale exists, else normalize to unit max coefficient.
bool rc_clean(std::vector<int64_t>& cols, std::vector<double>& vals,
              double& rhs, const double* lo, const double* up) {
  size_t w = 0;
  for (size_t k = 0; k < cols.size(); ++k)
    if (std::fabs(vals[k]) > 1e-12) {
      cols[w] = cols[k];
      vals[w] = vals[k];
      ++w;
    }
  cols.resize(w);
  vals.resize(w);
  if (cols.empty()) return false;
  double amax = 0.0;
  for (double v : vals) amax = std::max(amax, std::fabs(v));
  bool any_small = false;
  for (double v : vals)
    if (std::fabs(v) < 1e-9 * std::max(1.0, amax)) {
      any_small = true;
      break;
    }
  if (any_small) {
    w = 0;
    for (size_t k = 0; k < cols.size(); ++k) {
      const double a = vals[k];
      if (std::fabs(a) < 1e-9 * std::max(1.0, amax)) {
        const double b = a > 0 ? lo[cols[k]] : up[cols[k]];
        if (std::fabs(b) >= kInf) return false;
        rhs -= a * b;
      } else {
        cols[w] = cols[k];
        vals[w] = vals[k];
        ++w;
      }
    }
    cols.resize(w);
    vals.resize(w);
    if (cols.empty()) return false;
    amax = 0.0;
    for (double v : vals) amax = std::max(amax, std::fabs(v));
  }
  double amin = HUGE_VAL;
  for (double v : vals) amin = std::min(amin, std::fabs(v));
  if (amax / std::max(amin, 1e-12) > 1e5) return false;
  if (!std::isfinite(rhs) || std::fabs(rhs) > 1e15) return false;
  const double s =
      hx_integral_scale(vals.data(), (int)vals.size(), 1e-9, 1e-9,
                        1024, 1e6);
  if (s > 0.0 && s * amax <= 1e4) {
    for (auto& v : vals) v = std::floor(v * s + 0.5);
    rhs *= s;
  } else {
    for (auto& v : vals) v /= amax;
    rhs /= amax;
  }
  return true;
}

}  // namespace

extern "C" int hx_root_cuts(
    int m, int n, const int64_t* Ap, const int32_t* Ai, const double* Ax,
    const int64_t* Rp, const int32_t* Ri, const double* Rx,
    const double* cost, const double* col_lo, const double* col_up,
    const double* row_lo, const double* row_up, const int8_t* is_int,
    const int8_t* basis_in, double feastol, double tol_p, double tol_d,
    int max_rounds, int max_cuts_round, int cut_cap, int64_t nnz_cap,
    double time_budget_s, int separate_only,
    const double* x_in,  // nullable: with separate_only, use THIS LP
                         // point + the passed basis verbatim (factor
                         // only, no pivoting) so tableau cuts come
                         // from the caller's exact vertex
    // outputs
    int64_t* out_cut_indptr, int64_t* out_cut_cols,
    double* out_cut_vals, double* out_cut_rhs, double* bound_out,
    double* x_out, double* z_out, int8_t* basis_out, int* n_cuts_out,
    int64_t* lp_iters_out, int* rounds_out) {
  const auto t_start = std::chrono::steady_clock::now();
  auto elapsed = [&]() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now() - t_start)
        .count();
  };
  *n_cuts_out = 0;
  out_cut_indptr[0] = 0;
  *bound_out = -HUGE_VAL;
  *lp_iters_out = 0;
  *rounds_out = 0;
  // ---- variable bounds from two-nonzero rows (mirror of
  //      cuts.collect_variable_bounds, flattened layout of
  //      hx_mir_on_leq: per column vlbs first then vubs) -------------
  std::vector<std::vector<std::array<double, 3>>> vlb(n), vub(n);
  for (int r = 0; r < m; ++r) {
    if (Rp[r + 1] - Rp[r] != 2) continue;
    const int64_t k0 = Rp[r];
    const int c0 = Ri[k0], c1 = Ri[k0 + 1];
    const double v0 = Rx[k0], v1 = Rx[k0 + 1];
    if ((is_int[c0] != 0) == (is_int[c1] != 0)) continue;
    int ycol, xcol;
    double ay, ax;
    if (is_int[c0]) {
      ycol = c0; ay = v0; xcol = c1; ax = v1;
    } else {
      ycol = c1; ay = v1; xcol = c0; ax = v0;
    }
    if (std::fabs(ax) <= 1e-12 || std::fabs(ay) <= 1e-12) continue;
    const double bnds[2] = {row_up[r], row_lo[r]};
    const double sgns[2] = {1.0, -1.0};
    for (int t = 0; t < 2; ++t) {
      const double b = bnds[t];
      if (std::fabs(b) >= kInf) continue;
      const double axs = sgns[t] * ax, ays = sgns[t] * ay,
                   bs = sgns[t] * b;
      auto& dst = (axs > 0) ? vub[xcol] : vlb[xcol];
      if (dst.size() < 4)
        dst.push_back({(double)ycol, -ays / axs, bs / axs});
    }
  }
  std::vector<int64_t> vb_ptr(n + 1, 0);
  for (int j = 0; j < n; ++j)
    vb_ptr[j + 1] = vb_ptr[j] + (int64_t)(vlb[j].size() + vub[j].size());
  const int64_t vb_total = vb_ptr[n];
  std::vector<int32_t> vb_y(vb_total);
  std::vector<double> vb_c1(vb_total), vb_c0(vb_total);
  std::vector<uint8_t> vb_isub(vb_total);
  {
    int64_t p = 0;
    for (int j = 0; j < n; ++j) {
      for (auto& e3 : vlb[j]) {
        vb_y[p] = (int32_t)e3[0]; vb_c1[p] = e3[1]; vb_c0[p] = e3[2];
        vb_isub[p] = 0; ++p;
      }
      for (auto& e3 : vub[j]) {
        vb_y[p] = (int32_t)e3[0]; vb_c1[p] = e3[1]; vb_c0[p] = e3[2];
        vb_isub[p] = 1; ++p;
      }
    }
  }
  const int64_t n_vb = n;

  // ---- growable cut storage (a'x <= rhs over structural cols) ------
  std::vector<int64_t> cptr{0};
  std::vector<int64_t> ccols;
  std::vector<double> cvals;
  std::vector<double> crhs;
  std::vector<int> cage;
  std::unordered_set<uint64_t> keys;
  int ncuts = 0;

  // seed the dedup key set with the <=-shaped rows already in the
  // passed matrix: in separate-only mode the caller's earlier cut
  // rows arrive as ordinary rows, and re-picking their duplicates
  // every round wastes the whole per-round budget on cuts the
  // caller's pool will reject anyway
  for (int r = 0; r < m; ++r) {
    if (row_lo[r] > -kInf || row_up[r] >= kInf) continue;
    std::vector<int64_t> kc;
    std::vector<double> kv;
    for (int64_t q = Rp[r]; q < Rp[r + 1]; ++q) {
      kc.push_back(Ri[q]);
      kv.push_back(Rx[q]);
    }
    keys.insert(rc_key(kc, kv, row_up[r]));
  }

  std::vector<int8_t> basis;  // n + m + ncuts statuses
  if (basis_in) basis.assign(basis_in, basis_in + n + m);

  std::vector<double> x(n), z(n), act;
  double bound = -HUGE_VAL, best_bound = -HUGE_VAL;
  double first_bound = 0.0;
  bool have_first = false;
  int stall = 0, hard_stall = 0, last_added = 0;
  int64_t iters_total = 0;
  int round = 0;
  int status = 0;

  // scratch for matrix assembly
  std::vector<int64_t> rp2, ap2;
  std::vector<int32_t> ri2, ai2;
  std::vector<double> rx2, ax2, rl2, ru2;

  for (round = 0; round < max_rounds; ++round) {
    // ---- assemble [A; C] in CSR and CSC -------------------------
    const int mc = m + ncuts;
    const int64_t nnz_a = Rp[m];
    const int64_t nnz_c = cptr[ncuts];
    rp2.resize(mc + 1);
    ri2.resize(nnz_a + nnz_c);
    rx2.resize(nnz_a + nnz_c);
    std::memcpy(rp2.data(), Rp, sizeof(int64_t) * (m + 1));
    std::memcpy(ri2.data(), Ri, sizeof(int32_t) * nnz_a);
    std::memcpy(rx2.data(), Rx, sizeof(double) * nnz_a);
    for (int k = 0; k < ncuts; ++k) {
      rp2[m + k + 1] = rp2[m + k] + (cptr[k + 1] - cptr[k]);
      for (int64_t q = cptr[k]; q < cptr[k + 1]; ++q) {
        ri2[nnz_a + q] = (int32_t)ccols[q];
        rx2[nnz_a + q] = cvals[q];
      }
    }
    // CSC by counting sort over the CSR
    ap2.assign(n + 1, 0);
    for (int64_t q = 0; q < (int64_t)ri2.size(); ++q) ++ap2[ri2[q] + 1];
    for (int j = 0; j < n; ++j) ap2[j + 1] += ap2[j];
    ai2.resize(ri2.size());
    ax2.resize(ri2.size());
    {
      std::vector<int64_t> fill(ap2.begin(), ap2.end() - 1);
      for (int r = 0; r < mc; ++r)
        for (int64_t q = rp2[r]; q < rp2[r + 1]; ++q) {
          const int64_t p = fill[ri2[q]]++;
          ai2[p] = r;
          ax2[p] = rx2[q];
        }
    }
    rl2.resize(mc);
    ru2.resize(mc);
    std::memcpy(rl2.data(), row_lo, sizeof(double) * m);
    std::memcpy(ru2.data(), row_up, sizeof(double) * m);
    for (int k = 0; k < ncuts; ++k) {
      rl2[m + k] = -kInf;
      ru2[m + k] = crhs[k];
    }

    // ---- solve --------------------------------------------------
    std::unique_ptr<Engine> e(build_engine(
        mc, n, ap2.data(), ai2.data(), ax2.data(), rp2.data(),
        ri2.data(), rx2.data(), cost, col_lo, col_up, rl2.data(),
        ru2.data()));
    set_basis_from(*e, basis.empty() ? nullptr : basis.data());
    const bool verbatim = separate_only && x_in != nullptr &&
                          !basis.empty();
    if (verbatim) {
      // caller-supplied vertex: factor the given basis (for the
      // tableau BTRANs) but do NOT pivot — the cuts must separate
      // the caller's exact LP point, or degenerate re-solves drift
      // to a different optimal basis and change the tableau family
      // (measured: bell5 tree 4288 -> 8331 nodes from that drift)
      if (!factor(*e)) {
        status = 2;
        break;
      }
      basis.resize(n + mc);
      std::memcpy(x.data(), x_in, sizeof(double) * n);
      std::memset(z.data(), 0, sizeof(double) * n);
    } else {
      int it = 0;
      const double remaining = time_budget_s - elapsed();
      const int res = engine_solve_escalated(
          *e, tol_p, tol_d, 100000, std::max(remaining, 0.05), &it,
          kInf);
      iters_total += it;
      if (res == kInfeasible) {
        status = 1;
        break;
      }
      if (res != kOptimal) {
        status = 2;
        break;
      }
      basis.resize(n + mc);
      std::vector<double> y_dummy(mc);
      export_solution(*e, x.data(), y_dummy.data(), z.data(),
                      basis.data());
    }
    const double prev_bound = bound;
    bound = 0.0;
    for (int j = 0; j < n; ++j) bound += cost[j] * x[j];
    best_bound = std::max(best_bound, bound);
    // snapshot the SOLVED state (x/z/basis AND the cut set the solve
    // ran with): later appends/aging mutate the working storage, and
    // a failed next solve must not leave mismatched outputs
    std::memcpy(x_out, x.data(), sizeof(double) * n);
    std::memcpy(z_out, z.data(), sizeof(double) * n);
    std::memcpy(basis_out, basis.data(), (size_t)(n + mc));
    out_cut_indptr[0] = 0;
    for (int k = 0; k < ncuts; ++k) {
      out_cut_indptr[k + 1] = cptr[k + 1];
      out_cut_rhs[k] = crhs[k];
    }
    for (int64_t q = 0; q < cptr[ncuts]; ++q) {
      out_cut_cols[q] = ccols[q];
      out_cut_vals[q] = cvals[q];
    }
    *n_cuts_out = ncuts;

    // ---- stall rules (mirror of the Python loop / reference
    //      HighsMipSolverData.cpp:2264 tailing-off) ----------------
    if (!have_first) {
      have_first = true;
      first_bound = bound;
    } else {
      if (bound < prev_bound - 1e-6 * (1.0 + std::fabs(prev_bound)))
        break;  // numerical regression: stop separating
      const double improve = bound - prev_bound;
      const double prog_prev = prev_bound - first_bound;
      const double bar =
          std::max(0.001 * std::max(prog_prev, 0.0),
                   1e-4 * (1.0 + std::fabs(bound)));
      stall = improve <= bar ? stall + 1 : 0;
      const int patience = last_added < 30 ? 3 : 6;
      if (stall >= patience) break;
      const bool trickle =
          last_added < 5 &&
          improve <= 1e-9 * std::max(1.0, std::fabs(bound));
      hard_stall = trickle ? hard_stall + 1 : 0;
      if (hard_stall >= 2) break;
    }
    if (!separate_only &&
        (elapsed() > time_budget_s || round == max_rounds - 1 ||
         ncuts >= cut_cap - max_cuts_round ||
         (int64_t)ccols.size() >= nnz_cap - 64 * max_cuts_round))
      break;

    // ---- activities + extended space ----------------------------
    act.assign(mc, 0.0);
    for (int r = 0; r < mc; ++r) {
      double a = 0.0;
      for (int64_t q = rp2[r]; q < rp2[r + 1]; ++q)
        a += rx2[q] * x[ri2[q]];
      act[r] = a;
    }
    const int next = n + mc;
    std::vector<double> x_ext(next), lo_ext(next), up_ext(next);
    std::vector<int8_t> int_ext(next, 0);
    for (int j = 0; j < n; ++j) {
      x_ext[j] = x[j];
      lo_ext[j] = col_lo[j];
      up_ext[j] = col_up[j];
      int_ext[j] = is_int[j];
    }
    for (int r = 0; r < mc; ++r) {
      x_ext[n + r] = std::min(std::max(act[r], rl2[r]), ru2[r]);
      lo_ext[n + r] = rl2[r];
      up_ext[n + r] = ru2[r];
    }

    // ---- candidate collection -----------------------------------
    std::vector<RCut> cand;
    const int mir_cap = 4 * next + 16;
    std::vector<int64_t> mir_cols(mir_cap);
    std::vector<double> mir_vals(mir_cap);
    auto push_candidate = [&](const int64_t* cc, const double* vv,
                              int cnt, double rhs) {
      // fold extended (slack) coefficients back through the rows
      std::vector<double> dense(n, 0.0);
      for (int k = 0; k < cnt; ++k) {
        const int64_t c = cc[k];
        if (c < n) {
          dense[c] += vv[k];
        } else {
          const int r = (int)(c - n);
          for (int64_t q = rp2[r]; q < rp2[r + 1]; ++q)
            dense[ri2[q]] += vv[k] * rx2[q];
        }
      }
      RCut rc;
      for (int j = 0; j < n; ++j)
        if (std::fabs(dense[j]) > 1e-12) {
          rc.cols.push_back(j);
          rc.vals.push_back(dense[j]);
        }
      rc.rhs = rhs;
      if (rc.cols.empty()) return;
      if (!rc_clean(rc.cols, rc.vals, rc.rhs, col_lo, col_up)) return;
      double viol = -rc.rhs, sq = 0.0;
      for (size_t k = 0; k < rc.cols.size(); ++k) {
        viol += rc.vals[k] * x[rc.cols[k]];
        sq += rc.vals[k] * rc.vals[k];
      }
      const double nrm = std::sqrt(sq);
      if (nrm <= 1e-12 || viol / nrm <= 1e-6) return;
      rc.eff = viol / nrm;
      rc.key = rc_key(rc.cols, rc.vals, rc.rhs);
      if (keys.count(rc.key)) return;
      cand.push_back(std::move(rc));
    };
    auto mir_both_signs = [&](const std::vector<int64_t>& acols,
                              const std::vector<double>& avals,
                              double rhs0, bool neg_too, int prefer) {
      std::vector<double> negv;
      for (int sgn_i = 0; sgn_i < (neg_too ? 2 : 1); ++sgn_i) {
        const double* use = avals.data();
        double userhs = rhs0;
        if (sgn_i == 1) {
          negv.resize(avals.size());
          for (size_t k = 0; k < avals.size(); ++k)
            negv[k] = -avals[k];
          use = negv.data();
          userhs = -rhs0;
        }
        double rhs_out = 0.0, eff_out = 0.0;
        const int n_mir = hx_mir_on_leq(
            (int)acols.size(), acols.data(), use, userhs, x_ext.data(),
            lo_ext.data(), up_ext.data(), int_ext.data(), feastol,
            prefer, n_vb, vb_ptr.data(), vb_y.data(),
            vb_c1.data(), vb_c0.data(), vb_isub.data(), mir_cap,
            mir_cols.data(), mir_vals.data(), &rhs_out, &eff_out);
        if (n_mir > 0)
          push_candidate(mir_cols.data(), mir_vals.data(), n_mir,
                         rhs_out);
      }
    };

    // (a) tableau-MIR from the engine's basis factorization
    // (HighsTableauSeparator role): aggregate ALL rows with weights
    // e_p'B^{-1} for each fractional basic integer variable.
    {
      struct TC { double score; int pos; };
      std::vector<TC> tcand;
      for (int p = 0; p < mc; ++p) {
        const int j = e->basic[p];
        if (j >= n || !is_int[j]) continue;
        const double fr = x[j] - std::floor(x[j]);
        const double frac = std::min(fr, 1.0 - fr);
        if (frac <= 10 * feastol) continue;
        tcand.push_back({fr * (1.0 - fr), p});
      }
      std::sort(tcand.begin(), tcand.end(),
                [](const TC& a, const TC& b) { return a.score > b.score; });
      if (tcand.size() > 200) tcand.resize(200);
      std::vector<double> eb(mc), yrow(mc);
      std::vector<int64_t> acols;
      std::vector<double> avals;
      const double max_w = 1.0 / std::max(feastol, 1e-9);
      for (const TC& tc : tcand) {
        std::fill(eb.begin(), eb.end(), 0.0);
        eb[tc.pos] = 1.0;
        btran_vec(*e, eb.data(), yrow.data());
        // weight hygiene (mirror of separate_tableau_mir)
        int nzr = 0;
        double wmax = 0.0, wmin = HUGE_VAL;
        for (int r = 0; r < mc; ++r) {
          const double w = std::fabs(yrow[r]);
          if (w > 1e-11) {
            ++nzr;
            wmax = std::max(wmax, w);
            wmin = std::min(wmin, w);
          }
        }
        if (nzr <= 1 || nzr > 1000) continue;
        if (wmax / std::max(wmin, 1e-300) > 1e6 || wmax > max_w)
          continue;
        // extended-space aggregate: struct coefs A'y, slack coefs -y
        acols.clear();
        avals.clear();
        std::vector<double> sc(n, 0.0);
        for (int r = 0; r < mc; ++r) {
          const double w = yrow[r];
          if (std::fabs(w) <= 1e-11) continue;
          for (int64_t q = rp2[r]; q < rp2[r + 1]; ++q)
            sc[ri2[q]] += w * rx2[q];
        }
        for (int j = 0; j < n; ++j)
          if (std::fabs(sc[j]) > 1e-12) {
            acols.push_back(j);
            avals.push_back(sc[j]);
          }
        for (int r = 0; r < mc; ++r)
          if (std::fabs(yrow[r]) > 1e-11) {
            acols.push_back(n + r);
            avals.push_back(-yrow[r]);
          }
        mir_both_signs(acols, avals, 0.0, true, /*prefer_vbds=*/1);
      }
    }

    // (b) single-row c-MIR over the tightest rows (both senses),
    // original + cut rows (HighsCutGeneration on single rows)
    {
      struct TR { double tight; int r; };
      std::vector<TR> rows;
      for (int r = 0; r < mc; ++r) {
        if (rp2[r + 1] - rp2[r] < 2) continue;
        double t = HUGE_VAL;
        if (ru2[r] < kInf) t = std::min(t, std::fabs(act[r] - ru2[r]));
        if (rl2[r] > -kInf) t = std::min(t, std::fabs(act[r] - rl2[r]));
        if (t < HUGE_VAL) rows.push_back({t, r});
      }
      std::sort(rows.begin(), rows.end(),
                [](const TR& a, const TR& b) { return a.tight < b.tight; });
      if (rows.size() > 400) rows.resize(400);
      std::vector<int64_t> acols;
      std::vector<double> avals;
      for (const TR& tr : rows) {
        const int r = tr.r;
        // qualify: integer support or substitutable continuous
        bool ok = false;
        for (int64_t q = rp2[r]; q < rp2[r + 1] && !ok; ++q) {
          const int c = ri2[q];
          if (is_int[c] || vb_ptr[c + 1] > vb_ptr[c]) ok = true;
        }
        if (!ok) continue;
        acols.clear();
        avals.clear();
        for (int64_t q = rp2[r]; q < rp2[r + 1]; ++q) {
          acols.push_back(ri2[q]);
          avals.push_back(rx2[q]);
        }
        if (ru2[r] < kInf)
          mir_both_signs(acols, avals, ru2[r], false, /*prefer_vbds=*/0);
        if (rl2[r] > -kInf) {
          std::vector<double> neg(avals.size());
          for (size_t k = 0; k < avals.size(); ++k) neg[k] = -avals[k];
          mir_both_signs(acols, neg, -rl2[r], false, /*prefer_vbds=*/0);
        }
      }
    }

    // (c) path-aggregation c-MIR (hx_path_mir) on the full matrix
    {
      const double pm_budget =
          std::min(0.02, std::max(0.0, time_budget_s - elapsed()));
      if (pm_budget > 0.001) {
        const int pm_max = 100;
        const int64_t pm_nnz = 64LL * pm_max;
        std::vector<int64_t> p_ptr(pm_max + 1, 0);
        std::vector<int64_t> p_cols(pm_nnz);
        std::vector<double> p_vals(pm_nnz), p_rhs(pm_max),
            p_eff(pm_max);
        const int k_pm = hx_path_mir(
            mc, n, rp2.data(), ri2.data(), rx2.data(), rl2.data(),
            ru2.data(), col_lo, col_up, x.data(), is_int, feastol,
            /*max_path=*/6, /*max_starts=*/400,
            /*seed=*/163 + (uint64_t)round, pm_budget, n_vb,
            vb_ptr.data(), vb_y.data(), vb_c1.data(), vb_c0.data(),
            vb_isub.data(), pm_max, pm_nnz, p_ptr.data(),
            p_cols.data(), p_vals.data(), p_rhs.data(), p_eff.data());
        for (int k = 0; k < k_pm; ++k) {
          RCut rc;
          for (int64_t q = p_ptr[k]; q < p_ptr[k + 1]; ++q) {
            rc.cols.push_back(p_cols[q]);
            rc.vals.push_back(p_vals[q]);
          }
          rc.rhs = p_rhs[k];
          if (!rc_clean(rc.cols, rc.vals, rc.rhs, col_lo, col_up))
            continue;
          double viol = -rc.rhs, sq = 0.0;
          for (size_t kk = 0; kk < rc.cols.size(); ++kk) {
            viol += rc.vals[kk] * x[rc.cols[kk]];
            sq += rc.vals[kk] * rc.vals[kk];
          }
          const double nrm = std::sqrt(sq);
          if (nrm <= 1e-12 || viol / nrm <= 1e-6) continue;
          rc.eff = viol / nrm;
          rc.key = rc_key(rc.cols, rc.vals, rc.rhs);
          if (keys.count(rc.key)) continue;
          cand.push_back(std::move(rc));
        }
      }
    }

    // ---- selection: efficacy order + diversity filter (mirror of
    //      cuts.select_diverse_cuts / HighsCutPool selection) -------
    std::sort(cand.begin(), cand.end(),
              [](const RCut& a, const RCut& b) { return a.eff > b.eff; });
    std::vector<const RCut*> picked;
    std::vector<std::vector<double>> pdense;
    std::unordered_set<uint64_t> round_keys;
    // separate-only callers run their own pool + diversity selection
    // and need EVERY candidate (the rejected ones feed the cut pool's
    // later violated-re-collection); the diversity filter below only
    // protects the internal loop's own LP
    const double par_limit = separate_only ? 2.0 : 0.9;
    for (const RCut& rc : cand) {
      if ((int)picked.size() >= max_cuts_round) break;
      if (round_keys.count(rc.key)) continue;
      double sq = 0.0;
      for (double v : rc.vals) sq += v * v;
      const double nrm = std::sqrt(sq);
      if (nrm <= 1e-12) continue;
      std::vector<double> dn(n, 0.0);
      for (size_t k = 0; k < rc.cols.size(); ++k)
        dn[rc.cols[k]] = rc.vals[k] / nrm;
      bool parallel = false;
      for (const auto& pd : pdense) {
        double dot = 0.0;
        for (size_t k = 0; k < rc.cols.size(); ++k)
          dot += pd[rc.cols[k]] * dn[rc.cols[k]];
        if (std::fabs(dot) > par_limit) {
          parallel = true;
          break;
        }
      }
      if (parallel) continue;
      round_keys.insert(rc.key);
      picked.push_back(&rc);
      pdense.push_back(std::move(dn));
    }
    last_added = (int)picked.size();
    if (std::getenv("HX_ROOT_DEBUG"))
      std::fprintf(stderr,
                   "hx_root round=%d bound=%.8f cand=%d picked=%d "
                   "ncuts=%d iters=%lld\n",
                   round, bound, (int)cand.size(), last_added, ncuts,
                   (long long)iters_total);
    if (separate_only) {
      // separate-only mode: export the PICKED candidates themselves
      // (the caller owns the LP, pool, aging and the re-solve); the
      // x/z/basis snapshot above describes the LP they cut.
      int64_t q = 0;
      int k = 0;
      out_cut_indptr[0] = 0;
      for (const RCut* rc : picked) {
        if (k >= cut_cap || q + (int64_t)rc->cols.size() > nnz_cap)
          break;
        for (size_t t = 0; t < rc->cols.size(); ++t) {
          out_cut_cols[q] = rc->cols[t];
          out_cut_vals[q] = rc->vals[t];
          ++q;
        }
        out_cut_rhs[k] = rc->rhs;
        ++k;
        out_cut_indptr[k] = q;
      }
      *n_cuts_out = k;
      *bound_out = best_bound;
      *lp_iters_out = iters_total;
      *rounds_out = 1;
      return 0;
    }
    if (picked.empty()) break;

    // ---- append cut rows; slack logicals enter basic -------------
    for (const RCut* rc : picked) {
      for (size_t k = 0; k < rc->cols.size(); ++k) {
        ccols.push_back(rc->cols[k]);
        cvals.push_back(rc->vals[k]);
      }
      cptr.push_back((int64_t)ccols.size());
      crhs.push_back(rc->rhs);
      cage.push_back(0);
      keys.insert(rc->key);
      ++ncuts;
      basis.push_back(kBasic);
    }

    // ---- aging: cut rows slack at this optimum twice in a row
    //      leave the LP once it has bloated (mirror of the Python
    //      per-round aging / reference HighsLpRelaxation row aging).
    //      NOTE: ages refer to the PREVIOUS solve's activities; the
    //      newly added rows have age 0 and are never dropped here.
    if (ncuts > std::max(500, 2 * m)) {
      // activities of cut rows at the current x (pre-append rows only)
      std::vector<char> drop(ncuts, 0);
      int ndrop = 0;
      for (int k = 0; k + last_added < ncuts; ++k) {
        double a = 0.0;
        for (int64_t q = cptr[k]; q < cptr[k + 1]; ++q)
          a += cvals[q] * x[ccols[q]];
        const double slack = crhs[k] - a;
        if (slack <= 1e-6 * (1.0 + std::fabs(crhs[k]))) {
          cage[k] = 0;
        } else if (++cage[k] >= 2 && basis[n + m + k] == kBasic) {
          drop[k] = 1;
          ++ndrop;
        }
      }
      if (ndrop) {
        std::vector<int64_t> nptr{0};
        std::vector<int64_t> ncols_v;
        std::vector<double> nvals, nrhs;
        std::vector<int> nage;
        std::vector<int8_t> nb(basis.begin(), basis.begin() + n + m);
        for (int k = 0; k < ncuts; ++k) {
          if (drop[k]) continue;
          for (int64_t q = cptr[k]; q < cptr[k + 1]; ++q) {
            ncols_v.push_back(ccols[q]);
            nvals.push_back(cvals[q]);
          }
          nptr.push_back((int64_t)ncols_v.size());
          nrhs.push_back(crhs[k]);
          nage.push_back(cage[k]);
          nb.push_back(basis[n + m + k]);
        }
        cptr.swap(nptr);
        ccols.swap(ncols_v);
        cvals.swap(nvals);
        crhs.swap(nrhs);
        cage.swap(nage);
        basis.swap(nb);
        ncuts -= ndrop;
      }
    }
  }

  // cut/solution outputs were snapshotted after each successful solve
  *bound_out = best_bound;
  *lp_iters_out = iters_total;
  *rounds_out = round;
  return status;
}

extern "C" {

// ---- persistent-engine C API ------------------------------------------------

void* hx_dual_create(int m, int n, const int64_t* Ap, const int32_t* Ai,
                     const double* Ax, const int64_t* Rp,
                     const int32_t* Ri, const double* Rx,
                     const double* cost, const double* col_lo,
                     const double* col_up, const double* row_lo,
                     const double* row_up) {
  Engine* e = build_engine(m, n, Ap, Ai, Ax, Rp, Ri, Rx, cost, col_lo,
                           col_up, row_lo, row_up);
  set_basis_from(*e, nullptr);
  return e;
}

void hx_dual_destroy(void* h) { delete static_cast<Engine*>(h); }

// change COLUMN bounds only (rows fixed at creation); keeps the basis
void hx_dual_set_col_bounds(void* h, const double* col_lo,
                            const double* col_up) {
  Engine& e = *static_cast<Engine*>(h);
  for (int j = 0; j < e.n; ++j) {
    e.lo[j] = col_lo[j] <= -kInf ? -kInf : col_lo[j];
    e.up[j] = col_up[j] >= kInf ? kInf : col_up[j];
  }
  sanitize_nonbasic(e);
}

void hx_dual_set_tol_scale(void* h, const double* ts) {
  Engine& e = *static_cast<Engine*>(h);
  e.tolsc.assign(e.nv, 1.0);
  if (ts)
    for (int j = 0; j < e.nv; ++j)
      e.tolsc[j] = std::min(std::max(ts[j], 1e-4), 1e6);
}

void hx_dual_set_basis(void* h, const int8_t* basis) {
  Engine& e = *static_cast<Engine*>(h);
  // unchanged-basis fast path: keep the live factorization (the dive
  // re-solve pattern re-seeds the same parent basis repeatedly)
  if (e.factored) {
    bool same = true;
    for (int j = 0; j < e.nv; ++j) {
      const bool was_basic = e.stat[j] == kBasic;
      const bool is_basic = basis[j] == kBasic;
      if (was_basic != is_basic) { same = false; break; }
    }
    if (same) {
      for (int j = 0; j < e.nv; ++j)
        if (e.stat[j] != kBasic) e.stat[j] = basis[j];
      sanitize_nonbasic(e);
      return;
    }
  }
  set_basis_from(e, basis);
}

// solve from the current state; returns Result; outputs written in place
int hx_dual_solve_h(void* h, double tol_p, double tol_d, int max_iter,
                    double time_limit_s, double obj_cut, double* x_out,
                    double* y_out, double* z_out, int8_t* basis_out,
                    int* iters_out) {
  Engine& e = *static_cast<Engine*>(h);
  int iters = 0;
  const int res = engine_solve_escalated(
      e, tol_p, tol_d, max_iter, time_limit_s, &iters,
      obj_cut >= kInf ? kInf : obj_cut);
  if (x_out) export_solution(e, x_out, y_out, z_out, basis_out);
  *iters_out = iters;
  return res;
}

double hx_dual_objective(void* h) {
  Engine& e = *static_cast<Engine*>(h);
  double ob = 0.0;
  for (int j = 0; j < e.n; ++j) ob += e.cost[j] * e.xval[j];
  return ob;
}

// ---- native branch and bound over the persistent dual engine --------------
//
// Role of HighsSearch::dive + HighsNodeQueue + HighsPseudocost
// (highs/mip/HighsSearch.cpp:1870, :1099; HighsPseudocost.cpp) rebuilt
// around the persistent engine: within a dive only bounds change, so
// node re-solves reuse the live factorization; strong-branching probes
// snapshot/restore the full engine state instead of refactorizing.
//
// cb: optional progress hook (wires the reference's MIP callback types,
// HConst.h:233-245 / HighsCallbackStruct.h): what=0 periodic logging /
// interrupt poll, what=1 improved incumbent (x points at the new best);
// nonzero return interrupts the search (status 2).
//
// status: 0 tree exhausted, 2 limit/interrupt, 3 numerical trouble
// (caller falls back to its Python loop).

typedef int (*HxMipCb)(void* ud, int what, double primal_obj,
                       double dual_obj, int64_t nodes, int64_t lp_iters,
                       const double* x, int n);

int hx_mip_solve(
    int m, int n, const int64_t* Ap, const int32_t* Ai, const double* Ax,
    const int64_t* Rp, const int32_t* Ri, const double* Rx,
    const double* cost, const double* root_lo, const double* root_up,
    const double* row_lo, const double* row_up, const int8_t* is_int,
    const int8_t* root_basis, double incumbent_obj_in, double obj_scale,
    double mip_abs_gap, double mip_rel_gap, double obj_offset,
    double root_bound_in, double feastol, double tol_p, double tol_d,
    int64_t max_nodes, double time_limit_s, int reliable_count,
    HxMipCb cb, void* cb_ud, const double* tol_scale,
    const int32_t* sym_gens, int n_sym_gens,
    const double* ext_upper,
    double* best_x_out, double* best_obj_out, double* dual_bound_out,
    int64_t* nodes_out, int64_t* lp_iters_out, int* found_out,
    int* status_out) {
  const auto t_start = std::chrono::steady_clock::now();
  auto elapsed = [&]() {
    const std::chrono::duration<double> el =
        std::chrono::steady_clock::now() - t_start;
    return el.count();
  };

  Engine* ep = build_engine(m, n, Ap, Ai, Ax, Rp, Ri, Rx, cost, root_lo,
                            root_up, row_lo, row_up);
  Engine& e = *ep;
  hx_dual_set_tol_scale(ep, tol_scale);
  set_basis_from(e, root_basis);

  struct BBNode {
    int32_t parent;
    int32_t col;
    int8_t up_branch;
    double val;
    double bound;
    int32_t depth;
    int32_t basis_id;  // shared basis-pool entry (-1 = root basis)
    int32_t extra_id = -1;  // orbital-branching fixings (extra_pool)
  };
  std::vector<BBNode> nodes;
  nodes.reserve(4096);
  // shared basis pool with refcounts (two children share the parent's
  // optimal basis)
  std::vector<std::vector<int8_t>> pool;
  std::vector<int> pool_rc;
  std::vector<int> pool_free;
  auto pool_put = [&](const int8_t* b, int rc) {
    int id;
    if (!pool_free.empty()) {
      id = pool_free.back();
      pool_free.pop_back();
      pool[id].assign(b, b + n + m);
      pool_rc[id] = rc;
    } else {
      id = (int)pool.size();
      pool.emplace_back(b, b + n + m);
      pool_rc.push_back(rc);
    }
    return id;
  };
  auto pool_release = [&](int id) {
    if (id < 0) return;
    if (--pool_rc[id] == 0) pool_free.push_back(id);
  };

  typedef std::pair<double, int32_t> HeapEnt;
  std::priority_queue<HeapEnt, std::vector<HeapEnt>,
                      std::greater<HeapEnt>> heap;

  double incumbent = incumbent_obj_in;
  int found = 0;
  std::vector<double> best_x(n, 0.0);

  // STRICT pruning limit (reference upper_limit =
  // computeNewUpperLimit(ub, 0.0, 0.0), HighsMipSolverData.cpp:880):
  // dives keep exploring anything that could still hold a strictly
  // better solution.  The gap tolerances enter only through the
  // best-bound termination below (reference optimality_limit).
  auto prune_limit = [&]() {
    if (incumbent >= kInf) return kInf;
    double nl;
    if (obj_scale > 0.0) {
      nl = std::floor(obj_scale * incumbent - 0.5) / obj_scale;
      nl += feastol;
    } else {
      nl = incumbent - feastol;
    }
    return nl;
  };
  // gap-based optimality limit: when the best OPEN bound exceeds it,
  // the incumbent is optimal within mip_rel_gap/mip_abs_gap — stop.
  auto opt_limit = [&]() {
    if (incumbent >= kInf) return kInf;
    double nl = prune_limit();
    if (obj_scale > 0.0) {
      if (mip_rel_gap > 0.0)
        nl = std::min(nl, incumbent -
            std::ceil(mip_rel_gap * std::fabs(incumbent + obj_offset) *
                      obj_scale - 1e-9) / obj_scale + feastol);
      if (mip_abs_gap > 0.0)
        nl = std::min(nl, incumbent -
            std::ceil(mip_abs_gap * obj_scale - 1e-9) / obj_scale +
            feastol);
    } else {
      if (mip_rel_gap > 0.0)
        nl = std::min(nl, incumbent -
                      mip_rel_gap * std::fabs(incumbent + obj_offset));
      if (mip_abs_gap > 0.0)
        nl = std::min(nl, incumbent - mip_abs_gap);
    }
    return nl;
  };

  // pseudocosts per direction: cost-per-unit-fraction averages
  // (reference HighsPseudocost: reliability branching with strong-
  // branching initialization, mip_pscost_minreliable)
  std::vector<double> ps_up_sum(n, 0.0), ps_dn_sum(n, 0.0);
  std::vector<int32_t> ps_up_cnt(n, 0), ps_dn_cnt(n, 0);
  auto ps_avg = [&](double sum_all, int cnt_all) {
    return cnt_all > 0 ? std::max(sum_all / cnt_all, 1e-6) : 1e-6;
  };

  std::vector<double> lo(n), up(n);
  std::vector<double> x(n), y(m), z(n);
  std::vector<int8_t> basis(n + m);
  std::vector<int8_t> rb(n + m);
  bool have_root_basis = root_basis != nullptr;
  if (have_root_basis)
    for (int j = 0; j < n + m; ++j) rb[j] = root_basis[j];

  nodes.push_back(BBNode{-1, -1, 0, 0.0,
                         root_bound_in > -kInf ? root_bound_in : -kInf,
                         0, -1});
  heap.push(HeapEnt(nodes[0].bound, 0));

  int64_t node_count = 0, lp_iters = 0;
  int status = 0;
  double open_bound_at_stop = kInf;
  double t_prop = 0, t_lp = 0, t_probe = 0, t_heur = 0, t_fix = 0;
  const bool timing_dbg = std::getenv("HX_NATIVE_DEBUG") != nullptr;
  auto tick = [&]() { return std::chrono::steady_clock::now(); };
  auto tsec = [](auto a, auto b) {
    return std::chrono::duration<double>(b - a).count();
  };
  // conflict machinery (reference HighsDomain reason stack +
  // HighsConflictPool): clauses over binary decisions, derived from
  // propagation-infeasible nodes and from LP-infeasible branch paths
  ConflictPool cfl_pool;
  CflCtx cfl;
  cfl.root_lo = root_lo;
  cfl.root_up = root_up;
  cfl.pool = &cfl_pool;
  const bool cfl_off = std::getenv("HX_NO_CONFLICTS") != nullptr;
  const int kMaxConflicts = cfl_off ? 0 : 5000;
  // orbital branching (reference HighsSymmetry.h:58-126 orbital
  // fixing/stabilizers; Ostrowski-style orbital branching): on a
  // down-branch fixing binary j to 0, every variable in j's orbit
  // under the generators that STABILIZE the node's domain can also be
  // fixed to 0 in that child — among subproblem solutions with any
  // orbit member at 1 there is a symmetric one with x_j = 1, already
  // covered by the up child.
  std::vector<std::vector<int32_t>> extra_pool;
  if (std::getenv("HX_NATIVE_DEBUG"))
    std::fprintf(stderr, "hx_mip: n_sym_gens=%d\n", n_sym_gens);
  std::vector<double> lo_cmp, up_cmp;
  auto orbital_zero_fix = [&](int jcol, const std::vector<double>& lo_v,
                              const std::vector<double>& up_v)
      -> int32_t {
    if (n_sym_gens <= 0) return -1;
    std::vector<const int32_t*> stab;
    for (int g = 0; g < n_sym_gens; ++g) {
      const int32_t* pm = sym_gens + (size_t)g * n;
      bool ok = true;
      for (int i = 0; i < n && ok; ++i) {
        const int32_t gi = pm[i];
        if (gi == i) continue;
        if (std::fabs(lo_v[gi] - lo_v[i]) > 1e-9 ||
            std::fabs(up_v[gi] - up_v[i]) > 1e-9)
          ok = false;
      }
      if (ok) stab.push_back(pm);
    }
    if (stab.empty()) return -1;
    std::vector<int8_t> in_orbit(n, 0);
    std::vector<int32_t> queue{(int32_t)jcol};
    in_orbit[jcol] = 1;
    for (size_t qi = 0; qi < queue.size(); ++qi) {
      const int32_t v = queue[qi];
      for (const int32_t* pm : stab) {
        const int32_t w = pm[v];
        if (!in_orbit[w]) { in_orbit[w] = 1; queue.push_back(w); }
      }
    }
    std::vector<int32_t> fix;
    for (int32_t v : queue)
      if (v != jcol && up_v[v] > 0.5) fix.push_back(v);
    if (fix.empty()) return -1;
    extra_pool.push_back(std::move(fix));
    return (int32_t)extra_pool.size() - 1;
  };
  auto path_clause = [&](int32_t node_id) {
    // no-good over the binary fixings on the ancestry path
    if (cfl_pool.num() >= kMaxConflicts) return;
    std::vector<std::pair<int32_t, int8_t>> lits;
    for (int32_t a = node_id; a >= 0; a = nodes[a].parent) {
      if (nodes[a].extra_id >= 0) {
        // orbital fixings are part of the assumption set: the clause
        // must mention them or it would over-generalize
        for (int32_t jj : extra_pool[nodes[a].extra_id])
          lits.push_back({jj, (int8_t)1});
        if (lits.size() > 48) return;
      }
      if (nodes[a].col < 0) continue;
      const int j = nodes[a].col;
      if (root_lo[j] < -0.5 || root_up[j] > 1.5 || !is_int[j]) return;
      if (nodes[a].up_branch && nodes[a].val >= 0.5)
        lits.push_back({(int32_t)j, (int8_t)0});  // relax x_j -> 0
      else if (!nodes[a].up_branch && nodes[a].val <= 0.5)
        lits.push_back({(int32_t)j, (int8_t)1});
      else
        return;  // non-binary branch value
      if (lits.size() > 48) return;
    }
    if (!lits.empty()) cfl_pool.add(lits);
  };
  int32_t plunge = -1;
  bool engine_live = false;  // engine basis continues the current dive
  EngineState probe_save;
  double ps_sum_up_all = 0.0, ps_sum_dn_all = 0.0;
  int ps_cnt_up_all = 0, ps_cnt_dn_all = 0;
  int64_t last_cb_nodes = 0;
  auto fire_cb = [&](int what, const double* xs) {
    if (!cb) return 0;
    double db = heap.empty() ? (found ? incumbent : -kInf)
                             : heap.top().first;
    if (found) db = std::min(db, incumbent);
    return cb(cb_ud, what, incumbent, db, node_count, lp_iters, xs, n);
  };

  while (plunge >= 0 || !heap.empty()) {
    if (elapsed() > time_limit_s || node_count >= max_nodes) {
      status = 2;
      break;
    }
    // concurrent-worker incumbent injection (reference
    // HighsMipSolver worker sync :336: solutions exchange at sync
    // points): a heuristic thread publishes its best objective into
    // *ext_upper; adopting the VALUE alone tightens pruning — the
    // solution vector lives with the publisher.
    if (ext_upper && *ext_upper < incumbent - 1e-12)
      incumbent = *ext_upper;
    if (cb && node_count - last_cb_nodes >= 256) {
      last_cb_nodes = node_count;
      if (fire_cb(0, nullptr)) { status = 2; break; }
    }
    int32_t cur;
    if (plunge >= 0) {
      cur = plunge;
      plunge = -1;
    } else {
      cur = heap.top().second;
      heap.pop();
      engine_live = false;
      // best-bound termination within the gap tolerances (reference
      // optimality_limit at the node queue): the heap is bound-
      // ordered, so everything remaining is also within the gap.
      if (nodes[cur].bound > opt_limit()) {
        open_bound_at_stop = nodes[cur].bound;
        pool_release(nodes[cur].basis_id);
        break;
      }
    }
    const int32_t cur_basis_id = nodes[cur].basis_id;
    if (nodes[cur].bound > prune_limit()) {
      pool_release(cur_basis_id);
      continue;
    }

    // ---- bounds by ancestry walk ------------------------------------
    for (int j = 0; j < n; ++j) { lo[j] = root_lo[j]; up[j] = root_up[j]; }
    for (int32_t a = cur; a >= 0; a = nodes[a].parent) {
      if (nodes[a].col >= 0) {
        if (nodes[a].up_branch) {
          if (nodes[a].val > lo[nodes[a].col]) lo[nodes[a].col] = nodes[a].val;
        } else {
          if (nodes[a].val < up[nodes[a].col]) up[nodes[a].col] = nodes[a].val;
        }
      }
      if (nodes[a].extra_id >= 0)
        for (int32_t jj : extra_pool[nodes[a].extra_id])
          if (up[jj] > 0.0) up[jj] = 0.0;
    }

    ++node_count;
    auto tp0 = tick();
    const bool prop_ok = node_propagate(
        e, row_lo, row_up, is_int, feastol, 4, lo.data(), up.data(),
        cfl_off ? nullptr : &cfl);
    if (timing_dbg) t_prop += tsec(tp0, tick());
    if (!prop_ok) {
      if (cfl.have_out && cfl_pool.num() < kMaxConflicts)
        cfl_pool.add(cfl.out);
      else if (!cfl.have_out)
        path_clause(cur);
      pool_release(cur_basis_id);
      continue;
    }

    // ---- node LP: persistent engine, warm within the dive ------------
    hx_dual_set_col_bounds(&e, lo.data(), up.data());
    if (!engine_live) {
      const int8_t* wb = cur_basis_id >= 0 ? pool[cur_basis_id].data()
                          : (have_root_basis ? rb.data() : nullptr);
      if (wb) hx_dual_set_basis(&e, wb);
    }
    pool_release(cur_basis_id);
    double remaining = time_limit_s - elapsed();
    if (remaining <= 0.0) { status = 2; break; }
    int iters = 0;
    auto tl0 = tick();
    int res = engine_solve_escalated(e, tol_p, tol_d, 100000, remaining,
                                     &iters, prune_limit());
    if (timing_dbg) t_lp += tsec(tl0, tick());
    lp_iters += iters;
    if (res == kNeedPrimal || res == kSingular) {
      // retry once from the all-logical basis before giving up
      set_basis_from(e, nullptr);
      res = engine_solve_escalated(e, tol_p, tol_d, 100000,
                                   time_limit_s - elapsed(), &iters,
                                   prune_limit());
      lp_iters += iters;
    }
    engine_live = false;
    if (res == kObjCut) continue;          // bound-pruned mid-solve
    if (res == kInfeasible) {              // engine re-verified already
      path_clause(cur);
      continue;
    }
    if (res == kUnbounded) { status = 3; break; }
    if (res != kOptimal) {
      if (elapsed() > time_limit_s) { status = 2; break; }
      if (timing_dbg)
        std::fprintf(stderr, "hx_mip: node LP gave res=%d -> bail\n",
                     res);
      status = 3;
      break;
    }
    double obj = hx_dual_objective(&e);
    if (obj < nodes[cur].bound) obj = nodes[cur].bound;
    nodes[cur].bound = obj;
    if (obj > prune_limit()) continue;
    for (int j = 0; j < n; ++j) x[j] = e.xval[j];
    for (int j = 0; j < n + m; ++j) basis[j] = e.stat[j];

    // pseudocost update for the branch that created this node
    if (nodes[cur].col >= 0) {
      const int32_t p = nodes[cur].parent;
      const double delta = std::max(obj - nodes[p].bound, 0.0);
      const int bc = nodes[cur].col;
      if (nodes[cur].up_branch) {
        ps_up_sum[bc] += delta; ps_up_cnt[bc]++;
        ps_sum_up_all += delta; ps_cnt_up_all++;
      } else {
        ps_dn_sum[bc] += delta; ps_dn_cnt[bc]++;
        ps_sum_dn_all += delta; ps_cnt_dn_all++;
      }
    }

    // ---- fractional candidates ----------------------------------------
    const double pu_avg = ps_avg(ps_sum_up_all, ps_cnt_up_all);
    const double pd_avg = ps_avg(ps_sum_dn_all, ps_cnt_dn_all);
    int bcol = -1;
    double bscore = -1.0, bfrac = 0.0;
    // collect candidates for reliability probing
    struct Cand { int j; double f; double score; };
    std::vector<Cand> cands;
    for (int j = 0; j < n; ++j) {
      if (!is_int[j]) continue;
      const double f = x[j] - std::floor(x[j]);
      const double fr = std::min(f, 1.0 - f);
      if (fr <= feastol) continue;
      const double pu = ps_up_cnt[j] ? ps_up_sum[j] / ps_up_cnt[j] : pu_avg;
      const double pd = ps_dn_cnt[j] ? ps_dn_sum[j] / ps_dn_cnt[j] : pd_avg;
      const double score = std::max(pu * (1.0 - f), 1e-12) *
                           std::max(pd * f, 1e-12);
      cands.push_back(Cand{j, f, score});
      if (score > bscore) { bscore = score; bcol = j; bfrac = f; }
    }
    if (bcol < 0) {
      // integral: candidate incumbent.  Rounding basic integers to
      // exact integrality perturbs the rows by up to feastol per
      // column — on badly scaled instances that exceeds the absolute
      // MIP feasibility tolerance.  Do what the reference's
      // transformNewIntegerFeasibleSolution does: fix every integer
      // at its rounded value and warm re-solve the LP so the
      // continuous completion is exact.
      if (obj < incumbent - 1e-12) {
        EngineState fix_save;
        save_state(e, fix_save);
        std::vector<double> flo(lo), fup(up);
        for (int j = 0; j < n; ++j)
          if (is_int[j]) flo[j] = fup[j] = std::floor(x[j] + 0.5);
        hx_dual_set_col_bounds(&e, flo.data(), fup.data());
        int fit = 0;
        const int fres = engine_solve_phase1(
            e, tol_p, tol_d, 20000, time_limit_s - elapsed(), &fit,
            kInf);
        lp_iters += fit;
        if (fres == kOptimal) {
          const double fobj = hx_dual_objective(&e);
          if (fobj < incumbent - 1e-12) {
            incumbent = fobj;
            found = 1;
            for (int j = 0; j < n; ++j)
              best_x[j] = is_int[j] ? flo[j] : e.xval[j];
            if (cb && fire_cb(1, best_x.data())) { status = 2; break; }
          }
        }
        restore_state(e, fix_save);
        hx_dual_set_col_bounds(&e, lo.data(), up.data());
        engine_live = false;
      }
      continue;
    }

    // ---- reliability strong branching (HighsSearch::branch parity) ----
    // probe unreliable candidates with a few dual iterations from the
    // node's optimal basis; snapshot/restore makes a probe ~free of
    // factorization cost
    if (reliable_count > 0 && (int)cands.size() > 1) {
      // rank by score, probe the top few unreliable ones
      std::sort(cands.begin(), cands.end(),
                [](const Cand& a, const Cand& b) {
                  return a.score > b.score;
                });
      const int max_probe = nodes[cur].depth == 0 ? 12 : 6;
      int probed = 0;
      bool saved = false;
      int fixed_col = -1;
      int8_t fixed_up = 0;
      double fixed_val = 0.0;
      for (const Cand& cd : cands) {
        if (probed >= max_probe) break;
        const int j = cd.j;
        if (std::min(ps_up_cnt[j], ps_dn_cnt[j]) >= reliable_count)
          continue;
        if (elapsed() > time_limit_s) break;
        if (!saved) { save_state(e, probe_save); saved = true; }
        ++probed;
        const double fl = std::floor(x[j]);
        // down probe
        double sav_up = up[j], sav_lo = lo[j];
        up[j] = fl;
        hx_dual_set_col_bounds(&e, lo.data(), up.data());
        int pit = 0;
        int pres = engine_solve(e, tol_p, tol_d, 30, 0.0, &pit, kInf);
        lp_iters += pit;
        double dn_delta;
        if (pres == kInfeasible) dn_delta = kInf;
        else dn_delta = std::max(hx_dual_objective(&e) - obj, 0.0);
        up[j] = sav_up;
        restore_state(e, probe_save);
        // up probe
        lo[j] = fl + 1.0;
        hx_dual_set_col_bounds(&e, lo.data(), up.data());
        pres = engine_solve(e, tol_p, tol_d, 30, 0.0, &pit, kInf);
        lp_iters += pit;
        double up_delta;
        if (pres == kInfeasible) up_delta = kInf;
        else up_delta = std::max(hx_dual_objective(&e) - obj, 0.0);
        lo[j] = sav_lo;
        restore_state(e, probe_save);
        // infeasible probes fix the variable and re-enter the node LP
        if (dn_delta >= kInf && up_delta >= kInf) { bcol = -2; break; }
        if (dn_delta >= kInf) {
          fixed_col = j; fixed_up = 1; fixed_val = fl + 1.0;
          bcol = -3;
          break;
        }
        if (up_delta >= kInf) {
          fixed_col = j; fixed_up = 0; fixed_val = fl;
          bcol = -3;
          break;
        }
        // seed pseudocosts with the probe degradations
        ps_dn_sum[j] += dn_delta; ps_dn_cnt[j]++;
        ps_sum_dn_all += dn_delta; ps_cnt_dn_all++;
        ps_up_sum[j] += up_delta; ps_up_cnt[j]++;
        ps_sum_up_all += up_delta; ps_cnt_up_all++;
      }
      if (bcol == -2) continue;  // both directions infeasible: prune
      if (bcol == -3) {
        // one direction infeasible: record the fixing as a synthetic
        // branch child and re-enter it immediately (the ancestry walk
        // reconstructs the bound; the engine still holds this node's
        // optimal basis)
        const int32_t nid = (int32_t)nodes.size();
        nodes.push_back(BBNode{cur, fixed_col, fixed_up, fixed_val,
                               obj, nodes[cur].depth, -1});
        plunge = nid;
        engine_live = true;
        continue;
      }
      // rescore with refreshed pseudocosts
      bscore = -1.0;
      for (const Cand& cd : cands) {
        const int j = cd.j;
        const double f = cd.f;
        const double pu = ps_up_cnt[j] ? ps_up_sum[j] / ps_up_cnt[j]
                                       : pu_avg;
        const double pd = ps_dn_cnt[j] ? ps_dn_sum[j] / ps_dn_cnt[j]
                                       : pd_avg;
        const double score = std::max(pu * (1.0 - f), 1e-12) *
                             std::max(pd * f, 1e-12);
        if (score > bscore) { bscore = score; bcol = j; bfrac = f; }
      }
    }

    // ---- rounding + LP-completion heuristic (every 100 nodes) ---------
    if (node_count % 100 == 1) {
      std::vector<double> hlo(lo), hup(up);
      bool ok_box = true;
      for (int j = 0; j < n; ++j) {
        if (!is_int[j]) continue;
        const double r = std::floor(x[j] + 0.5);
        if (r < hlo[j] - feastol || r > hup[j] + feastol) {
          ok_box = false;
          break;
        }
        hlo[j] = hup[j] = r;
      }
      if (ok_box && time_limit_s - elapsed() > 0.05) {
        save_state(e, probe_save);
        hx_dual_set_col_bounds(&e, hlo.data(), hup.data());
        int hit = 0;
        int hres = engine_solve(e, tol_p, tol_d, 20000,
                                time_limit_s - elapsed(), &hit, kInf);
        lp_iters += hit;
        if (hres == kOptimal) {
          const double hobj = hx_dual_objective(&e);
          if (hobj < incumbent - 1e-12) {
            incumbent = hobj;
            found = 1;
            for (int j = 0; j < n; ++j)
              best_x[j] = is_int[j] ? std::floor(e.xval[j] + 0.5)
                                    : e.xval[j];
            if (cb && fire_cb(1, best_x.data())) {
              restore_state(e, probe_save);
              status = 2;
              break;
            }
          }
        }
        restore_state(e, probe_save);
      }
    }

    // ---- branch ---------------------------------------------------------
    const double fl = std::floor(x[bcol]);
    const bool do_plunge = nodes[cur].depth < 400;
    const int basis_id = pool_put(basis.data(), do_plunge ? 1 : 2);
    const int32_t down_id = (int32_t)nodes.size();
    const int32_t up_id = down_id + 1;
    const int32_t plunge_id = (bfrac > 0.5) ? up_id : down_id;
    const int32_t other_id = (bfrac > 0.5) ? down_id : up_id;
    int32_t orbit_extra = -1;
    if (n_sym_gens > 0 && is_int[bcol] && fl == 0.0 &&
        root_lo[bcol] > -0.5 && root_up[bcol] < 1.5)
      orbit_extra = orbital_zero_fix(bcol, lo, up);
    // the plunge child continues on the live engine basis and never
    // reads the pool; only heap-bound children carry the pool entry
    nodes.push_back(BBNode{cur, bcol, 0, fl, obj, nodes[cur].depth + 1,
                           (!do_plunge || down_id == other_id)
                               ? basis_id : -1, orbit_extra});
    nodes.push_back(BBNode{cur, bcol, 1, fl + 1.0, obj,
                           nodes[cur].depth + 1,
                           (!do_plunge || up_id == other_id)
                               ? basis_id : -1});
    heap.push(HeapEnt(obj, other_id));
    if (do_plunge) {
      plunge = plunge_id;
      engine_live = true;  // dive continues from this node's basis
    } else {
      heap.push(HeapEnt(obj, plunge_id));
    }
  }

  // ---- wrap up ----------------------------------------------------------
  double dual = incumbent;
  if (status == 0 && found && open_bound_at_stop < kInf) {
    // stopped within the gap tolerances: the best open bound is the
    // honest dual bound
    dual = std::min(incumbent, open_bound_at_stop);
  } else if (status != 0) {
    dual = heap.empty() ? (found ? incumbent : -kInf) : heap.top().first;
    if (plunge >= 0) dual = std::min(dual, nodes[plunge].bound);
    if (found) dual = std::min(dual, incumbent);
  } else if (!found) {
    dual = kInf;
  }
  if (found)
    for (int j = 0; j < n; ++j) best_x_out[j] = best_x[j];
  *best_obj_out = incumbent;
  *dual_bound_out = dual;
  *nodes_out = node_count;
  *lp_iters_out = lp_iters;
  *found_out = found;
  *status_out = status;
  if (std::getenv("HX_NATIVE_DEBUG"))
    std::fprintf(stderr,
                 "hx_mip: nodes=%lld lp_iters=%lld phase1=%lld "
                 "conflicts=%d t_prop=%.2f t_lp=%.2f\n",
                 (long long)node_count, (long long)lp_iters,
                 g_phase1_count, cfl_pool.num(), t_prop, t_lp);
  if (std::getenv("HX_NATIVE_DEBUG") && !extra_pool.empty())
    std::fprintf(stderr, "hx_mip: orbital fixings at %zu nodes\n",
                 extra_pool.size());
  delete ep;
  return 0;
}

// ---- one-shot convenience API (mirror of hx_simplex_solve) ----------------

int hx_dual_solve(int m, int n, const int64_t* Ap, const int32_t* Ai,
                  const double* Ax, const int64_t* Rp, const int32_t* Ri,
                  const double* Rx, const double* cost,
                  const double* col_lo, const double* col_up,
                  const double* row_lo, const double* row_up,
                  const int8_t* basis_in, double tol_p, double tol_d,
                  int max_iter, double time_limit_s, double* x_out,
                  double* y_out, double* z_out, int8_t* basis_out,
                  int* iter_out, int* status_out) {
  Engine* e = build_engine(m, n, Ap, Ai, Ax, Rp, Ri, Rx, cost, col_lo,
                           col_up, row_lo, row_up);
  set_basis_from(*e, basis_in);
  int iters = 0;
  // Cost perturbation for the cold general-LP solve (reference
  // HEkkDual cost perturbation): a tiny status-aligned jitter breaks
  // dual-degenerate ties that otherwise cycle (stair) or mis-certify
  // (greenbea).  Removed afterwards; a clean warm re-solve restores
  // the true optimum in a handful of pivots.
  std::vector<double> c_save(e->cost);
  uint64_t rs = 0x9e3779b97f4a7c15ULL;
  for (int j = 0; j < e->nv; ++j) {
    rs ^= rs << 13;
    rs ^= rs >> 7;
    rs ^= rs << 17;
    const double r01 = (double)(rs & 0xffffff) / (double)0x1000000;
    const double mag =
        1e-7 * (std::fabs(e->cost[j]) + 1e-3) * (0.5 + r01);
    if (e->stat[j] == kLower)
      e->cost[j] += mag;
    else if (e->stat[j] == kUpper)
      e->cost[j] -= mag;
  }
  int res = engine_solve_phase1(*e, tol_p, tol_d, max_iter,
                                time_limit_s, &iters, kInf);
  e->cost = c_save;
  e->d_valid = false;
  if (res == kOptimal || res == kInfeasible || res == kIterLimit) {
    // clean re-solve from the final basis with the true costs
    int it2 = 0;
    const int res2 = engine_solve_phase1(
        *e, tol_p, tol_d, max_iter, time_limit_s, &it2, kInf);
    iters += it2;
    res = res2;
  }
  export_solution(*e, x_out, y_out, z_out, basis_out);
  *iter_out = iters;
  *status_out = res;
  delete e;
  return 0;
}

}  // extern "C"
