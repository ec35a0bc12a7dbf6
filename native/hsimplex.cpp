// Bounded-variable revised simplex (primal), sparse LU basis kernel.
//
// Native cleanup/crossover stage of the highs_tpu framework: the
// reference keeps its simplex in C++ (highs/simplex/HEkk*, util/HFactor)
// because the pivot loop is strictly sequential and latency-bound —
// exactly the part that does not map to TPU (SURVEY §3.1).
//
// - problem:  min c'x  s.t.  L <= Ax <= U, l <= x <= u, posed over the
//   augmented system W = [A, -I] with logical (slack) variables holding
//   the row bounds, so every basis is square in R^{m x m};
// - basis kernel: sparse left-looking LU with threshold partial
//   pivoting and nnz column preordering (the role of HFactor::build,
//   highs/util/HFactor.h:204), sparse column-wise L/U triangular
//   solves for FTRAN/BTRAN (:481-487), and product-form eta updates
//   between periodic refactorizations (the PF update form, :492-503);
// - phase 1: piecewise-linear minimization of primal infeasibility
//   (composite subcosts -1/0/+1), phase 2: Dantzig pricing with a
//   bounded-variable Harris-lite ratio test and bound flips;
// - warm start from a caller-provided basis status vector (e.g. from
//   an interior-point crossover guess).
//
// C ABI only (used from Python via ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <cstdio>
#include <chrono>
#include <queue>
#include <utility>
#include <functional>

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
};

// Sparse LU of the basis with product-form eta updates.
//
// Columns are factorized in nnz-increasing order (logicals first), each
// by a left-looking elimination against the L columns built so far with
// threshold-free max-magnitude pivoting over the unassigned rows.
// FTRAN/BTRAN are column-wise sparse triangular solves; between
// refactorizations pivots append eta vectors (basis-position indexed).
struct SparseLU {
  int m = 0;
  // L: strictly-below-pivot entries, column-wise (unit diagonal)
  std::vector<int> Lstart, Lrow;
  std::vector<double> Lval;
  // U: off-diagonal entries reference earlier processing POSITIONS
  std::vector<int> Ustart, Upos;
  std::vector<double> Uval, Upiv;
  std::vector<int> pivrow;   // processing position -> original row
  std::vector<int> posofp;   // basis position -> processing position
  std::vector<int> qcol;     // processing position -> basis position

  struct Eta {
    int p;                   // pivotal basis position
    double piv;
    std::vector<int> idx;    // non-pivot basis positions
    std::vector<double> val;
  };
  std::vector<Eta> etas;

  void clear() {
    Lstart.assign(1, 0); Lrow.clear(); Lval.clear();
    Ustart.assign(1, 0); Upos.clear(); Uval.clear(); Upiv.clear();
    pivrow.clear(); posofp.assign(m, -1); qcol.clear();
    etas.clear();
  }
};

struct Workspace {
  int m, n, nv;  // rows, structural cols, total vars (n + m)
  const int64_t* Ap;
  const int32_t* Ai;
  const double* Ax;
  std::vector<double> cost, lo, up;
  std::vector<int8_t> stat;   // per variable
  std::vector<int32_t> basic; // basic variable per basis position, size m
  SparseLU lu;
  std::vector<double> xval;   // values of all variables
  std::vector<double> work_col, work_row, work_m;

  // column j of W = [A, -I] applied: y += alpha * W_j
  void axpy_col(int j, double alpha, double* y) const {
    if (alpha == 0.0) return;
    if (j < n) {
      for (int64_t k = Ap[j]; k < Ap[j + 1]; ++k) y[Ai[k]] += alpha * Ax[k];
    } else {
      y[j - n] -= alpha;
    }
  }
  // dot of W_j with vector v
  double dot_col(int j, const double* v) const {
    if (j < n) {
      double s = 0.0;
      for (int64_t k = Ap[j]; k < Ap[j + 1]; ++k) s += Ax[k] * v[Ai[k]];
      return s;
    }
    return -v[j - n];
  }
};

// Sparse left-looking LU of the basis (role of HFactor::build).  On
// rank deficiency *fail_pos reports the dependent BASIS POSITION for
// repair by the caller.
bool refactor_once(Workspace& w, int* fail_pos) {
  const int m = w.m;
  SparseLU& lu = w.lu;
  lu.m = m;
  lu.clear();

  // nnz-increasing column preorder (logicals = 1 nnz go first; the
  // reference's triangle/singleton detection achieves the same effect)
  std::vector<int> order(m);
  std::vector<int> nnz(m);
  for (int p = 0; p < m; ++p) {
    order[p] = p;
    int j = w.basic[p];
    nnz[p] = (j < w.n) ? static_cast<int>(w.Ap[j + 1] - w.Ap[j]) : 1;
  }
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return nnz[a] < nnz[b]; });

  std::vector<double> work(m, 0.0);
  std::vector<int> touched;
  touched.reserve(64);
  std::vector<char> intouch(m, 0);
  std::vector<int> rowassigned(m, -1);  // original row -> position

  lu.pivrow.resize(m);
  lu.qcol.resize(m);
  lu.Upiv.resize(m);

  auto touch = [&](int r) {
    if (!intouch[r]) {
      intouch[r] = 1;
      touched.push_back(r);
    }
  };

  for (int pos = 0; pos < m; ++pos) {
    const int p = order[pos];
    const int j = w.basic[p];
    lu.qcol[pos] = p;
    // scatter W_j
    touched.clear();
    if (j < w.n) {
      for (int64_t k = w.Ap[j]; k < w.Ap[j + 1]; ++k) {
        work[w.Ai[k]] = w.Ax[k];
        touch(w.Ai[k]);
      }
    } else {
      work[j - w.n] = -1.0;
      touch(j - w.n);
    }
    // left-looking elimination against earlier columns; also collect
    // fill-in rows so work[] can be reset exactly
    for (int pos2 = 0; pos2 < pos; ++pos2) {
      const double t = work[lu.pivrow[pos2]];
      if (t == 0.0) continue;
      for (int k = lu.Lstart[pos2]; k < lu.Lstart[pos2 + 1]; ++k) {
        const int r = lu.Lrow[k];
        touch(r);
        work[r] -= lu.Lval[k] * t;
      }
    }
    // U column: entries at already-pivotal rows
    for (int r : touched) {
      const int pos2 = rowassigned[r];
      if (pos2 >= 0 && work[r] != 0.0) {
        lu.Upos.push_back(pos2);
        lu.Uval.push_back(work[r]);
      }
    }
    lu.Ustart.push_back(static_cast<int>(lu.Upos.size()));
    // pivot: max magnitude over unassigned rows
    int piv = -1;
    double best = 1e-9;
    for (int r : touched) {
      if (rowassigned[r] >= 0) continue;
      const double v = std::fabs(work[r]);
      if (v > best) { best = v; piv = r; }
    }
    if (piv < 0) {
      for (int r : touched) {
        work[r] = 0.0;
        intouch[r] = 0;
      }
      *fail_pos = p;
      return false;
    }
    const double d = work[piv];
    lu.Upiv[pos] = d;
    lu.pivrow[pos] = piv;
    rowassigned[piv] = pos;
    // L column: remaining unassigned rows scaled by the pivot
    for (int r : touched) {
      if (rowassigned[r] >= 0 || r == piv) continue;
      const double v = work[r];
      if (std::fabs(v) > 1e-14 * std::fabs(d)) {
        lu.Lrow.push_back(r);
        lu.Lval.push_back(v / d);
      }
    }
    lu.Lstart.push_back(static_cast<int>(lu.Lrow.size()));
    for (int r : touched) {
      work[r] = 0.0;
      intouch[r] = 0;
    }
  }
  lu.posofp.assign(m, -1);
  for (int pos = 0; pos < m; ++pos) lu.posofp[lu.qcol[pos]] = pos;
  return true;
}

// base-LU FTRAN: x (basis-position indexed) with B0 x = b (row indexed);
// b is consumed as workspace
void lu_ftran_base(const Workspace& w, double* b, double* x) {
  const SparseLU& lu = w.lu;
  const int m = lu.m;
  // L solve (forward over processing positions)
  for (int pos = 0; pos < m; ++pos) {
    const double t = b[lu.pivrow[pos]];
    if (t == 0.0) continue;
    for (int k = lu.Lstart[pos]; k < lu.Lstart[pos + 1]; ++k)
      b[lu.Lrow[k]] -= lu.Lval[k] * t;
  }
  // U solve (backward); acc[pos] starts as the eliminated rhs.  The
  // column-wise U entries push contributions of x_pos to earlier rows:
  // note L/Upiv scaling makes U's diagonal Upiv and the U entries were
  // recorded UNSCALED, so divide at the end.
  std::vector<double>& acc = const_cast<Workspace&>(w).work_m;
  acc.resize(m);
  for (int pos = 0; pos < m; ++pos) acc[pos] = b[lu.pivrow[pos]];
  for (int pos = m - 1; pos >= 0; --pos) {
    const double xv = acc[pos] / lu.Upiv[pos];
    x[lu.qcol[pos]] = xv;
    if (xv == 0.0) continue;
    for (int k = lu.Ustart[pos]; k < lu.Ustart[pos + 1]; ++k)
      acc[lu.Upos[k]] -= lu.Uval[k] * xv;
  }
}

// base-LU BTRAN: y (row indexed) with B0' y = e (basis-position indexed)
void lu_btran_base(const Workspace& w, const double* e, double* y) {
  const SparseLU& lu = w.lu;
  const int m = lu.m;
  // U' z = e_q (forward over positions; off-diag entries are at earlier
  // positions, already solved)
  std::vector<double>& z = const_cast<Workspace&>(w).work_m;
  z.resize(m);
  for (int pos = 0; pos < m; ++pos) {
    double s = e[lu.qcol[pos]];
    for (int k = lu.Ustart[pos]; k < lu.Ustart[pos + 1]; ++k)
      s -= lu.Uval[k] * z[lu.Upos[k]];
    z[pos] = s / lu.Upiv[pos];
  }
  // L' w = z (backward); output on original rows
  for (int i = 0; i < m; ++i) y[i] = 0.0;
  for (int pos = 0; pos < m; ++pos) y[lu.pivrow[pos]] = z[pos];
  for (int pos = m - 1; pos >= 0; --pos) {
    double s = y[lu.pivrow[pos]];
    for (int k = lu.Lstart[pos]; k < lu.Lstart[pos + 1]; ++k)
      s -= lu.Lval[k] * y[lu.Lrow[k]];
    y[lu.pivrow[pos]] = s;
  }
}

bool refactor(Workspace& w) {
  for (int attempt = 0; attempt <= w.m; ++attempt) {
    int fail_pos = -1;
    if (refactor_once(w, &fail_pos)) return true;
    // basis repair: demote the dependent basic, bring in a free logical
    int jd = w.basic[fail_pos];
    bool lo_fin = w.lo[jd] > -kInf;
    bool up_fin = w.up[jd] < kInf;
    w.stat[jd] = lo_fin ? kLower : (up_fin ? kUpper : kZero);
    int replacement = -1;
    for (int k = 0; k < w.m; ++k) {
      int i = (fail_pos + attempt + k) % w.m;  // rotate to avoid cycles
      int cand = w.n + i;
      if (cand != jd && w.stat[cand] != kBasic) { replacement = cand; break; }
    }
    if (replacement < 0) return false;
    w.stat[replacement] = kBasic;
    w.basic[fail_pos] = replacement;
  }
  return false;
}

// apply accumulated eta updates (FTRAN direction):
// B_new = B_old E  =>  B_new^{-1} v = E^{-1} B_old^{-1} v
void apply_etas_ftran(const Workspace& w, double* x) {
  for (const auto& e : w.lu.etas) {
    const double xp = x[e.p] / e.piv;
    x[e.p] = xp;
    if (xp == 0.0) continue;
    for (size_t k = 0; k < e.idx.size(); ++k)
      x[e.idx[k]] -= e.val[k] * xp;
  }
}

// apply eta transposes in reverse (BTRAN direction)
void apply_etas_btran(const Workspace& w, double* e_vec) {
  for (auto it = w.lu.etas.rbegin(); it != w.lu.etas.rend(); ++it) {
    double s = e_vec[it->p];
    for (size_t k = 0; k < it->idx.size(); ++k)
      s -= it->val[k] * e_vec[it->idx[k]];
    e_vec[it->p] = s / it->piv;
  }
}

// ftran: alpha = B^{-1} * W_j  (basis-position indexed)
void ftran(const Workspace& w, int j, double* alpha) {
  const int m = w.m;
  std::vector<double>& col = const_cast<Workspace&>(w).work_col;
  col.assign(m, 0.0);
  const_cast<Workspace&>(w).axpy_col(j, 1.0, col.data());
  lu_ftran_base(w, col.data(), alpha);
  apply_etas_ftran(w, alpha);
}

// btran: y = (B^{-1})' * e  given e over basis positions; y over rows
void btran_dense(const Workspace& w, const double* e, double* y) {
  const int m = w.m;
  std::vector<double>& ework = const_cast<Workspace&>(w).work_row;
  ework.assign(e, e + m);
  apply_etas_btran(w, ework.data());
  lu_btran_base(w, ework.data(), y);
}

// recompute basic variable values: W_B x_B = -W_N x_N  (rhs b = 0)
void compute_basics(Workspace& w) {
  const int m = w.m;
  std::vector<double> rhs(m, 0.0);
  for (int j = 0; j < w.nv; ++j) {
    if (w.stat[j] == kBasic) continue;
    double v = 0.0;
    if (w.stat[j] == kLower) v = w.lo[j];
    else if (w.stat[j] == kUpper) v = w.up[j];
    w.xval[j] = v;
    w.axpy_col(j, -v, rhs.data());
  }
  std::vector<double> xb(m);
  lu_ftran_base(w, rhs.data(), xb.data());
  apply_etas_ftran(w, xb.data());
  for (int p = 0; p < m; ++p) w.xval[w.basic[p]] = xb[p];
}

// product-form eta update after basic position p gets the column whose
// ftran result is alpha (alpha[p] is the pivot element) — the PF update
// form of HFactor (HFactor.h:492-503)
void update_binv(Workspace& w, int p, const double* alpha) {
  const int m = w.m;
  SparseLU::Eta e;
  e.p = p;
  e.piv = alpha[p];
  for (int r = 0; r < m; ++r) {
    if (r == p || alpha[r] == 0.0) continue;
    if (std::fabs(alpha[r]) > 1e-14) {
      e.idx.push_back(r);
      e.val.push_back(alpha[r]);
    }
  }
  w.lu.etas.push_back(std::move(e));
}

struct PricingResult {
  int j = -1;
  int dir = 0;  // +1 increase, -1 decrease
  double score = 0.0;
  double zabs = 0.0;  // |reduced cost| of the chosen column
};

}  // namespace

extern "C" {

// Feasibility Jump primal heuristic (native counterpart of the
// reference's vendored highs/mip/feasibilityjump.hh; the Python
// version spent seconds per call in its per-move breakpoint scans).
// Weighted-violation local search: each move sets one variable of a
// violated row to the value minimizing the weighted violation along
// its coordinate; stuck => bump the weights of violated rows.
//
// Cp/Ci/Cx: CSC of A; Rp/Ri/Rx: CSR.  lo/up are finite-clipped column
// bounds; rl/ru row bounds (+-inf allowed).  x holds the start point
// and receives the solution.  Returns 1 when row-feasible (integers
// integral), else 0.
int hx_feasibility_jump(
    int m, int n, const int64_t* Cp, const int32_t* Ci, const double* Cx,
    const int64_t* Rp, const int32_t* Ri, const double* Rx,
    const double* rl, const double* ru, const double* lo,
    const double* up, const double* cost, const int8_t* is_int,
    double feastol, int max_moves, double time_budget_s, uint64_t seed,
    double* x) {
  const auto t_end = std::chrono::steady_clock::now() +
                     std::chrono::duration_cast<
                         std::chrono::steady_clock::duration>(
                         std::chrono::duration<double>(time_budget_s));
  // xorshift64* PRNG (deterministic given seed)
  uint64_t rstate = seed * 2685821657736338717ULL + 1;
  auto rnd01 = [&]() {
    rstate ^= rstate >> 12;
    rstate ^= rstate << 25;
    rstate ^= rstate >> 27;
    return double((rstate * 2685821657736338717ULL) >> 11) *
           (1.0 / 9007199254740992.0);
  };
  std::vector<double> act(m, 0.0), w(m, 1.0), viol(m, 0.0);
  for (int j = 0; j < n; ++j) {
    if (is_int[j]) x[j] = std::max(lo[j], std::min(up[j],
                                                   std::round(x[j])));
    else x[j] = std::max(lo[j], std::min(up[j], x[j]));
    for (int64_t k = Cp[j]; k < Cp[j + 1]; ++k)
      act[Ci[k]] += Cx[k] * x[j];
  }
  auto row_viol = [&](int i, double a) {
    double v = 0.0;
    if (rl[i] > -kInf && a < rl[i]) v += rl[i] - a;
    if (ru[i] < kInf && a > ru[i]) v += a - ru[i];
    return v;
  };
  for (int i = 0; i < m; ++i) viol[i] = row_viol(i, act[i]);
  double cscale = 0.0;
  for (int j = 0; j < n; ++j) cscale = std::max(cscale,
                                                std::fabs(cost[j]));
  const double obj_w = 1e-4 / (1.0 + cscale);
  std::vector<double> cands;
  std::vector<int32_t> perm;
  for (int move = 0; move < max_moves; ++move) {
    if ((move & 255) == 0 &&
        std::chrono::steady_clock::now() > t_end)
      return 0;
    // pick a violated row: max w*viol*(0.5+rand)
    int ibest = -1;
    double sbest = 0.0;
    bool any = false;
    for (int i = 0; i < m; ++i) {
      if (viol[i] > feastol) {
        any = true;
        double s = w[i] * viol[i] * (0.5 + rnd01());
        if (s > sbest) { sbest = s; ibest = i; }
      }
    }
    if (!any) {
      for (int j = 0; j < n; ++j)
        if (is_int[j]) x[j] = std::round(x[j]);
      return 1;
    }
    const int i = ibest;
    // variables of row i in random order
    perm.clear();
    for (int64_t k = Rp[i]; k < Rp[i + 1]; ++k) perm.push_back(Ri[k]);
    for (size_t a_ = perm.size(); a_ > 1; --a_) {
      size_t b_ = size_t(rnd01() * a_);
      if (b_ >= a_) b_ = a_ - 1;
      std::swap(perm[a_ - 1], perm[b_]);
    }
    bool improved = false;
    for (int32_t j : perm) {
      // candidate breakpoints along coordinate j
      cands.clear();
      cands.push_back(x[j]);
      cands.push_back(lo[j]);
      cands.push_back(up[j]);
      for (int64_t k = Cp[j]; k < Cp[j + 1]; ++k) {
        const int r = Ci[k];
        const double v = Cx[k];
        if (v == 0.0) continue;
        const double base = act[r] - v * x[j];
        if (rl[r] > -kInf) {
          double t = (rl[r] - base) / v;
          if (std::isfinite(t)) cands.push_back(t);
        }
        if (ru[r] < kInf) {
          double t = (ru[r] - base) / v;
          if (std::isfinite(t)) cands.push_back(t);
        }
      }
      // clip; integers round both ways
      size_t ncand = cands.size();
      if (is_int[j]) {
        for (size_t k = 0; k < ncand; ++k) {
          double c = std::max(lo[j], std::min(up[j], cands[k]));
          cands[k] = std::floor(c);
          cands.push_back(std::ceil(c));
        }
      }
      double best_v = x[j];
      double best_score = 1e300;
      for (double c : cands) {
        c = std::max(lo[j], std::min(up[j], c));
        if (is_int[j]) c = std::round(c);
        // score: weighted violation of affected rows + objective tie
        double score = obj_w * cost[j] * c;
        for (int64_t k = Cp[j]; k < Cp[j + 1]; ++k) {
          const int r = Ci[k];
          const double na = act[r] + Cx[k] * (c - x[j]);
          score += w[r] * row_viol(r, na);
        }
        if (score < best_score - 1e-12) {
          best_score = score;
          best_v = c;
        }
      }
      if (std::fabs(best_v - x[j]) < 1e-12) continue;
      // accept only if the weighted violation strictly improves
      double old_s = 0.0, new_s = 0.0;
      for (int64_t k = Cp[j]; k < Cp[j + 1]; ++k) {
        const int r = Ci[k];
        old_s += w[r] * viol[r];
        new_s += w[r] * row_viol(r, act[r] + Cx[k] * (best_v - x[j]));
      }
      if (new_s < old_s - 1e-12) {
        for (int64_t k = Cp[j]; k < Cp[j + 1]; ++k) {
          const int r = Ci[k];
          act[r] += Cx[k] * (best_v - x[j]);
          viol[r] = row_viol(r, act[r]);
        }
        x[j] = best_v;
        improved = true;
        break;
      }
    }
    if (!improved) {
      for (int i2 = 0; i2 < m; ++i2)
        if (viol[i2] > feastol) w[i2] += 1.0;
    }
  }
  return 0;
}

// Worklist-based activity-bound propagation over CSR rows (the native
// counterpart of highs/mip/HighsDomain.cpp row propagation; the MIP
// node loop calls this tens of thousands of times, so it lives next to
// the native simplex rather than in numpy).
//
// Rp/Ri/Rx: CSR of A (m x n); row_lo/row_up row bounds; lo/up column
// bounds tightened IN PLACE.  is_int marks integer columns (rounding).
// seed_cols/n_seed: columns whose bounds changed since the last call —
// only their rows enter the initial worklist (n_seed < 0: all rows).
// Returns 1 feasible, 0 infeasible.
int hx_propagate(int m, int n, const int64_t* Rp, const int32_t* Ri,
                 const double* Rx, const double* row_lo,
                 const double* row_up, const int8_t* is_int,
                 double feastol, int max_rounds, const int32_t* seed_cols,
                 int n_seed, double* lo, double* up) {
  if (m == 0) {
    for (int j = 0; j < n; ++j)
      if (lo[j] > up[j] + feastol) return 0;
    return 1;
  }
  // col -> rows adjacency (CSC pattern) built per call: O(nnz)
  const int64_t nnz = Rp[m];
  std::vector<int32_t> col_cnt(n + 1, 0);
  for (int64_t k = 0; k < nnz; ++k) col_cnt[Ri[k] + 1]++;
  for (int j = 0; j < n; ++j) col_cnt[j + 1] += col_cnt[j];
  std::vector<int32_t> col_rows(nnz);
  {
    std::vector<int32_t> fill(col_cnt.begin(), col_cnt.end() - 1);
    for (int i = 0; i < m; ++i)
      for (int64_t k = Rp[i]; k < Rp[i + 1]; ++k)
        col_rows[fill[Ri[k]]++] = i;
  }
  std::vector<uint8_t> in_queue(m, 0);
  std::vector<int32_t> queue;
  queue.reserve(m);
  auto enqueue_row = [&](int i) {
    if (!in_queue[i]) {
      in_queue[i] = 1;
      queue.push_back(i);
    }
  };
  auto enqueue_col = [&](int j) {
    for (int32_t k = col_cnt[j]; k < col_cnt[j + 1]; ++k)
      enqueue_row(col_rows[k]);
  };
  if (n_seed < 0) {
    for (int i = 0; i < m; ++i) enqueue_row(i);
  } else {
    for (int s = 0; s < n_seed; ++s) {
      int j = seed_cols[s];
      if (j >= 0 && j < n) enqueue_col(j);
    }
  }
  // termination guard: each row processed at most max_rounds*4 times
  const int64_t budget =
      static_cast<int64_t>(m) * (max_rounds > 0 ? max_rounds : 8) * 4;
  int64_t processed = 0;
  size_t head = 0;
  while (head < queue.size()) {
    if (processed++ > budget) break;
    const int i = queue[head++];
    in_queue[i] = 0;
    if (head > 4096 && head * 2 > queue.size()) {
      queue.erase(queue.begin(), queue.begin() + head);
      head = 0;
    }
    const double rl = row_lo[i], ru = row_up[i];
    const bool has_rl = rl > -kInf, has_ru = ru < kInf;
    if (!has_rl && !has_ru) continue;
    // row activity bounds with infinite-contribution counts
    double minact = 0.0, maxact = 0.0;
    int n_min_inf = 0, n_max_inf = 0;
    for (int64_t k = Rp[i]; k < Rp[i + 1]; ++k) {
      const int j = Ri[k];
      const double v = Rx[k];
      const double lj = lo[j], uj = up[j];
      if (v > 0) {
        if (lj <= -kInf) n_min_inf++; else minact += v * lj;
        if (uj >= kInf) n_max_inf++; else maxact += v * uj;
      } else {
        if (uj >= kInf) n_min_inf++; else minact += v * uj;
        if (lj <= -kInf) n_max_inf++; else maxact += v * lj;
      }
    }
    // row infeasible?
    if (has_ru && n_min_inf == 0 &&
        minact > ru + feastol * (1.0 + std::fabs(ru)))
      return 0;
    if (has_rl && n_max_inf == 0 &&
        maxact < rl - feastol * (1.0 + std::fabs(rl)))
      return 0;
    // per-entry implied bounds
    for (int64_t k = Rp[i]; k < Rp[i + 1]; ++k) {
      const int j = Ri[k];
      const double v = Rx[k];
      const double lj = lo[j], uj = up[j];
      // x_j's own contribution to minact / maxact
      double cmin, cmax;
      int jmin_inf, jmax_inf;
      if (v > 0) {
        jmin_inf = (lj <= -kInf);
        jmax_inf = (uj >= kInf);
        cmin = jmin_inf ? 0.0 : v * lj;
        cmax = jmax_inf ? 0.0 : v * uj;
      } else {
        jmin_inf = (uj >= kInf);
        jmax_inf = (lj <= -kInf);
        cmin = jmin_inf ? 0.0 : v * uj;
        cmax = jmax_inf ? 0.0 : v * lj;
      }
      const int other_min_inf = n_min_inf - jmin_inf;
      const int other_max_inf = n_max_inf - jmax_inf;
      const double minact_o = minact - cmin;
      const double maxact_o = maxact - cmax;
      double ub_new = kInf, lb_new = -kInf;
      if (v > 0) {
        if (other_min_inf == 0 && has_ru) ub_new = (ru - minact_o) / v;
        if (other_max_inf == 0 && has_rl) lb_new = (rl - maxact_o) / v;
      } else {
        if (other_max_inf == 0 && has_rl) ub_new = (rl - maxact_o) / v;
        if (other_min_inf == 0 && has_ru) lb_new = (ru - minact_o) / v;
      }
      bool changed = false;
      if (ub_new < kInf) {
        double cand = ub_new + feastol;
        if (is_int[j]) {
          cand = std::floor(ub_new + feastol);
          if (cand < uj - 0.5) changed = true;
        } else if (cand < uj - 1e-9 * (1.0 + (uj < kInf ?
                                              std::fabs(uj) : 0.0))) {
          changed = true;
        }
        if (changed) up[j] = cand;
      }
      bool changed_lo = false;
      if (lb_new > -kInf) {
        double cand = lb_new - feastol;
        if (is_int[j]) {
          cand = std::ceil(lb_new - feastol);
          if (cand > lj + 0.5) changed_lo = true;
        } else if (cand > lj + 1e-9 * (1.0 + (lj > -kInf ?
                                              std::fabs(lj) : 0.0))) {
          changed_lo = true;
        }
        if (changed_lo) lo[j] = cand;
      }
      if (changed || changed_lo) {
        if (lo[j] > up[j] + feastol) return 0;
        enqueue_col(j);
      }
    }
  }
  for (int j = 0; j < n; ++j)
    if (lo[j] > up[j] + feastol) return 0;
  return 1;
}

// status_out: 0 optimal, 1 infeasible, 2 unbounded, 3 iter limit,
// 4 singular
int hx_simplex_solve(int m, int n, const int64_t* Ap, const int32_t* Ai,
                     const double* Ax, const double* cost,
                     const double* col_lo, const double* col_up,
                     const double* row_lo, const double* row_up,
                     const int8_t* basis_in, double tol_p, double tol_d,
                     int max_iter, double time_limit_s, double* x_out,
                     double* y_out, double* z_out, int8_t* basis_out,
                     int* iter_out, int* status_out) {
  const auto t_start = std::chrono::steady_clock::now();
  auto out_of_time = [&]() {
    if (time_limit_s <= 0.0 || time_limit_s > 1e19) return false;
    const std::chrono::duration<double> el =
        std::chrono::steady_clock::now() - t_start;
    return el.count() > time_limit_s;
  };
  Workspace w;
  w.m = m;
  w.n = n;
  w.nv = n + m;
  w.Ap = Ap;
  w.Ai = Ai;
  w.Ax = Ax;
  w.cost.assign(w.nv, 0.0);
  w.lo.resize(w.nv);
  w.up.resize(w.nv);
  for (int j = 0; j < n; ++j) {
    w.cost[j] = cost[j];
    w.lo[j] = col_lo[j] <= -kInf ? -kInf : col_lo[j];
    w.up[j] = col_up[j] >= kInf ? kInf : col_up[j];
  }
  for (int i = 0; i < m; ++i) {
    // logical variable s_i = (Ax)_i with bounds [L_i, U_i]
    w.lo[n + i] = row_lo[i] <= -kInf ? -kInf : row_lo[i];
    w.up[n + i] = row_up[i] >= kInf ? kInf : row_up[i];
  }
  w.stat.assign(w.nv, kLower);
  w.basic.resize(m);
  w.xval.assign(w.nv, 0.0);

  // ---- initial basis ----------------------------------------------------
  bool have_warm = basis_in != nullptr;
  int n_basic = 0;
  if (have_warm) {
    for (int j = 0; j < w.nv; ++j) {
      w.stat[j] = basis_in[j];
      if (w.stat[j] == kBasic) {
        if (n_basic < m) w.basic[n_basic++] = j;
        else w.stat[j] = kLower;  // too many basics: demote
      }
      // sanitize: a nonbasic status pointing at an infinite bound
      // would park the variable at +-kInf
      if (w.stat[j] == kLower && w.lo[j] <= -kInf)
        w.stat[j] = (w.up[j] < kInf) ? kUpper : kZero;
      else if (w.stat[j] == kUpper && w.up[j] >= kInf)
        w.stat[j] = (w.lo[j] > -kInf) ? kLower : kZero;
    }
    // fill with logicals if short
    for (int i = 0; i < m && n_basic < m; ++i) {
      if (w.stat[n + i] != kBasic) {
        w.stat[n + i] = kBasic;
        w.basic[n_basic++] = n + i;
      }
    }
  }
  if (!have_warm || n_basic != m) {
    for (int j = 0; j < w.nv; ++j) {
      bool lo_fin = w.lo[j] > -kInf;
      bool up_fin = w.up[j] < kInf;
      w.stat[j] = lo_fin ? kLower : (up_fin ? kUpper : kZero);
    }
    for (int i = 0; i < m; ++i) {
      w.stat[n + i] = kBasic;
      w.basic[i] = n + i;
    }
  }
  if (!refactor(w)) {
    // fall back to the all-logical basis
    for (int j = 0; j < w.nv; ++j) {
      bool lo_fin = w.lo[j] > -kInf;
      bool up_fin = w.up[j] < kInf;
      w.stat[j] = lo_fin ? kLower : (up_fin ? kUpper : kZero);
    }
    for (int i = 0; i < m; ++i) {
      w.stat[n + i] = kBasic;
      w.basic[i] = n + i;
    }
    if (!refactor(w)) {
      *status_out = kSingular;
      return 0;
    }
  }
  compute_basics(w);

  std::vector<double> pi(m), alpha(m), e(m), zvec(w.nv);
  int iters = 0;
  int since_refactor = 0;
  int result = kIterLimit;

  auto basic_pos = [&](int j) -> int {
    for (int p = 0; p < m; ++p)
      if (w.basic[p] == j) return p;
    return -1;
  };

  // ---- dual simplex phase (reference HEkkDual; simplex_strategy
  // default = dual): a warm basis after bound changes stays DUAL
  // feasible while turning primal infeasible — exactly the MIP node
  // hot-start shape.  Run dual pivots (leaving = most primal-infeasible
  // basic, entering = min dual ratio on the BTRAN pivot row) until
  // primal feasible, then fall through to the primal loop to confirm.
  if (have_warm) {
    auto ptol_d = [&](int j) {
      double s = 1.0;
      if (w.lo[j] > -kInf) s = std::max(s, std::fabs(w.lo[j]));
      if (w.up[j] < kInf) s = std::max(s, std::fabs(w.up[j]));
      return tol_p * s;
    };
    // dual feasibility check with true costs
    for (int p = 0; p < m; ++p) e[p] = w.cost[w.basic[p]];
    btran_dense(w, e.data(), pi.data());
    bool dual_feasible = true;
    for (int j = 0; j < w.nv && dual_feasible; ++j) {
      if (w.stat[j] == kBasic || w.up[j] - w.lo[j] <= 0.0) continue;
      const double zj = w.cost[j] - w.dot_col(j, pi.data());
      if (w.stat[j] == kLower && zj < -1e3 * tol_d) dual_feasible = false;
      else if (w.stat[j] == kUpper && zj > 1e3 * tol_d)
        dual_feasible = false;
      else if (w.stat[j] == kZero && std::fabs(zj) > 1e3 * tol_d)
        dual_feasible = false;
    }
    int dual_budget = 4 * m + 1000;
    std::vector<double> rho(m), arow(w.nv), zrow(w.nv);
    while (dual_feasible && iters < max_iter && dual_budget-- > 0) {
      if ((iters & 255) == 0 && out_of_time()) break;
      // leaving: most primal-infeasible basic
      int leave_p = -1;
      double worst = 0.0;
      double target = 0.0;
      for (int p = 0; p < m; ++p) {
        const int jb = w.basic[p];
        const double v = w.xval[jb];
        const double tj = 10.0 * ptol_d(jb);
        if (v < w.lo[jb] - tj && w.lo[jb] - v > worst) {
          worst = w.lo[jb] - v;
          leave_p = p;
          target = w.lo[jb];
        } else if (v > w.up[jb] + tj && v - w.up[jb] > worst) {
          worst = v - w.up[jb];
          leave_p = p;
          target = w.up[jb];
        }
      }
      if (leave_p < 0) break;  // primal feasible: dual phase done
      const int jl = w.basic[leave_p];
      const double delta = w.xval[jl] - target;
      // pivot row via BTRAN + PRICE
      std::fill(e.begin(), e.end(), 0.0);
      e[leave_p] = 1.0;
      btran_dense(w, e.data(), rho.data());
      // duals for the ratio test
      for (int p = 0; p < m; ++p) e[p] = w.cost[w.basic[p]];
      btran_dense(w, e.data(), pi.data());
      int enter_j = -1;
      double best_ratio = 1e300;
      double best_piv = 0.0;
      for (int j = 0; j < w.nv; ++j) {
        if (w.stat[j] == kBasic || w.up[j] - w.lo[j] <= 0.0) continue;
        const double aj = w.dot_col(j, rho.data());
        if (std::fabs(aj) < 1e-9) continue;
        const double dj = (w.stat[j] == kUpper) ? -aj : aj;
        // need xval[jl] to move toward target: change = -d_j * teff
        if (delta < 0 ? (dj >= 0) : (dj <= 0)) continue;
        const double zj = w.cost[j] - w.dot_col(j, pi.data());
        const double zeff = (w.stat[j] == kUpper) ? -zj : zj;
        const double ratio = std::max(zeff, 0.0) / std::fabs(dj);
        if (ratio < best_ratio - 1e-12 ||
            (ratio < best_ratio + 1e-12 &&
             std::fabs(aj) > std::fabs(best_piv))) {
          best_ratio = ratio;
          best_piv = aj;
          enter_j = j;
        }
      }
      if (enter_j < 0) {
        // dual unbounded: primal infeasible
        result = kInfeasible;
        goto finish;
      }
      ftran(w, enter_j, alpha.data());
      const double apj = alpha[leave_p];
      if (std::fabs(apj) < 1e-9) {
        // pivot row/column inconsistency: refresh and leave dual phase
        if (!refactor(w)) { result = kSingular; goto finish; }
        compute_basics(w);
        break;
      }
      const double t = delta / apj;
      for (int p = 0; p < m; ++p) w.xval[w.basic[p]] -= t * alpha[p];
      w.xval[enter_j] += t;
      ++iters;
      w.stat[jl] = (target == w.lo[jl]) ? kLower : kUpper;
      w.xval[jl] = target;
      w.stat[enter_j] = kBasic;
      w.basic[leave_p] = enter_j;
      if (std::fabs(apj) < 1e-7 || ++since_refactor >= 30) {
        if (!refactor(w)) { result = kSingular; goto finish; }
        compute_basics(w);
        since_refactor = 0;
      } else {
        update_binv(w, leave_p, alpha.data());
      }
    }
  }

  {
    // composite loop: the phase is re-derived every iteration from the
    // actual basic infeasibility, so numerical drift in the incremental
    // updates self-corrects (the reference handles this with cost
    // perturbation + cleanup solves, HEkk)
    long long check_counter = 0;
    int verify_retries = 0;
    int degen_run = 0;  // consecutive (near-)zero-step pivots
    // ---- cost perturbation (reference: HEkk cost perturbation) -------
    // deterministic xorshift noise, magnitude ~100 tol_d relative to
    // the cost scale; active in phase 2 until perturbed optimality,
    // then removed for exact cleanup iterations
    bool perturbed = true;
    std::vector<double> pert(w.nv, 0.0);
    {
      uint64_t s = 0x9E3779B97F4A7C15ull;
      for (int j = 0; j < w.nv; ++j) {
        s ^= s << 13; s ^= s >> 7; s ^= s << 17;
        const double u = 0.5 + 0.5 * double(s % 1024) / 1024.0;
        pert[j] = 100.0 * tol_d * (1.0 + std::fabs(w.cost[j])) * u;
      }
    }
    // ---- Devex reference-framework weights (reference HEkkDual devex;
    // score z^2 / weight) ----------------------------------------------
    std::vector<double> devex(w.nv, 1.0);
    int devex_resets = 0;
    // scale-relative primal tolerance: bounds in real LPs span 1e0-1e6,
    // and an absolute 1e-9 test makes phase classification flap on
    // drift, ending in false "infeasible" verdicts (the reference works
    // in scaled space + uses relative feasibility throughout)
    auto ptol = [&](int j) {
      double s = 1.0;
      if (w.lo[j] > -kInf) s = std::max(s, std::fabs(w.lo[j]));
      if (w.up[j] < kInf) s = std::max(s, std::fabs(w.up[j]));
      return tol_p * s;
    };
    while (true) {
      if (iters >= max_iter) { result = kIterLimit; goto finish; }
      if ((iters & 255) == 0 && out_of_time()) {
        result = kIterLimit;
        goto finish;
      }
      if (++check_counter % 200 == 0) {
        // periodic exact recompute to bound drift
        if (!refactor(w)) { result = kSingular; goto finish; }
        compute_basics(w);
        since_refactor = 0;
      }
      // ---- effective cost vector + phase -------------------------------
      std::vector<double> ecost(w.nv, 0.0);
      double infeas_sum = 0.0;
      for (int p = 0; p < m; ++p) {
        int j = w.basic[p];
        double v = w.xval[j];
        double tj = 10.0 * ptol(j);
        if (v < w.lo[j] - tj) infeas_sum += w.lo[j] - v;
        else if (v > w.up[j] + tj) infeas_sum += v - w.up[j];
      }
      const int phase = (infeas_sum > 0.0) ? 1 : 2;
      const char* dbg_every_s = std::getenv("HX_DEBUG_EVERY");
      const int dbg_every = dbg_every_s ? std::atoi(dbg_every_s) : 20000;
      if (std::getenv("HX_DEBUG") && iters % dbg_every == 0) {
        double obj = 0.0;
        for (int j = 0; j < w.nv; ++j) obj += w.cost[j] * w.xval[j];
        std::fprintf(stderr,
                     "hx iter=%d phase=%d infeas=%.3e obj=%.8e "
                     "degen=%d pert=%d\n",
                     iters, phase, infeas_sum, obj, degen_run,
                     int(perturbed));
      }
      if (phase == 1) {
        for (int p = 0; p < m; ++p) {
          int j = w.basic[p];
          double v = w.xval[j];
          double tj = 10.0 * ptol(j);
          if (v < w.lo[j] - tj) ecost[j] = -1.0;
          else if (v > w.up[j] + tj) ecost[j] = 1.0;
        }
      } else {
        for (int j = 0; j < w.nv; ++j) ecost[j] = w.cost[j];
        if (perturbed) {
          for (int j = 0; j < w.nv; ++j) {
            if (w.stat[j] == kLower) ecost[j] += pert[j];
            else if (w.stat[j] == kUpper) ecost[j] -= pert[j];
          }
        }
      }
      // ---- duals: pi = (B^-1)' c_B ------------------------------------
      for (int p = 0; p < m; ++p) e[p] = ecost[w.basic[p]];
      btran_dense(w, e.data(), pi.data());
      // ---- pricing: Dantzig; Bland's least-index rule after a run of
      // degenerate pivots (anti-cycling — the reference's equivalents
      // are cost perturbation + Harris ratio test, HEkkDual)
      const bool bland = degen_run > 100;
      PricingResult pr;
      for (int j = 0; j < w.nv; ++j) {
        if (w.stat[j] == kBasic) continue;
        // fixed variables (l == u) can never move: any reduced-cost
        // sign is dual-feasible for them, and "entering" one is a
        // guaranteed degenerate pivot (observed 2-cycles of fixed
        // columns swapping in and out)
        if (w.up[j] - w.lo[j] <= 0.0) continue;
        double zj = ecost[j] - w.dot_col(j, pi.data());
        int dir = 0;
        double score = 0.0;
        if (w.stat[j] == kLower || w.stat[j] == kZero) {
          if (zj < -tol_d) { dir = +1; score = -zj; }
        }
        if (dir == 0 && (w.stat[j] == kUpper || w.stat[j] == kZero)) {
          if (zj > tol_d) { dir = -1; score = zj; }
        }
        if (dir != 0) {
          if (bland) {
            pr.j = j; pr.dir = dir; pr.score = score; pr.zabs = score;
            break;
          }
          const double dscore = score * score / devex[j];
          if (dscore > pr.score) {
            pr.j = j; pr.dir = dir; pr.score = dscore; pr.zabs = score;
          }
        }
      }
      if (pr.j < 0 && phase == 2 && perturbed) {
        // optimal for the PERTURBED costs: remove the perturbation and
        // continue with exact costs (reference: perturbation removal +
        // cleanup solve)
        perturbed = false;
        continue;
      }
      if (pr.j < 0) {
        // re-verify with a fresh factorization before concluding
        if (!refactor(w)) { result = kSingular; goto finish; }
        compute_basics(w);
        double check_inf = 0.0;
        for (int p = 0; p < m; ++p) {
          int j = w.basic[p];
          double v = w.xval[j];
          double tj = 10.0 * ptol(j);
          if (v < w.lo[j] - tj) check_inf += w.lo[j] - v;
          else if (v > w.up[j] + tj) check_inf += v - w.up[j];
        }
        if (++verify_retries > 8) {
          result = (check_inf > 0.0) ? kInfeasible : kOptimal;
          goto finish;
        }
        if (phase == 1) {
          if (check_inf > 0.0) { result = kInfeasible; goto finish; }
          continue;  // actually feasible: rerun as phase 2
        }
        if (check_inf > 0.0) continue;  // drift: rerun phase 1
        result = kOptimal; goto finish;
      }
      // ---- ratio test: Harris two-pass (reference HEkkDual Harris
      // ratio test): pass 1 finds the tolerance-relaxed step limit,
      // pass 2 picks the largest-pivot blocker within it — degenerate
      // ties resolve toward numerically strong pivots instead of
      // cycling on tiny ones ---------------------------------------------
      ftran(w, pr.j, alpha.data());
      // entering moves by t*dir; basic j_p changes by -t*dir*alpha[p]
      double t_max = w.up[pr.j] - w.lo[pr.j];  // bound flip distance
      if (t_max < 0) t_max = 0;
      int leave_p = -1;
      int leave_to = kLower;
      struct RtCand { int p; double room; double a; int to; };
      std::vector<RtCand> rt_cands;
      rt_cands.reserve(32);
      for (int p = 0; p < m; ++p) {
        double a = -pr.dir * alpha[p];
        if (std::fabs(a) < 1e-9) continue;
        int jb = w.basic[p];
        double v = w.xval[jb];
        double room;
        int to;
        if (phase == 1) {
          // phase-1 blocking bound in the direction of travel only:
          // a variable already beyond the bound it is moving AWAY from
          // does not block (the old code picked that bound, got
          // negative room, clamped to 0 and then snapped the variable
          // to a bound it was not at — silently breaking Bx_B = b and
          // producing false "infeasible" verdicts)
          double tj = 10.0 * ptol(jb);
          if (a > 0) {
            double target;
            if (v < w.lo[jb] - tj) {
              target = w.lo[jb];  // rising toward its violated lower
              // second breakpoint: continuing past lo up to up makes
              // it infeasible again (slope rises by |a| there too)
              if (w.up[jb] < kInf) {
                const double room2 = (w.up[jb] - v) / a;
                if (room2 >= 0)
                  rt_cands.push_back(
                      RtCand{p, room2, std::fabs(-pr.dir * alpha[p]),
                             kUpper});
              }
            } else if (v <= w.up[jb] + tj) {
              target = w.up[jb];  // in range
            } else {
              continue;  // above up, rising further: no block
            }
            if (target >= kInf) continue;
            room = (target - v) / a;
            to = (target == w.lo[jb]) ? kLower : kUpper;
          } else {
            double target;
            if (v > w.up[jb] + tj) {
              target = w.up[jb];  // falling toward its violated upper
              if (w.lo[jb] > -kInf) {
                const double room2 = (w.lo[jb] - v) / a;
                if (room2 >= 0)
                  rt_cands.push_back(
                      RtCand{p, room2, std::fabs(-pr.dir * alpha[p]),
                             kLower});
              }
            } else if (v >= w.lo[jb] - tj) {
              target = w.lo[jb];  // in range
            } else {
              continue;  // below lo, falling further: no block
            }
            if (target <= -kInf) continue;
            room = (target - v) / a;
            to = (target == w.up[jb]) ? kUpper : kLower;
          }
        } else {
          if (a > 0) {
            if (w.up[jb] >= kInf) continue;
            room = (w.up[jb] - v) / a;
            to = kUpper;
          } else {
            if (w.lo[jb] <= -kInf) continue;
            room = (w.lo[jb] - v) / a;
            to = kLower;
          }
        }
        if (room < -tol_p) room = 0.0;
        if (room < 0) room = 0.0;
        rt_cands.push_back(RtCand{p, room, std::fabs(a), to});
      }
      if (bland) {
        // textbook Bland leaving rule: minimal room, ties broken by
        // least variable index — the combination Bland-entering +
        // Bland-leaving is provably cycle-free, which the piecewise /
        // Harris tests are not
        double t_sel = 1e31;
        int best_jb = w.nv + 1;
        int sel_p = -1, sel_to = kLower;
        for (const auto& c : rt_cands) {
          const double room = std::max(0.0, c.room);
          if (room < t_sel - 1e-12 ||
              (room <= t_sel + 1e-12 && w.basic[c.p] < best_jb)) {
            t_sel = std::min(t_sel, room);
            best_jb = w.basic[c.p];
            sel_p = c.p;
            sel_to = c.to;
          }
        }
        if (sel_p >= 0 && t_sel <= t_max) {
          leave_p = sel_p;
          leave_to = sel_to;
          t_max = t_sel;
        }
      } else if (phase == 1) {
        // piecewise-linear ratio test (composite phase 1, Maros-style):
        // keep stepping past breakpoints while the infeasibility-
        // direction slope stays negative — each passed breakpoint
        // raises the slope by its |pivot|.  This is what prevents the
        // massive tie-degeneracy of stopping at the first breakpoint.
        std::sort(rt_cands.begin(), rt_cands.end(),
                  [](const RtCand& x, const RtCand& y) {
                    return x.room < y.room;
                  });
        double flip_dist = w.up[pr.j] - w.lo[pr.j];
        if (flip_dist < 0) flip_dist = 0;
        double slope = -pr.zabs;
        double t_sel = flip_dist;  // default: bound flip
        for (const auto& c : rt_cands) {
          if (c.room > flip_dist) break;  // entering flips first
          slope += c.a;
          leave_p = c.p;
          leave_to = c.to;
          t_sel = std::max(0.0, c.room);
          if (slope >= -1e-12) break;
        }
        t_max = t_sel;
      } else {
        // Harris two-pass for phase 2
        double t_relaxed = t_max;
        for (const auto& c : rt_cands) {
          const double tol_rel = ptol(w.basic[c.p]) / c.a;
          t_relaxed = std::min(t_relaxed, c.room + tol_rel);
        }
        double best_piv = 0.0;
        for (const auto& c : rt_cands) {
          if (c.room <= t_relaxed && c.a > best_piv) {
            best_piv = c.a;
            leave_p = c.p;
            leave_to = c.to;
          }
        }
        if (leave_p >= 0) {
          double room_sel = 0.0;
          for (const auto& c : rt_cands)
            if (c.p == leave_p) { room_sel = c.room; break; }
          if (room_sel > t_max) {
            leave_p = -1;  // beyond the flip distance: flip instead
          } else {
            t_max = room_sel;
          }
        }
      }
      if (t_max >= kInf && leave_p < 0) {
        if (phase == 1) {
          // "unbounded" infeasibility reduction is impossible — this is
          // numerical drift; refresh the factorization and retry
          if (++verify_retries > 8) { result = kSingular; goto finish; }
          if (!refactor(w)) { result = kSingular; goto finish; }
          compute_basics(w);
          since_refactor = 0;
          continue;
        }
        result = kUnbounded;
        goto finish;
      }
      if (std::getenv("HX_DEBUG_PIVOTS") && iters >= 200 && iters < 240) {
        std::fprintf(stderr,
                     "piv iter=%d phase=%d j=%d dir=%d z=%.3e leave_p=%d"
                     " jl=%d to=%d t=%.3e stat_j=%d lo=%.3e up=%.3e\n",
                     iters, phase, pr.j, pr.dir, pr.zabs, leave_p,
                     leave_p >= 0 ? w.basic[leave_p] : -1, leave_to,
                     t_max, int(w.stat[pr.j]), w.lo[pr.j], w.up[pr.j]);
      }
      // ---- apply step --------------------------------------------------
      double t = pr.dir * t_max;
      for (int p = 0; p < m; ++p)
        w.xval[w.basic[p]] -= t * alpha[p];
      w.xval[pr.j] += t;
      ++iters;
      if (std::fabs(t) > 1e-12) degen_run = 0; else ++degen_run;
      if (leave_p < 0) {
        // bound flip of the entering variable
        w.stat[pr.j] = (pr.dir > 0) ? kUpper : kLower;
      } else {
        int jl = w.basic[leave_p];
        // ---- Devex weight update (Forrest-Goldfarb; reference
        // HEkkDual devex framework) before the basis changes ----------
        {
          const double apq = alpha[leave_p];
          if (std::fabs(apq) > 1e-10) {
            std::vector<double>& rho = w.work_row;
            rho.assign(m, 0.0);
            std::vector<double> ep(m, 0.0);
            ep[leave_p] = 1.0;
            btran_dense(w, ep.data(), rho.data());
            const double wq = devex[pr.j];
            const double s = wq / (apq * apq);
            for (int j2 = 0; j2 < w.nv; ++j2) {
              if (w.stat[j2] == kBasic || j2 == pr.j) continue;
              const double arow = w.dot_col(j2, rho.data());
              if (arow == 0.0) continue;
              const double cand = arow * arow * s;
              if (cand > devex[j2]) devex[j2] = cand;
            }
            devex[jl] = std::max(s, 1.0);
            double wmax = 1.0;
            for (int j2 = 0; j2 < w.nv; ++j2)
              wmax = std::max(wmax, devex[j2]);
            if (wmax > 1e8) {
              std::fill(devex.begin(), devex.end(), 1.0);
              ++devex_resets;
            }
          }
        }
        w.stat[jl] = static_cast<int8_t>(leave_to);
        w.xval[jl] = (leave_to == kLower) ? w.lo[jl] : w.up[jl];
        w.stat[pr.j] = kBasic;
        w.basic[leave_p] = pr.j;
        if (std::fabs(alpha[leave_p]) < 1e-6 ||
            ++since_refactor >= 30) {
          if (!refactor(w)) { result = kSingular; goto finish; }
          compute_basics(w);
          since_refactor = 0;
        } else {
          update_binv(w, leave_p, alpha.data());
        }
      }
    }
  }

finish:
  // ---- outputs -----------------------------------------------------------
  {
    // final duals from true costs
    for (int p = 0; p < m; ++p) e[p] = w.cost[w.basic[p]];
    btran_dense(w, e.data(), pi.data());
    for (int j = 0; j < w.nv; ++j)
      zvec[j] = w.cost[j] - w.dot_col(j, pi.data());
    for (int j = 0; j < n; ++j) {
      x_out[j] = w.xval[j];
      z_out[j] = (w.stat[j] == kBasic) ? 0.0 : zvec[j];
    }
    for (int i = 0; i < m; ++i) {
      // row dual = reduced cost of the logical (sign: c - A'y - z = 0
      // with W = [A, -I] gives y_i = -z_{n+i}... logical column is -e_i,
      // so z_logical = 0 - (-y_i) = y_i)
      y_out[i] = (w.stat[n + i] == kBasic) ? 0.0 : zvec[n + i];
    }
    if (basis_out) {
      for (int j = 0; j < w.nv; ++j) basis_out[j] = w.stat[j];
    }
    *iter_out = iters;
    *status_out = result;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Native branch-and-bound dive loop (reference: HighsSearch::dive +
// HighsNodeQueue, highs/mip/HighsSearch.cpp).  The per-node work —
// reconstruct bounds, propagate, warm-started simplex re-solve,
// pseudocost branching — is strictly scalar-sequential, which is why
// the reference keeps it in C++; the Python driver retains root
// cutting, heuristics, restarts and feeds the final relaxation here.
//
// status_out: 0 = tree exhausted (optimal / infeasible by found_out),
//             2 = node/time limit, 3 = numerical trouble (caller
//             should fall back to its own loop).
int hx_bb_solve(
    int m, int n, const int64_t* Ap, const int32_t* Ai, const double* Ax,
    const int64_t* Rp, const int32_t* Ri, const double* Rx,
    const double* cost, const double* root_lo, const double* root_up,
    const double* row_lo, const double* row_up, const int8_t* is_int,
    const int8_t* root_basis, double incumbent_obj_in,
    double obj_scale,  // s with s*cost integral; 0 = not integral
    double mip_abs_gap, double mip_rel_gap, double obj_offset,
    double root_bound_in, double feastol, double tol_p, double tol_d,
    int64_t max_nodes, double time_limit_s,
    double* best_x_out, double* best_obj_out, double* dual_bound_out,
    int64_t* nodes_out, int64_t* lp_iters_out, int* found_out,
    int* status_out) {
  const auto t_start = std::chrono::steady_clock::now();
  auto elapsed = [&]() {
    const std::chrono::duration<double> el =
        std::chrono::steady_clock::now() - t_start;
    return el.count();
  };
  struct BBNode {
    int32_t parent;   // -1 = root
    int32_t col;      // branched column (-1 at root)
    int8_t up_branch; // 1: lo[col]=val, 0: up[col]=val
    double val;
    double bound;     // proven minimization lower bound
    int32_t depth;
  };
  std::vector<BBNode> nodes;
  nodes.reserve(4096);
  // min-heap of (bound, node index)
  typedef std::pair<double, int32_t> HeapEnt;
  std::priority_queue<HeapEnt, std::vector<HeapEnt>,
                      std::greater<HeapEnt> > heap;

  double incumbent = incumbent_obj_in;
  int found = 0;
  std::vector<double> best_x(n, 0.0);

  auto prune_limit = [&]() {
    if (incumbent >= kInf) return kInf;
    double nl;
    if (obj_scale > 0.0) {
      nl = std::floor(obj_scale * incumbent - 0.5) / obj_scale;
      if (mip_rel_gap > 0.0)
        nl = std::min(nl, incumbent -
            std::ceil(mip_rel_gap * std::fabs(incumbent + obj_offset) *
                      obj_scale - 1e-9) / obj_scale);
      if (mip_abs_gap > 0.0)
        nl = std::min(nl, incumbent -
            std::ceil(mip_abs_gap * obj_scale - 1e-9) / obj_scale);
      nl += feastol;
    } else {
      double d = feastol;
      if (mip_rel_gap > 0.0)
        d = std::max(d, mip_rel_gap * std::fabs(incumbent + obj_offset));
      if (mip_abs_gap > 0.0) d = std::max(d, mip_abs_gap);
      nl = incumbent - d;
    }
    return nl;
  };

  // pseudocosts (reference HighsPseudocost)
  std::vector<double> ps_up_sum(n, 0.0), ps_dn_sum(n, 0.0);
  std::vector<int32_t> ps_up_cnt(n, 0), ps_dn_cnt(n, 0);

  std::vector<double> lo(n), up(n);
  std::vector<double> x(n), y(m), z(n);
  std::vector<int8_t> basis(n + m), dive_basis(n + m);
  bool have_dive_basis = false;
  std::vector<int8_t> rb(n + m);
  bool have_root_basis = root_basis != nullptr;
  if (have_root_basis)
    for (int j = 0; j < n + m; ++j) rb[j] = root_basis[j];

  nodes.push_back(BBNode{-1, -1, 0, 0.0,
                         root_bound_in > -kInf ? root_bound_in : -kInf,
                         0});
  heap.push(HeapEnt(nodes[0].bound, 0));

  int64_t node_count = 0;
  int64_t lp_iters = 0;
  int status = 0;
  int32_t plunge = -1;  // node to process next without popping

  while (plunge >= 0 || !heap.empty()) {
    if (elapsed() > time_limit_s || node_count >= max_nodes) {
      status = 2;
      break;
    }
    int32_t cur;
    if (plunge >= 0) {
      cur = plunge;
      plunge = -1;
    } else {
      cur = heap.top().second;
      heap.pop();
      have_dive_basis = false;  // popped: dive basis no longer matches
    }
    if (nodes[cur].bound > prune_limit()) continue;

    // ---- reconstruct bounds by walking the ancestry ------------------
    for (int j = 0; j < n; ++j) {
      lo[j] = root_lo[j];
      up[j] = root_up[j];
    }
    for (int32_t a = cur; a >= 0; a = nodes[a].parent) {
      if (nodes[a].col >= 0) {
        if (nodes[a].up_branch) {
          if (nodes[a].val > lo[nodes[a].col]) lo[nodes[a].col] =
              nodes[a].val;
        } else {
          if (nodes[a].val < up[nodes[a].col]) up[nodes[a].col] =
              nodes[a].val;
        }
      }
    }

    // ---- propagate ----------------------------------------------------
    node_count++;
    if (!hx_propagate(m, n, Rp, Ri, Rx, row_lo, row_up, is_int,
                      feastol, 8, nullptr, -1, lo.data(), up.data()))
      continue;  // infeasible by propagation

    // ---- node LP (warm within a dive, root basis otherwise) -----------
    const int8_t* warm = have_dive_basis ? dive_basis.data()
                         : (have_root_basis ? rb.data() : nullptr);
    int iters = 0, res = -1;
    double remaining = time_limit_s - elapsed();
    if (remaining <= 0.0) { status = 2; break; }
    hx_simplex_solve(m, n, Ap, Ai, Ax, cost, lo.data(), up.data(),
                     row_lo, row_up, warm, tol_p, tol_d, 100000,
                     remaining, x.data(), y.data(), z.data(),
                     basis.data(), &iters, &res);
    lp_iters += iters;
    if (res != 0 && warm != nullptr) {
      // warm start went bad: retry cold before trusting the verdict
      const double rem2 = time_limit_s - elapsed();
      if (rem2 <= 0.0) { status = 2; break; }
      hx_simplex_solve(m, n, Ap, Ai, Ax, cost, lo.data(), up.data(),
                       row_lo, row_up, nullptr, tol_p, tol_d, 100000,
                       rem2, x.data(), y.data(), z.data(),
                       basis.data(), &iters, &res);
      lp_iters += iters;
    }
    if (res == 1) continue;          // infeasible (cold-confirmed)
    if (res == 2) { status = 3; break; }  // unbounded node: trouble
    if (res != 0) { status = 3; break; }  // numerical: fall back

    double obj = 0.0;
    for (int j = 0; j < n; ++j) obj += cost[j] * x[j];
    if (obj < nodes[cur].bound) obj = nodes[cur].bound;  // monotone
    nodes[cur].bound = obj;
    if (obj > prune_limit()) continue;

    // pseudocost update for the branch that created this node
    if (nodes[cur].col >= 0) {
      const int32_t p = nodes[cur].parent;
      const double delta = obj - nodes[p].bound;
      // fraction distance travelled by the branch
      // (stored implicitly: use 1.0 as the unit — averages only)
      if (nodes[cur].up_branch) {
        ps_up_sum[nodes[cur].col] += std::max(delta, 0.0);
        ps_up_cnt[nodes[cur].col]++;
      } else {
        ps_dn_sum[nodes[cur].col] += std::max(delta, 0.0);
        ps_dn_cnt[nodes[cur].col]++;
      }
    }

    // ---- integrality ---------------------------------------------------
    int bcol = -1;
    double bscore = -1.0, bfrac = 0.0;
    double ps_up_avg = 1e-6, ps_dn_avg = 1e-6;
    {
      double su = 0.0, sd = 0.0;
      int cu_ = 0, cd_ = 0;
      for (int j = 0; j < n; ++j) {
        if (ps_up_cnt[j]) { su += ps_up_sum[j] / ps_up_cnt[j]; cu_++; }
        if (ps_dn_cnt[j]) { sd += ps_dn_sum[j] / ps_dn_cnt[j]; cd_++; }
      }
      if (cu_) ps_up_avg = std::max(su / cu_, 1e-6);
      if (cd_) ps_dn_avg = std::max(sd / cd_, 1e-6);
    }
    for (int j = 0; j < n; ++j) {
      if (!is_int[j]) continue;
      const double f = x[j] - std::floor(x[j]);
      const double fr = std::min(f, 1.0 - f);
      if (fr <= feastol) continue;
      const double pu = ps_up_cnt[j] ? ps_up_sum[j] / ps_up_cnt[j]
                                     : ps_up_avg;
      const double pd = ps_dn_cnt[j] ? ps_dn_sum[j] / ps_dn_cnt[j]
                                     : ps_dn_avg;
      const double score = std::max(pu * (1.0 - f), 1e-12) *
                           std::max(pd * f, 1e-12);
      if (score > bscore) {
        bscore = score;
        bcol = j;
        bfrac = f;
      }
    }
    if (bcol < 0) {
      // integral: candidate incumbent
      if (obj < incumbent - 1e-12) {
        incumbent = obj;
        found = 1;
        for (int j = 0; j < n; ++j)
          best_x[j] = is_int[j] ? std::floor(x[j] + 0.5) : x[j];
      }
      continue;
    }

    // ---- rounding + LP completion heuristic (every 100 nodes) --------
    // (reference: in-search rounding, HighsPrimalHeuristics): fix the
    // integers at the rounded LP values, re-solve the continuous LP;
    // an optimal completion better than the incumbent is integral
    // feasible by construction.
    if (node_count % 100 == 1) {
      static thread_local std::vector<double> hlo, hup, hx, hy, hz;
      static thread_local std::vector<int8_t> hbasis;
      hlo.assign(lo.begin(), lo.end());
      hup.assign(up.begin(), up.end());
      hx.resize(n); hy.resize(m); hz.resize(n);
      hbasis.resize(n + m);
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
      const double hrem = time_limit_s - elapsed();
      if (ok_box && hrem > 0.05) {
        int hit = 0, hres = -1;
        hx_simplex_solve(m, n, Ap, Ai, Ax, cost, hlo.data(),
                         hup.data(), row_lo, row_up, basis.data(),
                         tol_p, tol_d, 20000, hrem, hx.data(),
                         hy.data(), hz.data(), hbasis.data(), &hit,
                         &hres);
        lp_iters += hit;
        if (hres == 0) {
          double hobj = 0.0;
          for (int j = 0; j < n; ++j) hobj += cost[j] * hx[j];
          if (hobj < incumbent - 1e-12) {
            incumbent = hobj;
            found = 1;
            for (int j = 0; j < n; ++j)
              best_x[j] = is_int[j] ? std::floor(hx[j] + 0.5) : hx[j];
          }
        }
      }
    }

    // ---- branch ---------------------------------------------------------
    const double fl = std::floor(x[bcol]);
    const int32_t down_id = (int32_t)nodes.size();
    nodes.push_back(BBNode{cur, bcol, 0, fl, obj,
                           nodes[cur].depth + 1});
    const int32_t up_id = (int32_t)nodes.size();
    nodes.push_back(BBNode{cur, bcol, 1, fl + 1.0, obj,
                           nodes[cur].depth + 1});
    const int32_t plunge_id = (bfrac > 0.5) ? up_id : down_id;
    const int32_t other_id = (bfrac > 0.5) ? down_id : up_id;
    heap.push(HeapEnt(obj, other_id));
    if (nodes[cur].depth < 400) {
      plunge = plunge_id;
      std::memcpy(dive_basis.data(), basis.data(), n + m);
      have_dive_basis = true;
    } else {
      heap.push(HeapEnt(obj, plunge_id));
    }
  }

  // ---- wrap up ------------------------------------------------------------
  double dual = incumbent;
  if (status != 0) {
    // open nodes bound the optimum from below
    dual = heap.empty() ? (found ? incumbent : -kInf) : heap.top().first;
    if (plunge >= 0) dual = std::min(dual, nodes[plunge].bound);
    if (found) dual = std::min(dual, incumbent);
  } else if (!found) {
    dual = kInf;  // exhausted with no incumbent: infeasible
  }
  if (found)
    for (int j = 0; j < n; ++j) best_x_out[j] = best_x[j];
  *best_obj_out = incumbent;
  *dual_bound_out = dual;
  *nodes_out = node_count;
  *lp_iters_out = lp_iters;
  *found_out = found;
  *status_out = status;
  return 0;
}

}  // extern "C"
