// Bounded-variable revised simplex (primal), dense basis inverse.
//
// Native cleanup/crossover stage of the highs_tpu framework: the
// reference keeps its simplex in C++ (highs/simplex/HEkk*, util/HFactor)
// because the pivot loop is strictly sequential and latency-bound —
// exactly the part that does not map to TPU (SURVEY §3.1).  This
// implementation follows the same role with a simpler numerical core:
//
// - problem:  min c'x  s.t.  L <= Ax <= U, l <= x <= u, posed over the
//   augmented system W = [A, -I] with logical (slack) variables holding
//   the row bounds, so every basis is square in R^{m x m};
// - dense explicit basis inverse B^{-1}, product-form update per pivot,
//   periodic refactorization by Gauss-Jordan with partial pivoting;
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

struct Workspace {
  int m, n, nv;  // rows, structural cols, total vars (n + m)
  const int64_t* Ap;
  const int32_t* Ai;
  const double* Ax;
  std::vector<double> cost, lo, up;
  std::vector<int8_t> stat;   // per variable
  std::vector<int32_t> basic; // basic variable per basis position, size m
  std::vector<double> binv;   // m*m row-major B^{-1}
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

// Build dense B from basis and invert with Gauss-Jordan partial
// pivoting.  On rank deficiency the dependent basic variable is demoted
// and replaced by a non-basic logical (basis repair — the reference
// does this inside HFactor::build with singleton handling), then the
// factorization restarts; up to `m` repairs.
bool refactor_once(Workspace& w, int* fail_pos) {
  const int m = w.m;
  std::vector<double> B(static_cast<size_t>(m) * m, 0.0);
  for (int p = 0; p < m; ++p) {
    int j = w.basic[p];
    if (j < w.n) {
      for (int64_t k = w.Ap[j]; k < w.Ap[j + 1]; ++k)
        B[static_cast<size_t>(w.Ai[k]) * m + p] = w.Ax[k];
    } else {
      B[static_cast<size_t>(j - w.n) * m + p] = -1.0;
    }
  }
  // Gauss-Jordan: binv starts as identity
  std::fill(w.binv.begin(), w.binv.end(), 0.0);
  for (int i = 0; i < m; ++i) w.binv[static_cast<size_t>(i) * m + i] = 1.0;
  for (int col = 0; col < m; ++col) {
    int piv = -1;
    double best = 1e-9;
    for (int r = col; r < m; ++r) {
      double v = std::fabs(B[static_cast<size_t>(r) * m + col]);
      if (v > best) { best = v; piv = r; }
    }
    if (piv < 0) { *fail_pos = col; return false; }
    if (piv != col) {
      for (int k = 0; k < m; ++k) {
        std::swap(B[static_cast<size_t>(piv) * m + k],
                  B[static_cast<size_t>(col) * m + k]);
        std::swap(w.binv[static_cast<size_t>(piv) * m + k],
                  w.binv[static_cast<size_t>(col) * m + k]);
      }
    }
    const double d = B[static_cast<size_t>(col) * m + col];
    const double dinv = 1.0 / d;
    for (int k = 0; k < m; ++k) {
      B[static_cast<size_t>(col) * m + k] *= dinv;
      w.binv[static_cast<size_t>(col) * m + k] *= dinv;
    }
    for (int r = 0; r < m; ++r) {
      if (r == col) continue;
      const double f = B[static_cast<size_t>(r) * m + col];
      if (f == 0.0) continue;
      for (int k = 0; k < m; ++k) {
        B[static_cast<size_t>(r) * m + k] -=
            f * B[static_cast<size_t>(col) * m + k];
        w.binv[static_cast<size_t>(r) * m + k] -=
            f * w.binv[static_cast<size_t>(col) * m + k];
      }
    }
  }
  return true;
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

// ftran: alpha = B^{-1} * W_j  (dense)
void ftran(const Workspace& w, int j, double* alpha) {
  const int m = w.m;
  std::vector<double> col(m, 0.0);
  const_cast<Workspace&>(w).axpy_col(j, 1.0, col.data());
  for (int r = 0; r < m; ++r) {
    double s = 0.0;
    const double* row = &w.binv[static_cast<size_t>(r) * m];
    for (int k = 0; k < m; ++k) s += row[k] * col[k];
    alpha[r] = s;
  }
}

// btran: y = (B^{-1})' * e  given dense e (size m)
void btran_dense(const Workspace& w, const double* e, double* y) {
  const int m = w.m;
  for (int k = 0; k < m; ++k) y[k] = 0.0;
  for (int r = 0; r < m; ++r) {
    const double f = e[r];
    if (f == 0.0) continue;
    const double* row = &w.binv[static_cast<size_t>(r) * m];
    for (int k = 0; k < m; ++k) y[k] += f * row[k];
  }
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
  for (int p = 0; p < m; ++p) {
    // x_B[p] = row p of B^{-1} ... B^{-1} rhs -> need column ordering:
    // basic[p]'s value is (B^{-1} rhs)[p]
    double s = 0.0;
    const double* row = &w.binv[static_cast<size_t>(p) * m];
    for (int k = 0; k < m; ++k) s += row[k] * rhs[k];
    w.xval[w.basic[p]] = s;
  }
}

// product-form update of B^{-1} after basic position p gets column with
// ftran result alpha (alpha[p] is the pivot element)
void update_binv(Workspace& w, int p, const double* alpha) {
  const int m = w.m;
  const double piv = alpha[p];
  const double pinv = 1.0 / piv;
  double* prow = &w.binv[static_cast<size_t>(p) * m];
  for (int k = 0; k < m; ++k) prow[k] *= pinv;
  for (int r = 0; r < m; ++r) {
    if (r == p) continue;
    const double f = alpha[r];
    if (f == 0.0) continue;
    double* row = &w.binv[static_cast<size_t>(r) * m];
    for (int k = 0; k < m; ++k) row[k] -= f * prow[k];
  }
}

struct PricingResult {
  int j = -1;
  int dir = 0;  // +1 increase, -1 decrease
  double score = 0.0;
};

}  // namespace

extern "C" {

// status_out: 0 optimal, 1 infeasible, 2 unbounded, 3 iter limit,
// 4 singular
int hx_simplex_solve(int m, int n, const int64_t* Ap, const int32_t* Ai,
                     const double* Ax, const double* cost,
                     const double* col_lo, const double* col_up,
                     const double* row_lo, const double* row_up,
                     const int8_t* basis_in, double tol_p, double tol_d,
                     int max_iter, double* x_out, double* y_out,
                     double* z_out, int8_t* basis_out, int* iter_out,
                     int* status_out) {
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
  w.binv.assign(static_cast<size_t>(m) * m, 0.0);
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

  {
    // composite loop: the phase is re-derived every iteration from the
    // actual basic infeasibility, so numerical drift in the incremental
    // updates self-corrects (the reference handles this with cost
    // perturbation + cleanup solves, HEkk)
    long long check_counter = 0;
    int verify_retries = 0;
    int degen_run = 0;  // consecutive (near-)zero-step pivots
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
          if (bland) { pr.j = j; pr.dir = dir; pr.score = score; break; }
          if (score > pr.score) { pr.j = j; pr.dir = dir; pr.score = score; }
        }
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
      // ---- ratio test --------------------------------------------------
      ftran(w, pr.j, alpha.data());
      // entering moves by t*dir; basic j_p changes by -t*dir*alpha[p]
      double t_max = w.up[pr.j] - w.lo[pr.j];  // bound flip distance
      if (t_max < 0) t_max = 0;
      int leave_p = -1;
      int leave_to = kLower;
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
            if (v < w.lo[jb] - tj) target = w.lo[jb];       // rising to lo
            else if (v <= w.up[jb] + tj) target = w.up[jb];  // in range
            else continue;  // above up, rising further: no block
            if (target >= kInf) continue;
            room = (target - v) / a;
            to = (target == w.lo[jb]) ? kLower : kUpper;
          } else {
            double target;
            if (v > w.up[jb] + tj) target = w.up[jb];        // falling to up
            else if (v >= w.lo[jb] - tj) target = w.lo[jb];  // in range
            else continue;  // below lo, falling further: no block
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
        if (room < t_max - 1e-12) {
          t_max = room;
          leave_p = p;
          leave_to = to;
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
        w.stat[jl] = static_cast<int8_t>(leave_to);
        w.xval[jl] = (leave_to == kLower) ? w.lo[jl] : w.up[jl];
        w.stat[pr.j] = kBasic;
        w.basic[leave_p] = pr.j;
        if (std::fabs(alpha[leave_p]) < 1e-7 ||
            ++since_refactor >= 60) {
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

}  // extern "C"
