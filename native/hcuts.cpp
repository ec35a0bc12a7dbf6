// Native c-MIR cut generation for the MIP layer.
//
// The reference generates cuts in C++ (highs/mip/HighsCutGeneration.cpp
// cmirCutGenerationHeuristic; HighsTransformedLp bound substitution;
// determineCover + separateLiftedKnapsackCover /
// separateLiftedMixedBinaryCover).  highs_tpu keeps the same split as
// the reference: array-parallel LP work on the accelerator, scalar
// combinatorial cut search in native code.  This file is a
// semantics-exact native port of highs_tpu/solvers/mip/cuts.py
// `_mir_on_leq` (which remains the python fallback and the property-
// test oracle): given one  a'x <= b  row over the extended variable
// space, substitute bounds, complement, search MIR divisors and lifted
// covers, and return the best cut in the original space.
//
// Exposed C ABI (ctypes from highs_tpu/solvers/mip/native_cuts.py):
//   hx_mir_on_leq(...)  -> n_out (>0 cut found, 0 none, -1 capacity)
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <chrono>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kEps = 1e-12;
constexpr double kMinEfficacy = 1e-6;

inline double fin(double v, double d) { return std::isfinite(v) ? v : d; }
inline double r12(double v) { return std::nearbyint(v * 1e12) / 1e12; }

struct Eval {
  bool ok = false;
  double eff = 0.0;
  std::vector<double> gi;
  std::vector<double> gc;
  double grhs = 0.0;
};

// MIR at divisor delta (cuts.py _eval / one row of _eval_batch).
Eval mir_eval(double delta, const std::vector<double>& ah, double bh,
              const std::vector<double>& xh, const std::vector<double>& acs,
              const std::vector<double>& s_vals) {
  Eval out;
  const double b_d = bh / delta;
  const double fl_b = std::floor(b_d);
  const double f = b_d - fl_b;
  if (f < 0.005 || f > 0.995) return out;
  const double oneminus = 1.0 - f;
  const size_t ni = ah.size(), ns = acs.size();
  out.gi.resize(ni);
  double act = 0.0, sq = 0.0;
  for (size_t k = 0; k < ni; ++k) {
    const double a_d = ah[k] / delta;
    const double fl = std::floor(a_d);
    const double g = fl + std::max(a_d - fl - f, 0.0) / oneminus;
    out.gi[k] = g;
    act += g * xh[k];
    sq += g * g;
  }
  out.gc.resize(ns);
  for (size_t k = 0; k < ns; ++k) {
    const double g = std::min(acs[k] / delta, 0.0) / oneminus;
    out.gc[k] = g;
    act += g * s_vals[k];
    sq += g * g;
  }
  const double nrm = std::sqrt(sq);
  if (nrm <= kEps) return out;
  out.grhs = fl_b;
  out.eff = (act - fl_b) / nrm;
  out.ok = true;
  return out;
}

// Best-delta MIR over a candidate list (cuts.py _eval_batch): first
// strict maximum wins (np.argmax semantics); requires eff > efficacy
// threshold.
struct BatchBest {
  bool ok = false;
  Eval ev;
  double delta = 0.0;
};

BatchBest mir_eval_batch(const std::vector<double>& deltas,
                         const std::vector<double>& ah, double bh,
                         const std::vector<double>& xh,
                         const std::vector<double>& acs,
                         const std::vector<double>& s_vals) {
  BatchBest best;
  double best_eff = -HUGE_VAL;
  for (double d : deltas) {
    Eval ev = mir_eval(d, ah, bh, xh, acs, s_vals);
    if (!ev.ok) continue;
    if (ev.eff > best_eff) {
      best_eff = ev.eff;
      best.ev = std::move(ev);
      best.delta = d;
      best.ok = true;
    }
  }
  if (best.ok && best_eff <= kMinEfficacy) best.ok = false;
  return best;
}

struct CoverResult {
  bool ok = false;
  Eval ev;
  std::vector<double> sign;
  std::vector<double> sub_b;
};

// Body of hx_mir_on_leq, reusable from the native path separator.
int mir_on_leq_core(
    int nnz, const int64_t* cols, const double* vals, double rhs,
    const double* x, const double* lo, const double* up,
    const int8_t* is_int, double feastol, int prefer_vbds,
    int64_t n_vb, const int64_t* vb_ptr, const int32_t* vb_y,
    const double* vb_c1, const double* vb_c0, const uint8_t* vb_isub,
    int out_cap, int64_t* out_cols, double* out_vals, double* out_rhs,
    double* out_eff) {
  // ---- split: integer coefficients accumulate insertion-ordered ----
  std::vector<int64_t> ikeys;
  std::vector<double> icoef;
  std::unordered_map<int64_t, int> ipos;
  ikeys.reserve(nnz);
  icoef.reserve(nnz);
  auto add_int = [&](int64_t c, double v) {
    auto it = ipos.find(c);
    if (it == ipos.end()) {
      ipos.emplace(c, static_cast<int>(ikeys.size()));
      ikeys.push_back(c);
      icoef.push_back(v);
    } else {
      icoef[it->second] += v;
    }
  };
  for (int k = 0; k < nnz; ++k)
    if (is_int[cols[k]]) add_int(cols[k], vals[k]);

  double bh0 = rhs;
  struct SlackDef {
    int64_t j;
    double sigma, b0, b1;
    int64_t ycol;
    double coef_s, s_star;
  };
  std::vector<SlackDef> slack;
  // ---- continuous substitution (HighsTransformedLp analogue) --------
  struct Cand {
    double s, sigma, b0, b1;
    int64_t ycol;
  };
  std::vector<Cand> cands;
  for (int k = 0; k < nnz; ++k) {
    const int64_t j = cols[k];
    if (is_int[j]) continue;
    const double v = vals[k];
    const double xj = x[j];
    cands.clear();
    if (std::isfinite(lo[j]))
      cands.push_back({xj - lo[j], 1.0, lo[j], 0.0, -1});
    if (std::isfinite(up[j]))
      cands.push_back({up[j] - xj, -1.0, up[j], 0.0, -1});
    if (vb_ptr != nullptr && j >= 0 && j < n_vb) {
      // python candidate order: all vlbs then all vubs
      for (int pass = 0; pass < 2; ++pass) {
        for (int64_t p = vb_ptr[j]; p < vb_ptr[j + 1]; ++p) {
          if (static_cast<int>(vb_isub[p]) != pass) continue;
          const double xy = x[vb_y[p]];
          if (pass == 0)  // vlb: x >= c0 + c1*y
            cands.push_back({xj - vb_c0[p] - vb_c1[p] * xy, 1.0, vb_c0[p],
                             vb_c1[p], vb_y[p]});
          else  // vub: x <= c0 + c1*y
            cands.push_back({vb_c0[p] + vb_c1[p] * xy - xj, -1.0, vb_c0[p],
                             vb_c1[p], vb_y[p]});
        }
      }
    }
    // filter s >= -feastol
    size_t w = 0;
    for (size_t i = 0; i < cands.size(); ++i)
      if (cands[i].s >= -feastol) cands[w++] = cands[i];
    cands.resize(w);
    if (cands.empty()) return 0;
    int pick = -1;
    if (prefer_vbds) {
      double sbest = HUGE_VAL;
      for (const auto& c : cands) sbest = std::min(sbest, c.s);
      double vb_best = HUGE_VAL;
      int vb_pick = -1;
      for (size_t i = 0; i < cands.size(); ++i) {
        if (cands[i].ycol >= 0 && cands[i].s <= sbest + feastol &&
            cands[i].s < vb_best) {
          vb_best = cands[i].s;
          vb_pick = static_cast<int>(i);
        }
      }
      if (vb_pick >= 0) {
        pick = vb_pick;
      } else {
        double mn = HUGE_VAL;
        for (size_t i = 0; i < cands.size(); ++i)
          if (cands[i].s < mn) {
            mn = cands[i].s;
            pick = static_cast<int>(i);
          }
      }
    } else {
      double mn = HUGE_VAL;
      for (size_t i = 0; i < cands.size(); ++i)
        if (cands[i].s < mn) {
          mn = cands[i].s;
          pick = static_cast<int>(i);
        }
    }
    const Cand& c = cands[pick];
    bh0 -= v * c.b0;
    if (c.ycol >= 0 && std::fabs(c.b1) > kEps)
      add_int(c.ycol, v * c.b1);
    slack.push_back({j, c.sigma, c.b0, c.b1, c.ycol, v * c.sigma,
                     std::max(c.s, 0.0)});
  }

  // ---- filter zero integer coefficients -----------------------------
  std::vector<int64_t> icols;
  std::vector<double> ivals;
  icols.reserve(ikeys.size());
  for (size_t k = 0; k < ikeys.size(); ++k)
    if (std::fabs(icoef[k]) > kEps) {
      icols.push_back(ikeys[k]);
      ivals.push_back(icoef[k]);
    }
  const size_t ni = icols.size();
  const size_t ns = slack.size();

  // ---- integer complementation to the nearest finite bound ----------
  std::vector<char> use_lower(ni);
  std::vector<double> sub_b(ni), sign(ni), ah(ni), xh(ni), widths(ni);
  double bh = bh0;
  for (size_t k = 0; k < ni; ++k) {
    const int64_t c = icols[k];
    const double dl = std::fabs(x[c] - fin(lo[c], 0.0));
    const double du = std::fabs(fin(up[c], 1e30) - x[c]);
    const bool ul = (dl <= du) && std::isfinite(lo[c]);
    const bool uu = !ul && std::isfinite(up[c]);
    if (!ul && !uu) return 0;
    use_lower[k] = ul;
    sub_b[k] = ul ? fin(lo[c], 0.0) : fin(up[c], 0.0);
    sign[k] = ul ? 1.0 : -1.0;
    ah[k] = ivals[k] * sign[k];
    bh -= ivals[k] * sub_b[k];
    xh[k] = sign[k] * (x[c] - sub_b[k]);
    widths[k] = fin(up[c], 1e30) - fin(lo[c], -1e30);
  }
  std::vector<double> acs(ns), s_vals(ns);
  for (size_t k = 0; k < ns; ++k) {
    acs[k] = slack[k].coef_s;
    s_vals[k] = slack[k].s_star;
  }

  // ---- lifted cover cut (determineCover + lifting functions) --------
  CoverResult cover;
  [&]() {
    if (ni == 0) return;
    for (size_t k = 0; k < ni; ++k)
      if (!(widths[k] <= 1.5) || !std::isfinite(widths[k])) return;
    std::vector<double> ah2(ah), xh2(xh), sign2(sign), sub_b2(sub_b);
    double bh2 = bh;
    for (size_t k = 0; k < ni; ++k) {
      if (!(ah2[k] < 0)) continue;
      const int64_t c = icols[k];
      const double ob = use_lower[k] ? up[c] : lo[c];
      if (!std::isfinite(ob)) return;
      bh2 -= ivals[k] * (ob - sub_b2[k]);
      sign2[k] = -sign2[k];
      sub_b2[k] = ob;
      ah2[k] = ivals[k] * sign2[k];
      xh2[k] = sign2[k] * (x[c] - ob);
    }
    if (bh2 <= 10 * feastol) return;
    // cover selection (determineCover, lpSol path)
    std::vector<int> at_upper, rest;
    for (size_t k = 0; k < ni; ++k) {
      if (!(xh2[k] > feastol)) continue;
      if (xh2[k] >= widths[k] - feastol)
        at_upper.push_back(static_cast<int>(k));
      else
        rest.push_back(static_cast<int>(k));
    }
    if (at_upper.empty() && rest.empty()) return;
    std::sort(rest.begin(), rest.end(), [&](int a, int b) {
      const double pa = xh2[a] * ah2[a], pb = xh2[b] * ah2[b];
      if (pa != pb) return pa > pb;
      if (ah2[a] != ah2[b]) return ah2[a] > ah2[b];
      return a < b;
    });
    double coverweight = 0.0;
    for (int k : at_upper) coverweight += ah2[k] * widths[k];
    std::vector<int> cov(at_upper);
    const double minlam = std::max(10 * feastol, feastol * std::fabs(bh2));
    size_t ri = 0;
    while (coverweight - bh2 <= minlam && ri < rest.size()) {
      cov.push_back(rest[ri]);
      coverweight += ah2[rest[ri]] * widths[rest[ri]];
      ++ri;
    }
    const double lam = coverweight - bh2;
    if (cov.empty() || lam <= minlam) return;
    std::vector<char> cov_set(ni, 0);
    for (int k : cov) cov_set[k] = 1;
    std::vector<double> cvals;
    cvals.reserve(cov.size());
    for (int k : cov) cvals.push_back(ah2[k]);
    std::sort(cvals.begin(), cvals.end(), std::greater<double>());
    std::vector<double> gi(ni, 0.0), gc;
    double grhs;
    if (ns == 0) {
      // pure-integer knapsack lifting
      const int csz = static_cast<int>(cvals.size());
      double abar = cvals[0];
      double sig = lam;
      for (int i = 1; i < csz; ++i) {
        const double kdelta = i * (abar - cvals[i]);
        if (kdelta < sig) {
          abar = cvals[i];
          sig -= kdelta;
        } else {
          abar -= sig / i;
          sig = 0.0;
          break;
        }
      }
      if (sig > 0) abar = bh2 / csz;
      std::vector<double> S(csz);
      double run = 0.0;
      for (int i = 0; i < csz; ++i) {
        run += std::min(abar, cvals[i]);
        S[i] = run;
      }
      int cplus = 0;
      for (double v : cvals)
        if (v > abar + feastol) ++cplus;
      bool halfint = false;
      auto g_lift = [&](double z) -> double {
        const double hfrac = abar > kEps ? z / abar : 0.0;
        double coef = 0.0;
        long h = std::lround(std::floor(hfrac + 0.5));
        if (h != 0 &&
            std::fabs(hfrac - h) * std::max(1.0, abar) <= 1e-9 &&
            h <= cplus - 1) {
          halfint = true;
          coef = 0.5;
        }
        h = std::max(h - 1, 0L);
        while (h < csz && z > S[h] + feastol) ++h;
        return coef + h;
      };
      grhs = static_cast<double>(csz - 1);
      for (size_t k = 0; k < ni; ++k) {
        if (std::fabs(ah2[k]) <= kEps)
          gi[k] = 0.0;
        else if (cov_set[k] && ah2[k] <= abar + feastol)
          gi[k] = 1.0;
        else
          gi[k] = g_lift(ah2[k]);
      }
      if (halfint) {
        grhs *= 2;
        for (auto& g : gi) g *= 2;
      }
    } else {
      // mixed-binary cover lifting
      std::vector<double> S;
      double ssum = 0.0;
      for (double v : cvals) {
        if (v - lam <= 1e-12) break;
        ssum += v;
        S.push_back(ssum);
      }
      const int p = static_cast<int>(S.size());
      if (p == 0) return;
      auto phi = [&](double a) -> double {
        for (int i = 0; i < p; ++i) {
          if (a <= S[i] - lam) return i * lam;
          if (a <= S[i]) return (i + 1) * lam + (a - S[i]);
        }
        return p * lam + (a - S[p - 1]);
      };
      grhs = -lam;
      for (size_t k = 0; k < ni; ++k) {
        if (cov_set[k]) {
          gi[k] = std::min(ah2[k], lam);
          grhs += gi[k];
        } else {
          gi[k] = phi(ah2[k]);
        }
      }
      gc.resize(ns);
      for (size_t k = 0; k < ns; ++k) gc[k] = std::min(acs[k], 0.0);
    }
    double act = 0.0, sq = 0.0;
    for (size_t k = 0; k < ni; ++k) {
      act += gi[k] * xh2[k];
      sq += gi[k] * gi[k];
    }
    for (size_t k = 0; k < gc.size(); ++k) {
      act += gc[k] * s_vals[k];
      sq += gc[k] * gc[k];
    }
    const double nrm = std::sqrt(sq);
    if (nrm <= kEps) return;
    cover.ok = true;
    cover.ev.ok = true;
    cover.ev.eff = (act - grhs) / nrm;
    cover.ev.gi = std::move(gi);
    cover.ev.gc = std::move(gc);
    cover.ev.grhs = grhs;
    cover.sign = std::move(sign2);
    cover.sub_b = std::move(sub_b2);
  }();

  // ---- MIR divisor candidates (cmirCutGenerationHeuristic) ----------
  std::vector<double> cand;
  cand.push_back(1.0);
  {
    std::vector<double> sup;
    for (size_t k = 0; k < ni; ++k)
      if (xh[k] > feastol) {
        const double a = std::fabs(ah[k]);
        if (a > 1e-4) sup.push_back(r12(a));
      }
    std::sort(sup.begin(), sup.end());
    sup.erase(std::unique(sup.begin(), sup.end()), sup.end());
    if (sup.size() > 16) sup.resize(16);
    for (double v : sup) cand.push_back(v);
    if (!sup.empty()) cand.push_back(sup.back() + 1.0);
  }

  BatchBest best = mir_eval_batch(cand, ah, bh, xh, acs, s_vals);
  if (!best.ok && (!cover.ok || cover.ev.eff <= kMinEfficacy)) return 0;
  if (best.ok) {
    // refine: delta*2, *4, *8
    const std::vector<double> ref = {best.delta * 2, best.delta * 4,
                                     best.delta * 8};
    BatchBest got = mir_eval_batch(ref, ah, bh, xh, acs, s_vals);
    if (got.ok && got.ev.eff > best.ev.eff) best = std::move(got);
    // greedy complementation flips at the chosen delta (<= 10 trials)
    int n_flips = 0;
    for (size_t kk = 0; kk < ni && n_flips < 10; ++kk) {
      const int64_t c = icols[kk];
      const double ob = use_lower[kk] ? up[c] : lo[c];
      if (!std::isfinite(ob) || xh[kk] <= feastol) continue;
      ++n_flips;
      const double sign_k = -sign[kk];
      const double bh_f = bh - ivals[kk] * (ob - sub_b[kk]);
      std::vector<double> ah_f(ah), xh_f(xh);
      ah_f[kk] = ivals[kk] * sign_k;
      xh_f[kk] = sign_k * (x[c] - ob);
      Eval got1 = mir_eval(best.delta, ah_f, bh_f, xh_f, acs, s_vals);
      if (got1.ok && got1.eff > best.ev.eff) {
        best.ev = std::move(got1);
        sign[kk] = sign_k;
        sub_b[kk] = ob;
        ah = std::move(ah_f);
        bh = bh_f;
        xh = std::move(xh_f);
      }
    }
  }
  // pick the better of lifted cover and c-MIR
  const Eval* chosen = nullptr;
  const std::vector<double>* ch_sign = &sign;
  const std::vector<double>* ch_sub = &sub_b;
  if (cover.ok && (!best.ok || cover.ev.eff > best.ev.eff)) {
    chosen = &cover.ev;
    ch_sign = &cover.sign;
    ch_sub = &cover.sub_b;
  } else if (best.ok) {
    chosen = &best.ev;
  } else {
    return 0;
  }

  // ---- un-substitute -------------------------------------------------
  std::vector<int64_t> okeys;
  std::vector<double> ovals;
  std::unordered_map<int64_t, int> opos;
  okeys.reserve(ni + 2 * ns);
  auto add_out = [&](int64_t c, double v) {
    auto it = opos.find(c);
    if (it == opos.end()) {
      opos.emplace(c, static_cast<int>(okeys.size()));
      okeys.push_back(c);
      ovals.push_back(v);
    } else {
      ovals[it->second] += v;
    }
  };
  double orhs = chosen->grhs;
  for (size_t k = 0; k < ni; ++k) {
    const double g = chosen->gi[k];
    if (std::fabs(g) > kEps) {
      add_out(icols[k], g * (*ch_sign)[k]);
      orhs += g * (*ch_sign)[k] * (*ch_sub)[k];
    }
  }
  for (size_t k = 0; k < chosen->gc.size(); ++k) {
    const double g = chosen->gc[k];
    if (std::fabs(g) <= kEps) continue;
    const SlackDef& d = slack[k];
    add_out(d.j, g * d.sigma);
    orhs += g * d.sigma * d.b0;
    if (d.ycol >= 0 && std::fabs(d.b1) > kEps)
      add_out(d.ycol, -g * d.sigma * d.b1);
  }
  const int n_out = static_cast<int>(okeys.size());
  if (n_out == 0) return 0;
  if (n_out > out_cap) return -1;
  // sort by column index
  std::vector<int> order(n_out);
  for (int i = 0; i < n_out; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return okeys[a] < okeys[b]; });
  for (int i = 0; i < n_out; ++i) {
    out_cols[i] = okeys[order[i]];
    out_vals[i] = ovals[order[i]];
  }
  *out_rhs = orhs;
  *out_eff = chosen->eff;
  return n_out;
}

}  // namespace

extern "C" int hx_mir_on_leq(
    int nnz, const int64_t* cols, const double* vals, double rhs,
    const double* x, const double* lo, const double* up,
    const int8_t* is_int, double feastol, int prefer_vbds,
    // variable bounds, flattened per structural column (vlbs first,
    // then vubs, insertion order preserved); null vb_ptr = none
    int64_t n_vb, const int64_t* vb_ptr, const int32_t* vb_y,
    const double* vb_c1, const double* vb_c0, const uint8_t* vb_isub,
    int out_cap, int64_t* out_cols, double* out_vals, double* out_rhs,
    double* out_eff) {
  return mir_on_leq_core(nnz, cols, vals, rhs, x, lo, up, is_int,
                         feastol, prefer_vbds, n_vb, vb_ptr, vb_y,
                         vb_c1, vb_c0, vb_isub, out_cap, out_cols,
                         out_vals, out_rhs, out_eff);
}

// ---------------------------------------------------------------------------
// Native path-aggregation c-MIR separation (reference
// HighsPathSeparator.cpp + HighsLpAggregator): every row enters an
// aggregation as the equality a_r'x - s_r = 0 (slack s_r in row
// bounds); paths extend by eliminating the continuous variable
// farthest inside its bounds with a randomly chosen partner row of
// opposite sign.  Mirrors cuts.separate_path_mir (which stays as the
// python fallback); cuts come back raw (pre-_clean_cut) in structural
// space.
// ---------------------------------------------------------------------------

namespace {

struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ULL) {}
  uint64_t next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1DULL;
  }
  int below(int k) { return k <= 1 ? 0 : static_cast<int>(next() % k); }
};

}  // namespace

extern "C" int hx_path_mir(
    int m, int n, const int64_t* rp, const int32_t* ri, const double* rx,
    const double* row_lower, const double* row_upper, const double* lo,
    const double* up, const double* x, const int8_t* is_int,
    double feastol, int max_path, int max_starts, uint64_t seed,
    double time_budget_s,
    int64_t n_vb, const int64_t* vb_ptr, const int32_t* vb_y,
    const double* vb_c1, const double* vb_c0, const uint8_t* vb_isub,
    // outputs: packed cuts in structural space (pre-postprocess)
    int max_cuts, int64_t nnz_cap, int64_t* out_indptr,
    int64_t* out_cols, double* out_vals, double* out_rhs,
    double* out_eff) {
  const auto t_end = std::chrono::steady_clock::now() +
      std::chrono::duration_cast<std::chrono::steady_clock::duration>(
          std::chrono::duration<double>(time_budget_s));
  const int next = n + m;  // extended space size
  // ---- activities + extended arrays for the transformed space ------
  std::vector<double> act(m, 0.0);
  for (int r = 0; r < m; ++r)
    for (int64_t k = rp[r]; k < rp[r + 1]; ++k)
      act[r] += rx[k] * x[ri[k]];
  std::vector<double> x_ext(next), lo_ext(next), up_ext(next);
  std::vector<int8_t> int_ext(next);
  for (int j = 0; j < n; ++j) {
    x_ext[j] = x[j];
    lo_ext[j] = lo[j];
    up_ext[j] = up[j];
    int_ext[j] = is_int[j];
  }
  for (int r = 0; r < m; ++r) {
    const double lv = fin(row_lower[r], -HUGE_VAL);
    const double uv = fin(row_upper[r], HUGE_VAL);
    x_ext[n + r] = std::min(std::max(act[r], lv), uv);
    lo_ext[n + r] = row_lower[r];
    up_ext[n + r] = row_upper[r];
    int_ext[n + r] = 0;
  }
  // ---- row classification (reference RowType) ----------------------
  constexpr int8_t EQ = 0, LEQ = 1, GEQ = -1, UNUSABLE = -2;
  std::vector<int8_t> rowtype(m, UNUSABLE);
  for (int r = 0; r < m; ++r) {
    const bool hl = std::isfinite(row_lower[r]);
    const bool hu = std::isfinite(row_upper[r]);
    if (hl && hu && row_lower[r] == row_upper[r]) {
      rowtype[r] = EQ;
      continue;
    }
    const double ls = hl ? act[r] - row_lower[r] : HUGE_VAL;
    const double us = hu ? row_upper[r] - act[r] : HUGE_VAL;
    const bool tl = ls <= feastol, tu = us <= feastol;
    if (tu && !tl) rowtype[r] = LEQ;
    else if (tl && !tu) rowtype[r] = GEQ;
    else if (tl && tu) rowtype[r] = LEQ;
  }
  // ---- continuous bound distances (incl. variable bounds) ----------
  std::vector<double> bd(n, 0.0);
  for (int j = 0; j < n; ++j) {
    if (is_int[j]) continue;
    double d = HUGE_VAL;
    if (std::isfinite(lo[j])) d = std::min(d, x[j] - lo[j]);
    if (std::isfinite(up[j])) d = std::min(d, up[j] - x[j]);
    if (vb_ptr != nullptr && j < n_vb) {
      for (int64_t p = vb_ptr[j]; p < vb_ptr[j + 1]; ++p) {
        const double xy = x[vb_y[p]];
        if (vb_isub[p] == 0)
          d = std::min(d, x[j] - vb_c0[p] - vb_c1[p] * xy);
        else
          d = std::min(d, vb_c0[p] + vb_c1[p] * xy - x[j]);
      }
    }
    bd[j] = std::isfinite(d) ? std::max(0.0, d) : 0.0;
  }
  // ---- single-continuous equality rows become substitutions --------
  std::vector<int> sub_row(n, -1);
  std::vector<double> sub_val(n, 0.0);
  for (int r = 0; r < m; ++r) {
    if (rowtype[r] != EQ) continue;
    int cont = -1, cnt = 0;
    double vj = 0.0;
    for (int64_t k = rp[r]; k < rp[r + 1]; ++k) {
      const int c = ri[k];
      if (!is_int[c] && bd[c] > 0) {
        ++cnt;
        cont = c;
        vj = rx[k];
      }
    }
    if (cnt != 1 || sub_row[cont] >= 0) continue;
    if (std::fabs(vj) > kEps) {
      sub_row[cont] = r;
      sub_val[cont] = vj;
      rowtype[r] = UNUSABLE;
    }
  }
  // ---- in/out arc rows per continuous variable (CSC traversal) -----
  std::vector<int64_t> cp(n + 1, 0);
  for (int r = 0; r < m; ++r)
    for (int64_t k = rp[r]; k < rp[r + 1]; ++k) ++cp[ri[k] + 1];
  for (int j = 0; j < n; ++j) cp[j + 1] += cp[j];
  std::vector<int32_t> c_row(cp[n]);
  std::vector<double> c_val(cp[n]);
  {
    std::vector<int64_t> pos(cp.begin(), cp.end() - 1);
    for (int r = 0; r < m; ++r)
      for (int64_t k = rp[r]; k < rp[r + 1]; ++k) {
        const int j = ri[k];
        c_row[pos[j]] = r;
        c_val[pos[j]] = rx[k];
        ++pos[j];
      }
  }
  struct Arc {
    int row;
    double val;
  };
  std::vector<std::vector<Arc>> in_arcs(n), out_arcs(n);
  for (int j = 0; j < n; ++j) {
    if (is_int[j] || bd[j] <= 0 || sub_row[j] >= 0) continue;
    for (int64_t k = cp[j]; k < cp[j + 1]; ++k) {
      const int r = c_row[k];
      const double v = c_val[k];
      const int8_t rt = rowtype[r];
      if (rt == UNUSABLE) continue;
      if (rt == EQ) {
        in_arcs[j].push_back({r, v});
        out_arcs[j].push_back({r, v});
      } else if (rt == LEQ) {
        (v < 0 ? in_arcs[j] : out_arcs[j]).push_back({r, v});
      } else {
        (v > 0 ? in_arcs[j] : out_arcs[j]).push_back({r, v});
      }
    }
  }
  // ---- start rows ----------------------------------------------------
  XorShift rng(seed);
  std::vector<int> usable;
  usable.reserve(m);
  for (int r = 0; r < m; ++r)
    if (rowtype[r] != UNUSABLE) usable.push_back(r);
  if (static_cast<int>(usable.size()) > max_starts) {
    for (int i = 0; i < max_starts; ++i) {
      const int k = i + rng.below(static_cast<int>(usable.size()) - i);
      std::swap(usable[i], usable[k]);
    }
    usable.resize(max_starts);
  }
  const double max_w = 1.0 / feastol;
  // ---- walk ----------------------------------------------------------
  int n_cuts = 0;
  int64_t nnz_used = 0;
  out_indptr[0] = 0;
  // work buffers
  std::vector<double> coef_dense(n, 0.0);
  std::vector<int> coef_touch;
  std::vector<char> in_touch(n, 0);
  std::vector<double> fold_dense(n, 0.0);
  std::vector<int> fold_touch;
  std::vector<char> in_fold(n, 0);
  std::vector<int64_t> agg_cols;   // extended-space aggregate entries
  std::vector<double> agg_vals;
  std::vector<double> agg_neg;
  const int mir_cap = 4 * next + 16;
  std::vector<int64_t> mir_cols(mir_cap);
  std::vector<double> mir_vals(mir_cap);
  std::vector<std::pair<int, double>> agg;  // row -> weight
  std::vector<char> in_path(m, 0);

  // try_cut reads the walk's current aggregate coefficients
  // (coef_dense over coef_touch) without modifying them.
  auto try_cut = [&]() -> bool {
    agg_cols.clear();
    agg_vals.clear();
    for (int c : coef_touch) {
      if (std::fabs(coef_dense[c]) > kEps) {
        agg_cols.push_back(c);
        agg_vals.push_back(coef_dense[c]);
      }
    }
    for (const auto& rw : agg) {
      if (std::fabs(rw.second) > kEps) {
        agg_cols.push_back(n + rw.first);
        agg_vals.push_back(-rw.second);
      }
    }
    if (agg_cols.empty()) return false;
    bool got_any = false;
    agg_neg.resize(agg_vals.size());
    for (int sgn_i = 0; sgn_i < 2 && n_cuts < max_cuts; ++sgn_i) {
      const double* use_vals = agg_vals.data();
      if (sgn_i == 1) {
        for (size_t k = 0; k < agg_vals.size(); ++k)
          agg_neg[k] = -agg_vals[k];
        use_vals = agg_neg.data();
      }
      double rhs_out = 0.0, eff_out = 0.0;
      const int n_mir = mir_on_leq_core(
          static_cast<int>(agg_cols.size()), agg_cols.data(), use_vals,
          0.0, x_ext.data(), lo_ext.data(), up_ext.data(),
          int_ext.data(), feastol, /*prefer_vbds=*/1, n_vb, vb_ptr,
          vb_y, vb_c1, vb_c0, vb_isub, mir_cap, mir_cols.data(),
          mir_vals.data(), &rhs_out, &eff_out);
      if (n_mir <= 0) continue;
      // fold slack coefficients back: g*s_r = g*(a_r'x)
      fold_touch.clear();
      auto fold_add = [&](int c, double v) {
        if (!in_fold[c]) {
          in_fold[c] = 1;
          fold_touch.push_back(c);
        }
        fold_dense[c] += v;
      };
      for (int k = 0; k < n_mir; ++k) {
        const int64_t c = mir_cols[k];
        if (c < n) {
          fold_add(static_cast<int>(c), mir_vals[k]);
        } else {
          const int r = static_cast<int>(c - n);
          const double g = mir_vals[k];
          for (int64_t kk = rp[r]; kk < rp[r + 1]; ++kk)
            fold_add(ri[kk], g * rx[kk]);
        }
      }
      std::sort(fold_touch.begin(), fold_touch.end());
      double viol = -rhs_out, sq = 0.0;
      int cnt = 0;
      for (int c : fold_touch)
        if (std::fabs(fold_dense[c]) > kEps) {
          viol += fold_dense[c] * x[c];
          sq += fold_dense[c] * fold_dense[c];
          ++cnt;
        }
      const double nrm = std::sqrt(sq);
      if (cnt > 0 && nrm > kEps && viol / nrm > kMinEfficacy &&
          nnz_used + cnt <= nnz_cap && n_cuts < max_cuts) {
        for (int c : fold_touch) {
          if (std::fabs(fold_dense[c]) > kEps) {
            out_cols[nnz_used] = c;
            out_vals[nnz_used] = fold_dense[c];
            ++nnz_used;
          }
        }
        out_rhs[n_cuts] = rhs_out;
        out_eff[n_cuts] = viol / nrm;
        ++n_cuts;
        out_indptr[n_cuts] = nnz_used;
        got_any = true;
      }
      for (int c : fold_touch) {
        fold_dense[c] = 0.0;
        in_fold[c] = 0;
      }
    }
    return got_any;
  };

  for (int i0 : usable) {
    if (std::chrono::steady_clock::now() > t_end) break;
    if (n_cuts >= max_cuts) break;
    for (double scale0 : {1.0, -1.0}) {
      agg.clear();
      agg.push_back({i0, scale0});
      std::vector<int> path_rows = {i0};
      in_path[i0] = 1;
      for (int step = 0; step < max_path; ++step) {
        // current x-space coefficients of the aggregate
        coef_touch.clear();
        for (const auto& rw : agg)
          for (int64_t k = rp[rw.first]; k < rp[rw.first + 1]; ++k) {
            const int c = ri[k];
            if (!in_touch[c]) {
              in_touch[c] = 1;
              coef_touch.push_back(c);
            }
            coef_dense[c] += rw.second * rx[k];
          }
        // substitute single-continuous equality rows first
        bool did_sub = false;
        for (int j : coef_touch) {
          const double cj = coef_dense[j];
          if (sub_row[j] >= 0 && std::fabs(cj) > kEps &&
              !in_path[sub_row[j]]) {
            const double w = -cj / sub_val[j];
            if (std::fabs(w) > kEps && std::fabs(w) <= max_w) {
              agg.push_back({sub_row[j], w});
              in_path[sub_row[j]] = 1;
              path_rows.push_back(sub_row[j]);
              did_sub = true;
            }
          }
        }
        if (did_sub) {
          for (int c : coef_touch) {
            coef_dense[c] = 0.0;
            in_touch[c] = 0;
          }
          continue;
        }
        const bool success = path_rows.size() > 1 ? try_cut() : false;
        // elimination target: continuous col farthest inside bounds
        int best_j = -1;
        double best_bd = feastol;
        for (int j : coef_touch) {
          if (j >= n || is_int[j] || std::fabs(coef_dense[j]) <= kEps)
            continue;
          if (bd[j] > best_bd &&
              (!in_arcs[j].empty() || !out_arcs[j].empty())) {
            best_j = j;
            best_bd = bd[j];
          }
        }
        const double cj = best_j >= 0 ? coef_dense[best_j] : 0.0;
        for (int c : coef_touch) {
          coef_dense[c] = 0.0;
          in_touch[c] = 0;
        }
        if (success || best_j < 0) break;
        // partner from the opposite-sign arc list (positive weight)
        auto pick_from = [&](const std::vector<Arc>& arcs) -> int {
          int cnt = 0;
          for (const auto& a : arcs) {
            const double w = std::fabs(cj / a.val);
            if (!in_path[a.row] && w > kEps && w <= max_w) ++cnt;
          }
          if (cnt == 0) return -1;
          int pick = rng.below(cnt);
          for (size_t ai = 0; ai < arcs.size(); ++ai) {
            const double w = std::fabs(cj / arcs[ai].val);
            if (!in_path[arcs[ai].row] && w > kEps && w <= max_w) {
              if (pick == 0) return static_cast<int>(ai);
              --pick;
            }
          }
          return -1;
        };
        const std::vector<Arc>& first =
            cj < 0 ? in_arcs[best_j] : out_arcs[best_j];
        const std::vector<Arc>& second =
            cj < 0 ? out_arcs[best_j] : in_arcs[best_j];
        int ai = pick_from(first);
        const std::vector<Arc>* src = &first;
        if (ai < 0) {
          ai = pick_from(second);
          src = &second;
        }
        if (ai < 0) break;
        const Arc& a = (*src)[ai];
        agg.push_back({a.row, -cj / a.val});
        in_path[a.row] = 1;
        path_rows.push_back(a.row);
      }
      for (int r : path_rows) in_path[r] = 0;
      if (n_cuts >= max_cuts) break;
    }
  }
  return n_cuts;
}

// Integral scale of a coefficient vector (reference
// HighsIntegers::integralScale): smallest positive s with s*values all
// within tolerance of integers, computed via per-value continued
// fraction denominators and an lcm/gcd reduction.  Returns 0.0 when no
// admissible scale exists.  (The python/numpy version paid ~0.2ms of
// array-op overhead per call on 10-50 coefficient cuts; this runs in
// ~1us.)
extern "C" double hx_integral_scale(const double* values, int n,
                                    double deltadown, double deltaup,
                                    long long max_denom,
                                    double max_scale) {
  const double tol = deltadown > deltaup ? deltadown : deltaup;
  long long denom = 1;
  bool any = false;
  for (int i = 0; i < n; ++i) {
    double v = std::fabs(values[i]);
    if (v == 0.0) continue;
    any = true;
    double r0 = std::floor(v + 0.5);
    if (std::fabs(v - r0) <= tol * std::max(1.0, r0)) continue;
    // continued fraction denominator for v with q <= max_denom
    double x = v;
    double a = std::floor(x);
    double num_prev = 1.0, num = a, den_prev = 0.0, den = 1.0;
    double frac = x - a;
    for (int it = 0; it < 40 && frac > 1e-12; ++it) {
      double inv = 1.0 / frac;
      a = std::floor(inv);
      double nn = a * num + num_prev;
      double nd = a * den + den_prev;
      if (nd > (double)max_denom) break;
      num_prev = num; num = nn;
      den_prev = den; den = nd;
      frac = inv - a;
      if (std::fabs(x - num / den) <= 1e-12 * std::max(1.0, x)) break;
    }
    long long q = (long long)den;
    if (q <= 0) q = 1;
    long long g = denom;
    long long b = q;
    while (b) { long long t = g % b; g = b; b = t; }
    denom = denom / g * q;
    if ((double)denom > max_scale) return 0.0;
  }
  if (!any) return 0.0;
  // verify and reduce by the gcd of the scaled integers
  long long gg = 0;
  for (int i = 0; i < n; ++i) {
    double v = values[i];
    if (v == 0.0) continue;
    double s = v * (double)denom;
    double r = std::floor(s + 0.5);
    if (std::fabs(s - r) > tol * std::max(1.0, std::fabs(r)))
      return 0.0;
    long long ri = (long long)std::fabs(r);
    if (ri == 0) continue;
    long long a2 = gg, b2 = ri;
    while (b2) { long long t = a2 % b2; a2 = b2; b2 = t; }
    gg = a2;
  }
  if (gg == 0) return 0.0;
  return (double)denom / (double)gg;
}

// Batched c-MIR over many <= rows in ONE call (the per-row ctypes
// round trip costs ~30us of marshaling — cut-heavy roots make tens of
// thousands of them).  Row t's support is rows_cols/rows_vals
// [row_ptr[t], row_ptr[t+1]); outputs are packed at out_ptr[t] with
// per-row capacity out_cap_each; n_out[t] = entry count (0 = no cut,
// -1 = capacity overflow — caller retries that row singly).
extern "C" void hx_mir_batch(
    int n_rows, const int64_t* row_ptr, const int64_t* rows_cols,
    const double* rows_vals, const double* rhs_arr,
    const double* x, const double* lo, const double* up,
    const int8_t* is_int, double feastol, int prefer_vbds,
    int64_t n_vb, const int64_t* vb_ptr, const int32_t* vb_y,
    const double* vb_c1, const double* vb_c0, const uint8_t* vb_isub,
    int out_cap_each, int64_t* out_cols, double* out_vals,
    double* out_rhs, double* out_eff, int* n_out) {
  for (int t = 0; t < n_rows; ++t) {
    const int64_t s = row_ptr[t];
    const int nnz = (int)(row_ptr[t + 1] - s);
    n_out[t] = hx_mir_on_leq(
        nnz, rows_cols + s, rows_vals + s, rhs_arr[t], x, lo, up,
        is_int, feastol, prefer_vbds, n_vb, vb_ptr, vb_y, vb_c1,
        vb_c0, vb_isub, out_cap_each,
        out_cols + (int64_t)t * out_cap_each,
        out_vals + (int64_t)t * out_cap_each,
        out_rhs + t, out_eff + t);
  }
}
