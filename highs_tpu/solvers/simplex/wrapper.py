"""Simplex solver entry ("simplex" solver option).

Runs the native bounded-variable revised simplex (native/hsimplex.cpp —
the sequential pivot loop stays on the host CPU, like the reference's
C++ simplex, SURVEY §3.1) and returns a vertex solution with a valid
basis.  For problems too large for the dense basis inverse it falls
back to IPM + cleanup.
"""
from __future__ import annotations

import dataclasses
import math
import time
from typing import Optional, Tuple

import numpy as np

from ...constants import (HighsBasisStatus, HighsModelStatus)
from ...models.lp import HighsLp
from ...models.solution import HighsBasis, HighsSolution
from ...options import HighsOptions


@dataclasses.dataclass
class SimplexRunInfo:
    status: HighsModelStatus = HighsModelStatus.kNotset
    iterations: int = 0
    simplex_iterations: int = 0
    primal_obj: float = 0.0
    solve_time: float = 0.0
    basis: Optional[HighsBasis] = None


_STATUS_MAP = {
    0: HighsBasisStatus.kLower,
    1: HighsBasisStatus.kBasic,
    2: HighsBasisStatus.kUpper,
    3: HighsBasisStatus.kZero,
}

# problems beyond this row count use the IPM path (the sparse-LU
# kernel scales much further than the old dense inverse; the remaining
# limit reflects the serial pricing loop, not memory)
SIMPLEX_MAX_ROWS = 20000


def basis_from_statuses(statuses: np.ndarray, n: int, m: int) -> HighsBasis:
    basis = HighsBasis(valid=True)
    basis.col_status = [_STATUS_MAP[int(s)] for s in statuses[:n]]
    basis.row_status = [_STATUS_MAP[int(s)] for s in statuses[n:n + m]]
    return basis


def solve_lp_simplex(lp: HighsLp, options: HighsOptions, log=None,
                     basis: Optional[HighsBasis] = None
                     ) -> Tuple[HighsModelStatus, HighsSolution,
                                SimplexRunInfo]:
    t0 = time.perf_counter()
    info = SimplexRunInfo()
    if lp.num_row == 0:
        from ..pdlp.wrapper import _solve_bound_lp
        status, sol = _solve_bound_lp(lp)
        info.status = status
        if sol.value_valid:
            info.primal_obj = float(lp.col_cost @ sol.col_value) + lp.offset
        return status, sol, info
    if lp.num_row > SIMPLEX_MAX_ROWS:
        from ..ipm.wrapper import solve_lp_ipm
        return solve_lp_ipm(lp, options, log=log)

    from .native import (RESULT_INFEASIBLE, RESULT_ITER_LIMIT,
                         RESULT_OPTIMAL, RESULT_UNBOUNDED, simplex_solve)

    sense = float(lp.sense)
    basis_in = None
    if basis is not None and basis.valid and \
            len(basis.col_status) == lp.num_col and \
            len(basis.row_status) == lp.num_row:
        rev = {v: k for k, v in _STATUS_MAP.items()}
        basis_in = np.array(
            [rev.get(HighsBasisStatus(int(s)), 0)
             for s in list(basis.col_status) + list(basis.row_status)],
            dtype=np.int8)

    # ---- dualization strategy (reference HApp.h:206-214 via
    # simplex_dualize_strategy): cold-started tall LPs solve their
    # bounded-variable dual (n rows instead of m), then the status
    # guess mapped back warm-starts the native engine, which certifies
    # the solution primal-side (the undualize() role)
    _dz_strat = int(getattr(options, "simplex_dualize_strategy", -1))
    if basis_in is None and \
            not getattr(options, "_in_dualize", False):
        from .dualize import (build_dual_lp, primal_status_guess,
                              should_dualize)
        if should_dualize(lp, _dz_strat, False):
            built = build_dual_lp(lp, sense)
            if built is not None:
                import copy as _copy
                dual_lp, _dz_meta = built
                d_opts = _copy.copy(options)
                d_opts._in_dualize = True
                d_opts.simplex_dualize_strategy = -1
                if log is not None:
                    log(f"Simplex dualize: solving the dual "
                        f"({dual_lp.num_row} rows x "
                        f"{dual_lp.num_col} cols)")
                _dst, _dsol, _dinfo = solve_lp_simplex(
                    dual_lp, d_opts, log=None)
                if _dst == HighsModelStatus.kOptimal:
                    _guess = primal_status_guess(lp, sense, _dsol,
                                                 _dz_meta)
                    if _guess is not None:
                        basis_in = _guess

    # native pivot budget: highly degenerate instances (e.g. greenbea)
    # crawl in primal phase 1; past this budget the IPM + crossover
    # route is faster and still ends at a vertex basis (the reference
    # solves those with dual simplex + DSE)
    native_budget = min(options.simplex_iteration_limit,
                        max(100000, 100 * lp.num_row))
    _cbs = getattr(options, "_callbacks", None)
    from ...constants import HighsCallbackType as _CbT
    _si_active = _cbs is not None and _cbs.callback_active(
        _CbT.kCallbackSimplexInterrupt)
    _a_solve = lp.a_matrix.to_scipy().tocsc()
    _kw = dict(
        tol_p=options.primal_feasibility_tolerance * 1e-2,
        tol_d=options.dual_feasibility_tolerance * 1e-2,
        time_limit=min(options.time_limit, 1e18))
    if not _si_active:
        # The reference's default LP engine is DUAL simplex with DSE
        # (HEkkDual); try the native dual engine first under a strict
        # pivot cap — on many Netlib instances it lands near the
        # reference's own iteration counts (shell 559 vs 623,
        # standata 67 vs 72) and runs ~4x faster than the primal
        # engine.  Anything but a verified optimum falls through to
        # the battle-tested primal path (cold-start duals can cycle
        # or mis-certify on degenerate instances — greenbea).
        result = None
        if basis_in is None and lp.num_row >= 2:
            from .dual_native import (RESULT_OPTIMAL as _DOPT,
                                      dual_solve)
            from .native import _ruiz_scales
            import scipy.sparse as _sp
            _a_csc = _a_solve
            _sc = _ruiz_scales(_a_csc)
            if _sc is not None:
                _r, _c = _sc
                _a_d = (_sp.diags(_r) @ _a_csc @ _sp.diags(_c)).tocsc()
            else:
                _r = _c = None
                _a_d = _a_csc
            _cost_d = sense * lp.col_cost * (_c if _c is not None
                                             else 1.0)
            def _scl(v, f, mul):
                if f is None:
                    return v
                return np.where(np.isfinite(v),
                                v * f if mul else v / f, v)
            _cl_d = _scl(lp.col_lower, _c, False)
            _cu_d = _scl(lp.col_upper, _c, False)
            _rl_d = _scl(lp.row_lower, _r, True)
            _ru_d = _scl(lp.row_upper, _r, True)
            _cap = int(min(native_budget, 6 * lp.num_row + 4000))
            rd, xd, yd, zd, bd, itd = dual_solve(
                _a_d, _a_d.tocsr(), _cost_d, _cl_d, _cu_d, _rl_d,
                _ru_d, tol_p=_kw["tol_p"], tol_d=_kw["tol_d"],
                max_iter=_cap, time_limit=_kw["time_limit"])
            if rd == _DOPT:
                if _c is not None:
                    xd = xd * _c
                    yd = yd * _r
                    zd = zd / _c
                ax_d = _a_csc @ xd
                feas = (np.all(ax_d >= lp.row_lower - 1e-6) and
                        np.all(ax_d <= lp.row_upper + 1e-6) and
                        np.all(xd >= lp.col_lower - 1e-6) and
                        np.all(xd <= lp.col_upper + 1e-6))
                if feas:
                    result, x, y, z, basis_out, iters = (
                        0, xd, yd, zd, bd, itd)
        if result is None:
            result, x, y, z, basis_out, iters = simplex_solve(
                _a_solve, sense * lp.col_cost,
                lp.col_lower, lp.col_upper, lp.row_lower, lp.row_upper,
                basis_in=basis_in, max_iter=native_budget, **_kw)
    else:
        # kCallbackSimplexInterrupt (reference: fired per iteration,
        # HEkk.cpp:3460): the native pivot loop runs in chunks with
        # the callback fired between them
        iters = 0
        _chunk = 2000
        _b_cur = basis_in
        _interrupted = False
        while True:
            result, x, y, z, basis_out, it_c = simplex_solve(
                _a_solve, sense * lp.col_cost,
                lp.col_lower, lp.col_upper, lp.row_lower, lp.row_upper,
                basis_in=_b_cur,
                max_iter=min(_chunk, native_budget - iters), **_kw)
            iters += it_c
            if result != RESULT_ITER_LIMIT or iters >= native_budget:
                break
            _cbs.data_out.simplex_iteration_count = iters
            _cbs.data_out.running_time = time.perf_counter() - t0
            if _cbs.call(_CbT.kCallbackSimplexInterrupt,
                         "Simplex interrupt"):
                _interrupted = True
                break
            _b_cur = basis_out
        if _interrupted:
            info.iterations = iters
            info.simplex_iterations = iters
            info.status = HighsModelStatus.kInterrupt
            info.solve_time = time.perf_counter() - t0
            return info.status, HighsSolution(), info

    info.iterations = iters
    info.simplex_iterations = iters
    info.solve_time = time.perf_counter() - t0
    if result == RESULT_OPTIMAL:
        info.status = HighsModelStatus.kOptimal
    elif result == RESULT_INFEASIBLE:
        info.status = HighsModelStatus.kInfeasible
        return info.status, HighsSolution(), info
    elif result == RESULT_UNBOUNDED:
        info.status = HighsModelStatus.kUnbounded
        return info.status, HighsSolution(), info
    elif result == RESULT_ITER_LIMIT and \
            native_budget < options.simplex_iteration_limit and \
            _elastic_says_infeasible(lp, options):
        # phase-1 stall arbiter: the elastic LP  min 1'(p+q) s.t.
        # rl <= Ax + p - q <= ru  is always feasible (phase 2 only, so
        # it cannot stall in phase-1 degeneracy); a strictly positive
        # optimum certifies infeasibility of the original LP
        info.status = HighsModelStatus.kInfeasible
        return info.status, HighsSolution(), info
    elif result == RESULT_ITER_LIMIT and \
            native_budget < options.simplex_iteration_limit:
        # budget exhausted (not a user limit): IPM -> crossover gives a
        # vertex basis; the crossover cleanup re-enters the native
        # simplex warm-started near the optimum
        from ..ipm.wrapper import solve_lp_ipm
        st, sol, raw = solve_lp_ipm(lp, options, log=log)
        if sol.value_valid and st in (HighsModelStatus.kOptimal,
                                      HighsModelStatus.kUnknown,
                                      HighsModelStatus.kIterationLimit):
            # even an imprecise interior point is a good crossover seed:
            # the warm-started cleanup simplex proves optimality itself
            # (reference: IPM "imprecise" -> simplex cleanup,
            # HighsSolve.cpp:123-163)
            from .crossover import crossover_from_solution
            st2, sol2, info2 = crossover_from_solution(lp, options, sol)
            if st2 == HighsModelStatus.kOptimal:
                info2.ipm_iterations = raw.iterations
                info2.simplex_iterations = iters + info2.iterations
                return st2, sol2, info2
        return st, sol, raw
    elif result == RESULT_ITER_LIMIT:
        info.status = HighsModelStatus.kIterationLimit
    else:
        # singular/numerical failure: IPM fallback
        from ..ipm.wrapper import solve_lp_ipm
        return solve_lp_ipm(lp, options, log=log)

    row_value = lp.a_matrix.to_scipy() @ x
    sol = HighsSolution(
        value_valid=True, dual_valid=True,
        col_value=x, col_dual=sense * z,
        row_value=row_value, row_dual=sense * y)
    info.primal_obj = float(lp.col_cost @ x) + lp.offset
    info.basis = basis_from_statuses(basis_out, lp.num_col, lp.num_row)
    return info.status, sol, info


def _elastic_says_infeasible(lp: HighsLp, options: HighsOptions) -> bool:
    """Solve the elastic feasibility LP with the native simplex and
    report whether its optimum certifies primal infeasibility."""
    import scipy.sparse as sp

    from .native import RESULT_OPTIMAL, simplex_solve

    m = lp.num_row
    if m == 0:
        return bool(np.any(lp.col_lower > lp.col_upper + 1e-9))
    a = lp.a_matrix.to_scipy().tocsc()
    ident = sp.identity(m, format="csc")
    a_el = sp.hstack([a, ident, -ident]).tocsc()
    cost = np.concatenate([np.zeros(lp.num_col), np.ones(2 * m)])
    lo_el = np.concatenate([lp.col_lower, np.zeros(2 * m)])
    up_el = np.concatenate([lp.col_upper, np.full(2 * m, np.inf)])
    result, x, _y, _z, _b, _it = simplex_solve(
        a_el, cost, lo_el, up_el, lp.row_lower, lp.row_upper,
        tol_p=1e-9, tol_d=1e-9,
        max_iter=max(100000, 50 * (lp.num_col + m)),
        time_limit=min(options.time_limit, 1e18))
    if result != RESULT_OPTIMAL:
        return False  # inconclusive
    scale = 1.0 + float(np.max(np.abs(np.where(
        np.isfinite(lp.row_upper), lp.row_upper, 0.0)), initial=0.0))
    return float(cost @ x) > 1e-7 * scale
