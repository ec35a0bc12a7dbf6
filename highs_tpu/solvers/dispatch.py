"""LP solver selection and dispatch.

Equivalent of the reference's free function `solveLp`
(lp_data/HighsSolve.cpp:20, selection :41-117): picks the solver from the
`solver` option, runs presolve when enabled, solves the (reduced) LP and
postsolves.  Solver strings follow the reference
(HighsOptions.h:274-280): "simplex" / "choose" / "ipm" / "ipx" / "hipo" /
"pdlp" / "hipdlp" / "qpasm".

On TPU the workhorse is PDLP (restarted Halpern PDHG); "ipm" runs the
TPU interior-point solver; "simplex" runs the (host) dual simplex
cleanup solver once available, else falls back to IPM polish.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

from ..constants import HighsModelStatus, HighsStatus
from ..models.lp import HighsLp
from ..models.solution import HighsBasis, HighsSolution
from ..options import HighsOptions


@dataclasses.dataclass
class LpSolveInfo:
    iterations: int = 0
    simplex_iteration_count: int = -1
    ipm_iteration_count: int = -1
    crossover_iteration_count: int = -1
    pdlp_iteration_count: int = -1
    solve_time: float = 0.0
    basis: Optional[HighsBasis] = None


def solve_lp(lp: HighsLp, options: HighsOptions, log=None,
             presolve: bool = True,
             basis: Optional[HighsBasis] = None,
             warm_solution: Optional[HighsSolution] = None
             ) -> Tuple[HighsModelStatus, HighsSolution, LpSolveInfo]:
    info = LpSolveInfo()
    solver = options.solver or "choose"

    import time as _time
    if math.isfinite(options.time_limit):
        # absolute deadline shared by every stage of this solve (a
        # multi-stage "choose" cascade must not restart the clock)
        options._solve_deadline = _time.perf_counter() + \
            options.time_limit
    else:
        options._solve_deadline = None

    # named clocks (reference HighsTimer registry); the facade passes
    # its timer via the internal _timer attribute
    timer = getattr(options, "_timer", None)

    class _NullScope:
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    def clock(name):
        return timer.scope(name) if timer is not None else _NullScope()

    reduced_lp = lp
    postsolve_stack = None
    if presolve:
        from ..presolve.presolve import presolve_lp
        with clock("presolve"):
            presolve_result = presolve_lp(lp, options)
        if presolve_result.status == HighsModelStatus.kInfeasible:
            return HighsModelStatus.kInfeasible, HighsSolution(), info
        if presolve_result.status == HighsModelStatus.kUnbounded:
            return HighsModelStatus.kUnbounded, HighsSolution(), info
        if presolve_result.status == \
                HighsModelStatus.kUnboundedOrInfeasible:
            return (HighsModelStatus.kUnboundedOrInfeasible,
                    HighsSolution(), info)
        reduced_lp = presolve_result.reduced_lp
        postsolve_stack = presolve_result

    if options.icrash and warm_solution is None and reduced_lp.num_col:
        # iterative crash starting point (reference ICrash.cpp; the
        # result warm-starts the first-order/IPM solvers)
        from .icrash import run_icrash
        with clock("icrash"):
            icrash_info = run_icrash(reduced_lp, options, log=log)
        if icrash_info.x is not None:
            from ..models.solution import HighsSolution as _Sol
            warm_solution = _Sol(
                value_valid=True, dual_valid=True,
                col_value=icrash_info.x,
                row_value=(reduced_lp.a_matrix.to_scipy() @
                           icrash_info.x if reduced_lp.num_row
                           else np.zeros(0)),
                col_dual=np.zeros(reduced_lp.num_col),
                row_dual=icrash_info.lambda_)
        if log is not None:
            log(f"iCrash: {icrash_info.num_iterations} iterations, "
                f"residual {icrash_info.final_residual_norm2:.3e}, "
                f"time {icrash_info.total_time:.2f}s")

    with clock("solve"):
        status, solution, raw_info = _solve_core(
            reduced_lp, options, solver, log, basis, warm_solution)

    # presolved-model dimensions for the run-data registry (reference
    # HighsRunData.h:29-47; equal to the full model when presolve is
    # off or reduced nothing)
    info.presolved_num_col = reduced_lp.num_col
    info.presolved_num_row = reduced_lp.num_row
    info.presolved_num_nz = reduced_lp.a_matrix.num_nz
    info.iterations = raw_info.iterations
    info.solve_time = raw_info.solve_time
    ipm_iters = getattr(raw_info, "ipm_iterations", -1)
    simplex_iters = getattr(raw_info, "simplex_iterations", -1)
    crossover_iters = getattr(raw_info, "crossover_iterations", -1)
    if crossover_iters >= 0:
        info.crossover_iteration_count = crossover_iters
        info.ipm_iteration_count = ipm_iters
    elif simplex_iters > 0:
        info.simplex_iteration_count = simplex_iters
    elif ipm_iters > 0:
        info.ipm_iteration_count = ipm_iters
    else:
        info.pdlp_iteration_count = raw_info.iterations
    info.basis = getattr(raw_info, "basis", None)

    if postsolve_stack is not None and solution.value_valid:
        from ..presolve.presolve import postsolve_lp
        with clock("postsolve"):
            solution, full_basis = postsolve_lp(lp, postsolve_stack,
                                                solution, basis=info.basis)
        info.basis = full_basis
    return status, solution, info


def _deadline_exceeded(options) -> bool:
    import time as _time
    dl = getattr(options, "_solve_deadline", None)
    return dl is not None and _time.perf_counter() > dl


def _remaining_time(options) -> float:
    import time as _time
    dl = getattr(options, "_solve_deadline", None)
    if dl is None:
        return math.inf
    return max(0.0, dl - _time.perf_counter())


class _TimeoutInfo:
    iterations = 0
    solve_time = 0.0


def _solve_core(lp: HighsLp, options: HighsOptions, solver: str, log,
                basis, warm_solution):
    x0 = warm_solution.col_value if (
        warm_solution is not None and options.use_warm_start and
        len(warm_solution.col_value) == lp.num_col) else None
    y0 = warm_solution.row_dual if (
        warm_solution is not None and options.use_warm_start and
        warm_solution.dual_valid and
        len(warm_solution.row_dual) == lp.num_row) else None

    if solver in ("ipm", "ipx", "hipo"):
        from .ipm.wrapper import solve_lp_ipm
        status, solution, raw = solve_lp_ipm(lp, options, log=log)
        if status == HighsModelStatus.kOptimal and \
                options.run_crossover == "on" and \
                lp.num_row <= 3000:
            # reference behavior: IPM runs crossover to a vertex basis
            # by default (run_crossover default "on", IpxWrapper)
            from .simplex.crossover import crossover_from_solution
            st2, sol2, info2 = crossover_from_solution(lp, options,
                                                       solution)
            if st2 == HighsModelStatus.kOptimal:
                info2.ipm_iterations = raw.iterations
                info2.crossover_iterations = info2.iterations
                return st2, sol2, info2
        return status, solution, raw
    if solver == "simplex":
        from .simplex.wrapper import solve_lp_simplex
        return solve_lp_simplex(lp, options, log=log, basis=basis)

    # IPM capacity model (not a dense cap): small problems factor the
    # normal matrix DENSE (MXU/host BLAS); mid-to-large sparse problems
    # use the native sparse LDL' (ipm/sparse_ldl.py, native/hipm.cpp)
    # whose symbolic analysis self-aborts on fill-catastrophic
    # patterns and falls back to matrix-free CG — so the gate only
    # excludes sizes where even the CG matvecs are uncompetitive with
    # the PDHG workhorse.
    _nnz = int(lp.a_matrix.num_nz)
    # the m<=2500 band may factor the normal matrix DENSE, so it must
    # also bound the dense working-set bytes (a 2500-row x 5M-col LP
    # would otherwise materialize a ~100GB array); wider/larger
    # problems stay sparse end-to-end (ldl / sparse CG) so only nnz
    # matters there
    ipm_ok = ((lp.num_row <= 2500 and
               lp.num_row * (lp.num_col + lp.num_row) <= (1 << 26)) or
              (lp.num_row <= 80000 and _nnz <= 2_000_000))

    if solver == "choose" and (
            lp.num_row <= 1500 or
            (lp.num_row <= 20000 and
             lp.a_matrix.to_scipy().nnz <= 120_000)):
        # small or very sparse problems: the native simplex gives an
        # exact vertex solution with a basis fastest (the reference's
        # default LP solver is also simplex); sparsity is what the
        # sparse-LU node engine cares about, not the row count
        # (cplex1.mps: 3005 rows, 8944 nonzeros, infeasible in 1s via
        # simplex vs minutes of dense-IPM compile)
        from .simplex.wrapper import solve_lp_simplex
        status, solution, info = solve_lp_simplex(lp, options, log=log,
                                                  basis=basis)
        if status in (HighsModelStatus.kOptimal,
                      HighsModelStatus.kInfeasible,
                      HighsModelStatus.kUnbounded,
                      HighsModelStatus.kInterrupt):
            return status, solution, info

    if solver == "choose" and ipm_ok:
        # "choose": high-accuracy IPM first on problems where the dense
        # normal-equations solve fits; PDHG is the fallback and the
        # workhorse at scale
        from .ipm.wrapper import solve_lp_ipm
        status, solution, info = solve_lp_ipm(lp, options, log=log)
        if status in (HighsModelStatus.kOptimal,
                      HighsModelStatus.kInfeasible,
                      HighsModelStatus.kUnbounded,
                      HighsModelStatus.kInterrupt):
            return status, solution, info
        # IPM could not conclude: classify infeasible/unbounded exactly
        # via elastic feasibility LPs (reference analogue: simplex
        # phase 1 / IPX termination states)
        from .classify import classify_inconclusive
        if _deadline_exceeded(options):
            info.status = HighsModelStatus.kTimeLimit
            return HighsModelStatus.kTimeLimit, solution, info
        verdict = classify_inconclusive(lp, options, log=log)
        if verdict in (HighsModelStatus.kInfeasible,
                       HighsModelStatus.kUnbounded):
            return verdict, HighsSolution(), info
        from .pdlp.wrapper import solve_lp_pdlp
        return solve_lp_pdlp(lp, options, x0=x0, y0=y0)

    # pdlp / hipdlp / large "choose" -> PDHG workhorse
    from .pdlp.wrapper import solve_lp_pdlp
    if _deadline_exceeded(options):
        return (HighsModelStatus.kTimeLimit, HighsSolution(),
                _TimeoutInfo())
    status, solution, info = solve_lp_pdlp(lp, options, x0=x0, y0=y0)

    if solver == "choose" and status not in (
            HighsModelStatus.kOptimal, HighsModelStatus.kInfeasible,
            HighsModelStatus.kUnbounded) and ipm_ok:
        # reference behavior: an "unwelcome" first-order status falls back
        # to a cleanup solve (HighsSolve.cpp:123-163); use IPM polish
        try:
            from .ipm.wrapper import solve_lp_ipm
            status2, solution2, info2 = solve_lp_ipm(
                lp, options, log=log,
                x0=solution.col_value if solution.value_valid else None)
            if status2 == HighsModelStatus.kOptimal:
                info2.iterations += info.iterations
                return status2, solution2, info2
        except Exception:
            pass
    return status, solution, info
