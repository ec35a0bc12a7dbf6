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

# problems beyond this row count use the IPM path (the dense basis
# inverse is O(m^2) per pivot)
SIMPLEX_MAX_ROWS = 3000


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

    result, x, y, z, basis_out, iters = simplex_solve(
        lp.a_matrix.to_scipy().tocsc(), sense * lp.col_cost,
        lp.col_lower, lp.col_upper, lp.row_lower, lp.row_upper,
        basis_in=basis_in,
        tol_p=options.primal_feasibility_tolerance * 1e-2,
        tol_d=options.dual_feasibility_tolerance * 1e-2,
        max_iter=min(options.simplex_iteration_limit, 10**7))

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
