"""Convex QP solver entry.

Dispatches to the QP interior-point solver (ipm_qp.py) — the TPU-native
replacement for the reference's QUASS active set (qpsolver/a_quass.cpp)
and HiPO-QP (Highs.cpp:4160).  A prox-PDHG path (Q in the primal prox
step) is the planned large-scale alternative (SURVEY §7.6).
"""
from __future__ import annotations

from ...constants import HighsModelStatus
from ...models.lp import HighsModel
from ...models.solution import HighsSolution
from ...options import HighsOptions


def solve_qp(model: HighsModel, options: HighsOptions, log=None):
    # small QPs run on the CPU backend: below MXU-payoff size the
    # accelerator contributes only compile latency (a 3-variable QP
    # paid ~200s of device compile before this gate)
    lp = model.lp
    if lp.num_row * max(1, lp.num_col) <= 1_000_000 and \
            lp.num_col <= 2000:
        import jax
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None and jax.default_backend() != "cpu":
            with jax.default_device(cpu):
                return _solve_qp_impl(model, options, log=log)
    return _solve_qp_impl(model, options, log=log)


def _solve_qp_impl(model: HighsModel, options: HighsOptions, log=None):
    # "qpasm" selects the active-set method (reference: QUASS,
    # qpsolver/a_quass.cpp; solver option values HighsOptions.h:274-280)
    if options.solver == "qpasm":
        from .active_set import solve_qp_active_set
        status, solution, info = solve_qp_active_set(
            model, options, log=log)
        if status in (HighsModelStatus.kOptimal,
                      HighsModelStatus.kInfeasible,
                      HighsModelStatus.kUnbounded,
                      HighsModelStatus.kTimeLimit):
            return status, solution, info
        if log is not None:
            log("QP active set inconclusive: falling back to IPM")
    from .ipm_qp import solve_qp_ipm
    status, solution, info = solve_qp_ipm(model, options, log=log)
    if status in (HighsModelStatus.kUnknown,
                  HighsModelStatus.kIterationLimit):
        from ..classify import classify_qp_inconclusive
        verdict = classify_qp_inconclusive(model, options, log=log)
        if verdict in (HighsModelStatus.kInfeasible,
                       HighsModelStatus.kUnbounded):
            info.status = verdict
            return verdict, HighsSolution(), info
        # IPM stalled on a feasible QP: the active-set method is the
        # exact fallback at host-tractable sizes (reference analogue:
        # HiPO-QP falls back to QUASS via callSolveQp selection)
        if model.lp.num_col + model.lp.num_row <= 5000:
            from .active_set import solve_qp_active_set
            st2, sol2, info2 = solve_qp_active_set(model, options,
                                                   log=log)
            if st2 in (HighsModelStatus.kOptimal,
                       HighsModelStatus.kInfeasible,
                       HighsModelStatus.kUnbounded):
                if log is not None:
                    log("QP IPM inconclusive: active-set fallback "
                        "succeeded")
                return st2, sol2, info2
    return status, solution, info
