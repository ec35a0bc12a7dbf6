"""Convex QP solver entry (placeholder until the QP prox-PDHG lands).

Design (SURVEY §7.6): add 1/2 x'Qx to the PDHG primal step — the primal
update becomes a proximal step, still elementwise-plus-SpMV — and to the
IPM.  Reference behavior: qpsolver/a_quass.cpp active set / HiPO QP.
"""
from __future__ import annotations

from ...constants import HighsModelStatus
from ...models.lp import HighsModel
from ...models.solution import HighsSolution
from ...options import HighsOptions


def solve_qp(model: HighsModel, options: HighsOptions, log=None):
    from .pdqp import solve_qp_pdhg
    return solve_qp_pdhg(model, options, log=log)
