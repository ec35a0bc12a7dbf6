"""Interior-point LP solver (TPU, normal-equations based).

Target design (SURVEY §7.4): regularized predictor-corrector IPM on the
normal equations A·diag(theta)·A', batched Cholesky / preconditioned CG
on device, used both standalone ("ipm" solver option) and as the polish
stage after PDHG.  Until the IPM core lands, this wrapper delegates to
the PDHG solver at the IPM optimality tolerance so the "ipm"/"ipx"/
"hipo" solver options behave.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ...constants import HighsModelStatus
from ...models.lp import HighsLp
from ...options import HighsOptions


def solve_lp_ipm(lp: HighsLp, options: HighsOptions, log=None,
                 x0: Optional[np.ndarray] = None):
    from .solver import solve_lp_ipm_native
    return solve_lp_ipm_native(lp, options, log=log, x0=x0)
