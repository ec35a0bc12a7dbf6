"""Interior-point LP solver (TPU, normal-equations based).

Regularized predictor-corrector IPM on the dense normal equations
A·diag(theta)·A' (SURVEY §7.4): see solver.py.  Used both standalone
("ipm" / "ipx" / "hipo" solver options) and as the high-accuracy polish
stage after PDHG.
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
