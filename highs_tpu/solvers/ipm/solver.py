"""IPM core (temporary delegation).

The real normal-equations predictor-corrector IPM lands in the next
milestone; until then "ipm" solves via PDHG at the IPM tolerance.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ...models.lp import HighsLp
from ...options import HighsOptions


def solve_lp_ipm_native(lp: HighsLp, options: HighsOptions, log=None,
                        x0: Optional[np.ndarray] = None):
    from ..pdlp.wrapper import solve_lp_pdlp
    import copy
    opts = copy.copy(options)
    return solve_lp_pdlp(lp, options, x0=x0)
