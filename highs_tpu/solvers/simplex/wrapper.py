"""Simplex solver entry ("simplex" solver option).

Design (SURVEY §7.4): the strictly sequential pivot loop does not map to
TPU; the reference's dual simplex survives here as a host-side
crossover/cleanup stage (native C++ LU planned under native/).  Until
that lands, "simplex" delegates to the first-order + IPM pipeline, which
produces the same optimal objective/model status (iteration counts are
not comparable).
"""
from __future__ import annotations

from ...models.lp import HighsLp
from ...options import HighsOptions


def solve_lp_simplex(lp: HighsLp, options: HighsOptions, log=None,
                     basis=None):
    from ..pdlp.wrapper import solve_lp_pdlp
    return solve_lp_pdlp(lp, options)
