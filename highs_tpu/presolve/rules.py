"""Vectorized presolve rule loop (placeholder: identity).

Full rules (singleton rows/cols, doubleton equations, forcing/redundant
rows, parallel rows/cols, dominated cols, dual fixing — reference
HPresolve.cpp + HighsPostsolveStack.h) land in a later milestone; until
then this is a correct no-op so the pipeline exercises the same code
path.
"""
from __future__ import annotations

from ..constants import HighsModelStatus
from ..models.lp import HighsLp
from ..models.solution import HighsSolution
from ..options import HighsOptions
from .presolve import PresolveResult


def run_presolve_rules(lp: HighsLp, options: HighsOptions) -> PresolveResult:
    return PresolveResult(HighsModelStatus.kNotset, lp, reduced=False)


def postsolve_rules(original_lp: HighsLp, presolve_result: PresolveResult,
                    solution: HighsSolution) -> HighsSolution:
    return solution
