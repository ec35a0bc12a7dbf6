"""Solution writers (reference: HighsModelUtils.cpp writeSolutionFile,
solution styles HConst.h:157-165)."""
from __future__ import annotations

import sys

import numpy as np

from ..constants import (HighsModelStatus, HighsStatus, SolutionStyle,
                         model_status_to_string)


def write_solution(highs, filename: str = "", style: int = 0) -> HighsStatus:
    lp = highs.getLp()
    sol = highs.getSolution()
    info = highs.getInfo()
    status = highs.getModelStatus()
    lines = []
    pretty = style == int(SolutionStyle.kSolutionStylePretty)

    col_names = (lp.col_names if len(lp.col_names) == lp.num_col
                 else [f"C{j}" for j in range(lp.num_col)])
    row_names = (lp.row_names if len(lp.row_names) == lp.num_row
                 else [f"R{i}" for i in range(lp.num_row)])

    lines.append(f"Model status: {model_status_to_string(status)}")
    lines.append("")
    lines.append("# Primal solution values")
    if not sol.value_valid:
        lines.append("None")
    else:
        lines.append("Feasible" if info.num_primal_infeasibilities == 0
                     else "Infeasible")
        lines.append(f"Objective {info.objective_function_value:.15g}")
        lines.append(f"# Columns {lp.num_col}")
        for j in range(lp.num_col):
            lines.append(f"{col_names[j]} {sol.col_value[j]:.15g}")
        lines.append(f"# Rows {lp.num_row}")
        for i in range(lp.num_row):
            lines.append(f"{row_names[i]} {sol.row_value[i]:.15g}")
    lines.append("")
    lines.append("# Dual solution values")
    if not sol.dual_valid:
        lines.append("None")
    else:
        lines.append("Feasible" if info.num_dual_infeasibilities == 0
                     else "Infeasible")
        lines.append(f"# Columns {lp.num_col}")
        for j in range(lp.num_col):
            lines.append(f"{col_names[j]} {sol.col_dual[j]:.15g}")
        lines.append(f"# Rows {lp.num_row}")
        for i in range(lp.num_row):
            lines.append(f"{row_names[i]} {sol.row_dual[i]:.15g}")

    text = "\n".join(lines) + "\n"
    if filename in ("", "-"):
        sys.stdout.write(text)
    else:
        with open(filename, "w") as f:
            f.write(text)
    return HighsStatus.kOk
