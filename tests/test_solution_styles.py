"""Solution writer style tests (reference styles HConst.h:157-165 and
HighsModelUtils.cpp writeSolutionFile / writeGlpsolSolution)."""
import numpy as np
import pytest

from highs_tpu import Highs
from highs_tpu.constants import SolutionStyle

from conftest import instance_path


@pytest.fixture(scope="module")
def solved():
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "simplex")
    h.readModel(instance_path("afiro.mps"))
    h.run()
    return h


def _write(h, style, tmp_path, name):
    path = str(tmp_path / name)
    h.writeSolution(path, style=int(style))
    return open(path).read()


def test_raw_style(solved, tmp_path):
    text = _write(solved, SolutionStyle.kSolutionStyleRaw, tmp_path, "r")
    assert "Model status: Optimal" in text
    assert "# Primal solution values" in text
    assert "# Dual solution values" in text
    assert "# Basis" in text
    # all columns listed
    assert f"# Columns {solved.getNumCol()}" in text


def test_pretty_style(solved, tmp_path):
    text = _write(solved, SolutionStyle.kSolutionStylePretty, tmp_path,
                  "p")
    assert "Columns" in text and "Rows" in text
    assert "Objective value: -464.75" in text
    assert "Status" in text  # table header


def test_sparse_style(solved, tmp_path):
    text = _write(solved, SolutionStyle.kSolutionStyleSparse, tmp_path,
                  "s")
    # sparse lists only nonzero primal values, no dual section
    assert "# Dual solution values" not in text
    ncols_line = [ln for ln in text.splitlines()
                  if ln.startswith("# Columns")][0]
    n_sparse = int(ncols_line.split()[2])
    assert 0 < n_sparse <= solved.getNumCol()


def test_glpsol_pretty_style(solved, tmp_path):
    text = _write(solved, SolutionStyle.kSolutionStyleGlpsolPretty,
                  tmp_path, "gp")
    assert "Status:     OPTIMAL" in text
    assert "Row name" in text and "Column name" in text
    assert "End of output" in text
    assert "MINimum" in text


def test_glpsol_raw_style(solved, tmp_path):
    text = _write(solved, SolutionStyle.kSolutionStyleGlpsolRaw,
                  tmp_path, "gr")
    lines = text.splitlines()
    s_line = [ln for ln in lines if ln.startswith("s ")][0]
    parts = s_line.split()
    assert parts[1] == "bas"
    assert int(parts[2]) == solved.getNumRow()
    assert int(parts[3]) == solved.getNumCol()
    n_i = sum(1 for ln in lines if ln.startswith("i "))
    n_j = sum(1 for ln in lines if ln.startswith("j "))
    assert n_i == solved.getNumRow() and n_j == solved.getNumCol()


def test_glpsol_mip_status(tmp_path):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("flugpl.mps"))
    h.setOptionValue("time_limit", 60.0)
    h.run()
    path = str(tmp_path / "m")
    h.writeSolution(path,
                    style=int(SolutionStyle.kSolutionStyleGlpsolPretty))
    text = open(path).read()
    assert "INTEGER OPTIMAL" in text
