"""Model build/modify API tests (reference: TestLpModification.cpp
behavior subset)."""
import numpy as np

from highs_tpu import (Highs, HighsModelStatus, HighsStatus, HighsVarType,
                       ObjSense, kHighsInf)


def build_small():
    # min -x - 2y s.t. x + y <= 4, x + 3y <= 6; x,y in [0, inf)
    h = Highs()
    h.setOptionValue("output_flag", False)
    assert h.addCol(-1.0, 0.0, kHighsInf) == HighsStatus.kOk
    assert h.addCol(-2.0, 0.0, kHighsInf) == HighsStatus.kOk
    assert h.addRow(-kHighsInf, 4.0, 2, [0, 1], [1.0, 1.0]) == \
        HighsStatus.kOk
    assert h.addRow(-kHighsInf, 6.0, 2, [0, 1], [1.0, 3.0]) == \
        HighsStatus.kOk
    return h


def test_incremental_build_and_solve():
    h = build_small()
    assert h.getNumCol() == 2
    assert h.getNumRow() == 2
    assert h.getNumNz() == 4
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-5.0)) < 1e-6


def test_change_cost_and_bounds():
    h = build_small()
    h.run()
    assert h.changeColCost(0, -10.0) == HighsStatus.kOk
    h.run()
    # now optimum pushes x: x=4, y=0 -> -40
    assert abs(h.getObjectiveValue() - (-40.0)) < 1e-5
    assert h.changeColBounds(0, 0.0, 1.0) == HighsStatus.kOk
    h.run()
    # x=1, y: x+3y<=6 -> y = min(3, 5/3...) rows: x+y<=4 -> y<=3;
    # x+3y<=6 -> y<=5/3; obj=-10*1 - 2*5/3
    assert abs(h.getObjectiveValue() - (-10.0 - 10.0 / 3.0)) < 1e-5


def test_change_coeff():
    h = build_small()
    assert h.changeCoeff(1, 1, 1.0) == HighsStatus.kOk
    st, val = h.getCoeff(1, 1)
    assert val == 1.0
    h.run()
    # rows now x+y<=4 twice-ish: x+y<=4, x+y<=6 -> binding x+y<=4
    # obj: maximize 2y+x... min -x-2y with x+y<=4 -> x=0,y=4: -8
    assert abs(h.getObjectiveValue() - (-8.0)) < 1e-5


def test_delete_col():
    h = build_small()
    assert h.deleteCols(0, 0) == HighsStatus.kOk  # delete first col
    assert h.getNumCol() == 1
    h.run()
    # only y: min -2y, y <= 4, 3y <= 6 -> y=2 -> -4
    assert abs(h.getObjectiveValue() - (-4.0)) < 1e-6


def test_delete_row():
    h = build_small()
    assert h.deleteRows(1, 1) == HighsStatus.kOk
    assert h.getNumRow() == 1
    h.run()
    # only x+y<=4: min -x-2y -> y=4 -> -8
    assert abs(h.getObjectiveValue() - (-8.0)) < 1e-5


def test_integrality_change():
    h = build_small()
    assert h.changeColsIntegrality(
        2, [0, 1], [HighsVarType.kInteger, HighsVarType.kInteger]) == \
        HighsStatus.kOk
    h.changeColBounds(1, 0.0, 1.5)
    h.run()
    sol = h.getSolution()
    assert abs(sol.col_value[1] - round(sol.col_value[1])) < 1e-6


def test_names():
    h = build_small()
    assert h.passColName(0, "xvar") == HighsStatus.kOk
    st, name = h.getColName(0)
    assert name == "xvar"
    st, idx = h.getColByName("xvar")
    assert idx == 0


def test_sense_and_offset():
    h = build_small()
    h.changeObjectiveSense(ObjSense.kMaximize)
    h.changeObjectiveOffset(5.0)
    lp = h.getLp()
    lp.col_cost = -lp.col_cost
    h.run()
    assert abs(h.getObjectiveValue() - 10.0) < 1e-5
