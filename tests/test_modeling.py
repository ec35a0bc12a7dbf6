"""Modeling-layer tests (reference: highspy/tests behavior subset)."""
import numpy as np
import pytest

from highs_tpu.constants import HighsModelStatus, HighsVarType, ObjSense
from highs_tpu.modeling import Highs, highs_linear_expression, qsum


def test_basic_lp():
    h = Highs()
    h.silent()
    x = h.addVariable()
    y = h.addVariable()
    h.addConstr(x + 2 * y <= 14)
    h.addConstr(3 * x - y >= 0)
    h.addConstr(x - y <= 2)
    h.maximize(3 * x + 4 * y)
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.val(x) - 6.0) < 1e-5
    assert abs(h.val(y) - 4.0) < 1e-5
    assert abs(h.getObjectiveValue() - 34.0) < 1e-5


def test_expression_algebra():
    h = Highs()
    h.silent()
    x = h.addVariable()
    y = h.addVariable()
    e = 2 * x + 3 * y - x + 1.0
    assert e.vals[x.index] == 1.0
    assert e.vals[y.index] == 3.0
    assert e.constant == 1.0
    bounded = 2 <= (x + y) <= 4
    # python chains comparisons: (2 <= x+y) and ... - use explicit form
    b2 = (x + y >= 2) <= 4
    assert b2.bounds == (2.0, 4.0)


def test_qsum_and_addConstrs():
    h = Highs()
    h.silent()
    xs = h.addVariables(5, ub=10.0)
    h.addConstrs(x <= 3 + i for i, x in enumerate(xs))
    h.minimize(-qsum(xs))
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    total = sum(h.val(x) for x in xs)
    assert abs(total - (3 + 4 + 5 + 6 + 7)) < 1e-5


def test_binaries_knapsack():
    h = Highs()
    h.silent()
    xs = h.addBinaries(4)
    w = [5.0, 7.0, 4.0, 3.0]
    v = [8.0, 11.0, 6.0, 4.0]
    h.addConstr(qsum(wi * xi for wi, xi in zip(w, np.ravel(xs))) <= 14)
    h.maximize(qsum(vi * xi for vi, xi in zip(v, np.ravel(xs))))
    assert abs(h.getObjectiveValue() - 21.0) < 1e-6


def test_variables_dict_and_vals():
    h = Highs()
    h.silent()
    xs = h.addVariables(2, 3, ub=1.0)
    assert len(xs) == 6
    h.addConstrs(qsum(xs[i, j] for j in range(3)) <= 2
                 for i in range(2))
    h.maximize(qsum(xs.values()))
    vals = h.val(xs)
    assert isinstance(vals, dict)
    assert abs(sum(vals.values()) - 4.0) < 1e-5


def test_duals_via_modeling():
    h = Highs()
    h.silent()
    x = h.addVariable()
    y = h.addVariable()
    c1 = h.addConstr(x + y <= 4)
    c2 = h.addConstr(x + 3 * y <= 6)
    h.minimize(-x - 2 * y)
    assert abs(h.constrDual(c1) - (-0.5)) < 1e-6
    assert abs(h.constrDual(c2) - (-0.5)) < 1e-6
    assert abs(h.constrValue(c1) - 4.0) < 1e-6


def test_integrality_switch():
    h = Highs()
    h.silent()
    x = h.addVariable(ub=2.5)
    h.setInteger(x)
    h.maximize(x + 0.0)
    assert abs(h.val(x) - 2.0) < 1e-6
    h.setContinuous(x)
    h.maximize(x + 0.0)
    assert abs(h.val(x) - 2.5) < 1e-6


def test_async_solve():
    h = Highs()
    h.silent()
    x = h.addVariable(ub=1.0)
    h.setObjective(-x)
    h.startSolve()
    status = h.joinSolve()
    assert h.getModelStatus() == HighsModelStatus.kOptimal


def test_context_manager():
    with Highs() as h:
        h.silent()
        x = h.addVariable()
        h.addConstr(x <= 5)
        h.maximize(x + 0.0)
        assert abs(h.val(x) - 5.0) < 1e-6
