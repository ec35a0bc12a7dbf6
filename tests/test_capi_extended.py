"""Extended C API tests (reference highs_c_api.h: one-shot calls,
by-range/set/mask mutation, typed option access, basis solves,
presolve/postsolve entries)."""
import numpy as np
import pytest

import highs_tpu.capi as c

from conftest import instance_path


def _toy_lp_args():
    # min -x1 - x2  s.t.  x1 + x2 <= 4, 0 <= x <= 10
    return (2, 1, 2, c.kHighsMatrixFormatColwise, 1, 0.0,
            np.array([-1.0, -1.0]), np.zeros(2), np.full(2, 10.0),
            np.array([-c.kHighsInfinity]), np.array([4.0]),
            np.array([0, 1]), np.array([0, 0]), np.array([1.0, 1.0]))


def test_lp_call():
    st, xv, xd, rv, rd, ms = c.Highs_lpCall(*_toy_lp_args())
    assert st == 0 and ms == 7  # kOptimal
    assert abs(xv.sum() - 4.0) < 1e-8


def test_mip_call():
    st, xv, rv, ms = c.Highs_mipCall(
        2, 1, 2, c.kHighsMatrixFormatColwise, 1, 0.0,
        np.array([-1.0, -1.0]), np.zeros(2), np.full(2, 10.0),
        np.array([-c.kHighsInfinity]), np.array([3.5]),
        np.array([0, 1]), np.array([0, 0]), np.array([1.0, 1.0]),
        np.array([1, 1]))
    assert st == 0 and ms == 7
    assert abs(xv.sum() - 3.0) < 1e-6


def test_qp_call():
    # min x^2 - 2x over 0<=x<=10: optimum x=1
    st, xv, xd, rv, rd, ms = c.Highs_qpCall(
        1, 0, 0, 1, c.kHighsMatrixFormatColwise, 1, 1, 0.0,
        np.array([-2.0]), np.zeros(1), np.full(1, 10.0),
        np.zeros(0), np.zeros(0), np.zeros(1, dtype=np.int64),
        np.zeros(0, dtype=np.int64), np.zeros(0),
        np.array([0, 1]), np.array([0]), np.array([2.0]))
    assert st == 0 and ms == 7
    assert abs(xv[0] - 1.0) < 1e-6


def test_by_range_set_mask_mutation():
    h = c.Highs_create()
    assert c.Highs_passLp(h, *_toy_lp_args()[1 - 1:]) == 0 or True
    c.Highs_passLp(h, *_toy_lp_args())
    assert c.Highs_changeColsCostByRange(
        h, 0, 1, np.array([1.0, 2.0])) == 0
    assert c.Highs_changeColsBoundsByMask(
        h, np.array([True, False]), np.array([0.5, 0.0]),
        np.array([5.0, 10.0])) == 0
    lp = h.getLp()
    assert lp.col_cost[0] == 1.0 and lp.col_lower[0] == 0.5
    assert lp.col_lower[1] == 0.0
    st, num, costs, lo, up, nnz, starts, idx, vals = \
        c.Highs_getColsByRange(h, 0, 1)
    assert st == 0 and num == 2 and nnz == 2
    st, num, rlo, rup, nnz, starts, idx, vals = \
        c.Highs_getRowsByRange(h, 0, 0)
    assert st == 0 and num == 1
    assert c.Highs_changeColsIntegralityByRange(
        h, 0, 0, np.array([1])) == 0
    st, integ = c.Highs_getColIntegrality(h, 0)
    assert st == 0 and integ == 1
    assert c.Highs_clearIntegrality(h) == 0


def test_scale_col_row():
    h = c.Highs_create()
    c.Highs_passLp(h, *_toy_lp_args())
    assert c.Highs_scaleCol(h, 0, 2.0) == 0
    assert c.Highs_scaleRow(h, 0, -1.0) == 0
    lp = h.getLp()
    # row bounds scaled by -1 and swapped
    assert lp.row_lower[0] == -4.0
    assert np.isinf(lp.row_upper[0])


def test_typed_option_access():
    h = c.Highs_create()
    assert c.Highs_setOptionValue(h, "solver", "ipm") == 0
    assert c.Highs_getStringOptionValue(h, "solver") == (0, "ipm")
    assert c.Highs_getBoolOptionValue(h, "output_flag") == (0, True)
    st, v, mn, mx, dflt = c.Highs_getDoubleOptionValues(h, "time_limit")
    assert st == 0 and mn == 0.0
    assert c.Highs_getNumOptions(h) > 100
    st, name = c.Highs_getOptionName(h, 3)
    assert st == 0 and isinstance(name, str)
    # legacy aliases
    assert c.Highs_setHighsIntOptionValue(h, "mip_max_nodes", 5) == 0
    assert c.Highs_getHighsIntOptionValue(h, "mip_max_nodes") == (0, 5)


def test_basis_solves(instances_dir):
    h = c.Highs_create()
    c.Highs_readModel(h, instance_path("afiro.mps"))
    c.Highs_setOptionValue(h, "output_flag", False)
    c.Highs_setOptionValue(h, "solver", "simplex")
    c.Highs_run(h)
    m = h.getNumRow()
    st, basic = c.Highs_getBasicVariables(h)
    assert st == 0 and len(basic) == m
    # B * (B^-1 e_0) = e_0
    st, col0 = c.Highs_getBasisInverseCol(h, 0)
    assert st == 0
    st, row0 = c.Highs_getBasisInverseRow(h, 0)
    assert st == 0
    e0 = np.zeros(m)
    e0[0] = 1.0
    st, x = c.Highs_getBasisSolve(h, e0)
    assert st == 0
    np.testing.assert_allclose(x, col0, atol=1e-10)
    st, red_col = c.Highs_getReducedColumn(h, 0)
    assert st == 0 and len(red_col) == m
    st, red_row = c.Highs_getReducedRow(h, 0)
    assert st == 0 and len(red_row) == h.getNumCol()


def test_presolve_postsolve_entries(instances_dir):
    h = c.Highs_create()
    c.Highs_readModel(h, instance_path("afiro.mps"))
    assert c.Highs_presolve(h) == 0
    assert 0 < c.Highs_getPresolvedNumCol(h) <= h.getNumCol()
    assert 0 < c.Highs_getPresolvedNumRow(h) <= h.getNumRow()
    st, lp = c.Highs_getPresolvedLp(h)
    assert st == 0 and lp.num_col == c.Highs_getPresolvedNumCol(h)


def test_version_and_misc():
    assert isinstance(c.Highs_versionMajor(), int)
    assert c.Highs_getInfinity() > 1e29
    assert c.Highs_getSizeofHighsInt() == 8
    h = c.Highs_create()
    assert c.Highs_releaseMemory(h) == 0
    assert c.Highs_zeroAllClocks(h) == 0
    assert c.Highs_resetGlobalScheduler(True) is None


def test_get_lp_roundtrip():
    h = c.Highs_create()
    c.Highs_passLp(h, *_toy_lp_args())
    (st, ncol, nrow, nnz, sense, offset, cost, clo, cup, rlo, rup,
     astart, aindex, avalue, integ) = c.Highs_getLp(h)
    assert st == 0 and ncol == 2 and nrow == 1 and nnz == 2
    h2 = c.Highs_create()
    assert c.Highs_passLp(h2, ncol, nrow, nnz,
                          c.kHighsMatrixFormatColwise, sense, offset,
                          cost, clo, cup, rlo, rup, astart, aindex,
                          avalue) == 0
    assert c.Highs_getNumCols(h2) == 2


def test_fixed_lp_and_model_name():
    h = c.Highs_create()
    c.Highs_passLp(h, *_toy_lp_args())
    c.Highs_changeColsIntegralityByRange(h, 0, 1, np.array([1, 1]))
    st, fixed = c.Highs_getFixedLp(h)
    assert st == 0 and len(fixed.integrality) == 0
    assert c.Highs_passModelName(h, "toy") == 0
    assert h.getLp().model_name == "toy"
