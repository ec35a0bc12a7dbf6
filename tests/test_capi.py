"""Flat C-style API tests (reference: check/TestCAPI.c behavior)."""
import numpy as np

from highs_tpu import capi


def test_capi_lp_roundtrip():
    h = capi.Highs_create()
    capi.Highs_setBoolOptionValue(h, "output_flag", False)
    inf = capi.kHighsInfinity
    # min -x - 2y s.t. x+y<=4, x+3y<=6 (colwise CSC)
    status = capi.Highs_passLp(
        h, 2, 2, 4, capi.kHighsMatrixFormatColwise,
        capi.kHighsObjSenseMinimize, 0.0,
        [-1.0, -2.0], [0.0, 0.0], [inf, inf],
        [-inf, -inf], [4.0, 6.0],
        [0, 2], [0, 1, 0, 1], [1.0, 1.0, 1.0, 3.0])
    assert status == capi.kHighsStatusOk
    assert capi.Highs_run(h) == capi.kHighsStatusOk
    assert capi.Highs_getModelStatus(h) == 7  # kOptimal
    assert abs(capi.Highs_getObjectiveValue(h) - (-5.0)) < 1e-6
    st, cv, cd, rv, rd = capi.Highs_getSolution(h)
    np.testing.assert_allclose(cv, [3.0, 1.0], atol=1e-5)
    st, cs, rs = capi.Highs_getBasis(h)
    assert st == capi.kHighsStatusOk
    capi.Highs_destroy(h)


def test_capi_mip():
    h = capi.Highs_create()
    capi.Highs_setBoolOptionValue(h, "output_flag", False)
    inf = capi.kHighsInfinity
    status = capi.Highs_passMip(
        h, 2, 1, 2, capi.kHighsMatrixFormatColwise,
        capi.kHighsObjSenseMaximize, 0.0,
        [1.0, 1.0], [0.0, 0.0], [10.0, 10.0],
        [-inf], [7.5],
        [0, 1], [0, 0], [1.0, 1.0],
        [capi.kHighsVarTypeInteger, capi.kHighsVarTypeInteger])
    assert status == capi.kHighsStatusOk
    capi.Highs_run(h)
    assert abs(capi.Highs_getObjectiveValue(h) - 7.0) < 1e-6
    st, nodes = capi.Highs_getInt64InfoValue(h, "mip_node_count")
    assert st == capi.kHighsStatusOk


def test_capi_options_info():
    h = capi.Highs_create()
    assert capi.Highs_setDoubleOptionValue(h, "time_limit", 10.0) == 0
    st, v = capi.Highs_getDoubleOptionValue(h, "time_limit")
    assert v == 10.0
    assert capi.Highs_setStringOptionValue(h, "solver", "ipm") == 0
    assert capi.Highs_setIntOptionValue(h, "nonexistent", 1) == -1


def test_capi_modification():
    h = capi.Highs_create()
    capi.Highs_setBoolOptionValue(h, "output_flag", False)
    inf = capi.kHighsInfinity
    capi.Highs_addCol(h, 1.0, 0.0, inf, 0, [], [])
    capi.Highs_addCol(h, -1.0, 0.0, 4.0, 0, [], [])
    capi.Highs_addRow(h, -inf, 10.0, 2, [0, 1], [1.0, 2.0])
    assert capi.Highs_getNumCol(h) == 2
    assert capi.Highs_getNumRow(h) == 1
    capi.Highs_run(h)
    assert abs(capi.Highs_getObjectiveValue(h) - (-4.0)) < 1e-6
    capi.Highs_changeColCost(h, 1, -3.0)
    capi.Highs_run(h)
    assert abs(capi.Highs_getObjectiveValue(h) - (-12.0)) < 1e-6


def test_options_file_roundtrip(tmp_path):
    """HiGHS-style options file read/write (reference io/LoadOptions)."""
    from highs_tpu import Highs
    path = str(tmp_path / "opts.set")
    h = Highs()
    h.setOptionValue("solver", "ipm")
    h.setOptionValue("time_limit", 42.5)
    h.setOptionValue("mip_rel_gap", 0.01)
    assert h.writeOptions(path) == 0
    h2 = Highs()
    assert h2.readOptions(path) == 0
    assert h2.getOptionValue("solver") == "ipm"
    assert h2.getOptionValue("time_limit") == 42.5
    assert h2.getOptionValue("mip_rel_gap") == 0.01


def test_options_file_highs_format(tmp_path):
    """Parse the reference's 'name = value' file format with comments."""
    from highs_tpu import Highs
    path = str(tmp_path / "opts2.set")
    with open(path, "w") as f:
        f.write("# comment line\n")
        f.write("presolve = off\n")
        f.write("random_seed = 7\n")
        f.write("output_flag = false\n")
    h = Highs()
    assert h.readOptions(path) == 0
    assert h.getOptionValue("presolve") == "off"
    assert h.getOptionValue("random_seed") == 7
    assert h.getOptionValue("output_flag") is False
