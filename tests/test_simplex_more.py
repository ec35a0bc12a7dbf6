"""Simplex entry-strategy tests (reference highs/simplex/HApp.h)."""
import numpy as np

from highs_tpu import Highs, HighsModelStatus
from highs_tpu.models.lp import HighsLp, HighsSparseMatrix


def test_simplex_dualize_strategy_matches_primal():
    # reference HApp.h:206-214: cold tall LPs dualize under
    # choose/on; objective must match the primal-side solve
    import scipy.sparse as sp
    rng = np.random.default_rng(7)
    n, m = 8, 120
    A = sp.random(m, n, density=0.3, random_state=7, format="csc")
    A.data = np.round(A.data * 4 - 2, 3)
    b = A @ rng.uniform(0, 1, n) + rng.uniform(0.1, 1.0, m)
    lp = HighsLp(num_col=n, num_row=m,
                 col_cost=np.round(rng.uniform(-1, 1, n), 3),
                 col_lower=np.zeros(n), col_upper=np.full(n, 5.0),
                 row_lower=np.full(m, -np.inf), row_upper=b,
                 a_matrix=HighsSparseMatrix.from_scipy(A))
    objs = {}
    for strat in (-1, 0, 1):
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("solver", "simplex")
        h.setOptionValue("presolve", "off")
        h.setOptionValue("simplex_dualize_strategy", strat)
        h.passModel(lp)
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        objs[strat] = h.getInfo().objective_function_value
    assert abs(objs[-1] - objs[1]) < 1e-6 * (1 + abs(objs[-1]))
    assert abs(objs[-1] - objs[0]) < 1e-6 * (1 + abs(objs[-1]))


def test_freeze_unfreeze_basis():
    # reference Highs::freezeBasis/unfreezeBasis (Highs.h:1574-1596);
    # here the methods WORK (the reference deprecated them)
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel("/root/reference/check/instances/afiro.mps")
    h.run()
    st, fid = h.freezeBasis()
    assert st.name == "kOk" and fid >= 0
    basis0 = [int(s) for s in h.getBasis().col_status]
    # perturb the stored basis by re-solving a modified problem
    h.changeColCost(0, 123.0)
    h.run()
    assert h.unfreezeBasis(fid).name == "kOk"
    assert [int(s) for s in h.getBasis().col_status] == basis0
    # id is consumed
    assert h.unfreezeBasis(fid).name == "kError"
    assert h.frozenBasisAllDataClear().name == "kOk"


def test_ipm_dualize_strategy_matches():
    # reference IpxWrapper.cpp ipx_dualize_strategy (HConst.h:122-128)
    import scipy.sparse as sp
    rng = np.random.default_rng(11)
    n, m = 6, 90
    A = sp.random(m, n, density=0.4, random_state=11, format="csc")
    A.data = np.round(A.data * 2 - 1, 3)
    b = A @ rng.uniform(0, 1, n) + rng.uniform(0.1, 1.0, m)
    lp = HighsLp(num_col=n, num_row=m,
                 col_cost=np.round(rng.uniform(-1, 1, n), 3),
                 col_lower=np.zeros(n), col_upper=np.full(n, 5.0),
                 row_lower=np.full(m, -np.inf), row_upper=b,
                 a_matrix=HighsSparseMatrix.from_scipy(A))
    objs = {}
    for strat in (-1, 1):
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("solver", "ipm")
        h.setOptionValue("presolve", "off")
        h.setOptionValue("run_crossover", "off")
        h.setOptionValue("ipx_dualize_strategy", strat)
        h.passModel(lp)
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        objs[strat] = h.getInfo().objective_function_value
    assert abs(objs[-1] - objs[1]) < 1e-6 * (1 + abs(objs[-1]))
