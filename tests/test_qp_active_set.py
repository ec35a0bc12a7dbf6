"""Active-set QP solver tests (reference: QUASS, check/TestQpSolver.cpp
expectations) via solver option "qpasm"."""
import numpy as np
import pytest

from highs_tpu import Highs, HighsModelStatus

from conftest import instance_path


def _solve(name, **opts):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "qpasm")
    for k, v in opts.items():
        h.setOptionValue(k, v)
    assert h.readModel(instance_path(name)) == 0
    h.run()
    return h


def test_qptestnw_asm(instances_dir):
    h = _solve("qptestnw.lp")
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-6.45)) < 1e-6
    sol = h.getSolution()
    np.testing.assert_allclose(sol.col_value, [1.4, 1.7], atol=1e-5)
    np.testing.assert_allclose(sol.row_dual, [0.8, 0.0, 0.0], atol=1e-5)


@pytest.mark.parametrize("name", ["qjh.mps", "qjh_quadobj.mps", "qjh.lp"])
def test_qjh_asm(instances_dir, name):
    h = _solve(name)
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-5.25)) < 1e-5


def test_qp_unbounded_asm(instances_dir):
    h = _solve("qpunbounded.lp")
    assert h.getModelStatus() in (HighsModelStatus.kUnbounded,
                                  HighsModelStatus.kUnboundedOrInfeasible)


def test_qp_infeasible_asm(instances_dir):
    h = _solve("qpinfeasible.lp")
    assert h.getModelStatus() in (HighsModelStatus.kInfeasible,
                                  HighsModelStatus.kUnboundedOrInfeasible)


def test_asm_pure_box_qp():
    """min (x-2)^2 + (y+1)^2 over [0,1]^2 -> x=1, y=0, obj 2... direct
    active-set on a box-only QP (no rows)."""
    import scipy.sparse as sp
    from highs_tpu import HighsLp, HighsModel
    from highs_tpu.models.lp import HighsHessian, HighsSparseMatrix
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.qp.active_set import solve_qp_active_set

    # 1/2 x'Qx + c'x with Q = 2I, c = (-4, 2): == (x-2)^2 + (y+1)^2 - 5
    lp = HighsLp(
        num_col=2, num_row=0,
        col_cost=np.array([-4.0, 2.0]),
        col_lower=np.zeros(2), col_upper=np.ones(2),
        row_lower=np.zeros(0), row_upper=np.zeros(0),
        a_matrix=HighsSparseMatrix.from_scipy(sp.csc_matrix((0, 2))))
    hess = HighsHessian(
        dim=2, start=np.array([0, 1, 2]), index=np.array([0, 1]),
        value=np.array([2.0, 2.0]))
    model = HighsModel(lp=lp, hessian=hess)
    opts = HighsOptions()
    st, sol, info = solve_qp_active_set(model, opts)
    assert st == HighsModelStatus.kOptimal
    np.testing.assert_allclose(sol.col_value, [1.0, 0.0], atol=1e-8)
    # reduced costs: g = Qx + c = (-2, 2); at upper needs mu<=0, lower >=0
    np.testing.assert_allclose(sol.col_dual, [-2.0, 2.0], atol=1e-8)


def test_asm_equality_qp():
    """min 1/2(x^2+y^2) s.t. x + y = 2 -> x=y=1."""
    import scipy.sparse as sp
    from highs_tpu import HighsLp, HighsModel, kHighsInf
    from highs_tpu.models.lp import HighsHessian, HighsSparseMatrix
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.qp.active_set import solve_qp_active_set

    lp = HighsLp(
        num_col=2, num_row=1,
        col_cost=np.zeros(2),
        col_lower=np.full(2, -kHighsInf), col_upper=np.full(2, kHighsInf),
        row_lower=np.array([2.0]), row_upper=np.array([2.0]),
        a_matrix=HighsSparseMatrix.from_scipy(
            sp.csc_matrix(np.array([[1.0, 1.0]]))))
    hess = HighsHessian(
        dim=2, start=np.array([0, 1, 2]), index=np.array([0, 1]),
        value=np.array([1.0, 1.0]))
    model = HighsModel(lp=lp, hessian=hess)
    st, sol, info = solve_qp_active_set(model, HighsOptions())
    assert st == HighsModelStatus.kOptimal
    np.testing.assert_allclose(sol.col_value, [1.0, 1.0], atol=1e-8)
    # y from Qx = A'y -> y = 1
    np.testing.assert_allclose(sol.row_dual, [1.0], atol=1e-8)


def test_asm_hot_start_reuses_active_set(instances_dir):
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.qp.active_set import solve_qp_active_set

    h = _solve("qptestnw.lp")
    sol = h.getSolution()
    active = getattr(sol, "qp_active_set", None)
    assert active is not None
    opts = HighsOptions()
    opts.qp_allow_hot_start = True
    st, sol2, info2 = solve_qp_active_set(
        h.getModel(), opts, active_in=active)
    assert st == HighsModelStatus.kOptimal
    assert abs(info2.primal_obj - (-6.45)) < 1e-6
