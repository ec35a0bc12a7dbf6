"""QP solver tests vs reference expectations (check/TestQpSolver.cpp:
qptestnw obj -6.45 x=(1.4,1.7) duals (0.8,0,0); qjh obj -5.25)."""
import numpy as np
import pytest

from highs_tpu import Highs, HighsModelStatus

from conftest import instance_path


def test_qptestnw(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    assert h.readModel(instance_path("qptestnw.lp")) == 0
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-6.45)) < 1e-6
    sol = h.getSolution()
    np.testing.assert_allclose(sol.col_value, [1.4, 1.7], atol=1e-5)
    np.testing.assert_allclose(sol.row_dual, [0.8, 0.0, 0.0], atol=1e-5)


@pytest.mark.parametrize("name", ["qjh.mps", "qjh_quadobj.mps",
                                  "qjh_qmatrix.mps", "qjh.lp"])
def test_qjh_variants(instances_dir, name):
    h = Highs()
    h.setOptionValue("output_flag", False)
    assert h.readModel(instance_path(name)) == 0
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-5.25)) < 1e-5


def test_qp_unbounded(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("qpunbounded.lp"))
    h.run()
    assert h.getModelStatus() in (HighsModelStatus.kUnbounded,
                                  HighsModelStatus.kUnboundedOrInfeasible)


def test_qp_infeasible(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("qpinfeasible.lp"))
    h.run()
    assert h.getModelStatus() in (HighsModelStatus.kInfeasible,
                                  HighsModelStatus.kUnboundedOrInfeasible)


def test_qp_maximize():
    """max -x^2 + 2x  ==  min x^2 - 2x : optimum x=1, obj 1."""
    import scipy.sparse as sp
    from highs_tpu import HighsLp, HighsModel, ObjSense, kHighsInf
    from highs_tpu.models.lp import HighsHessian, HighsSparseMatrix

    lp = HighsLp(
        num_col=1, num_row=1,
        col_cost=np.array([2.0]),
        col_lower=np.array([-10.0]), col_upper=np.array([10.0]),
        row_lower=np.array([-kHighsInf]), row_upper=np.array([5.0]),
        a_matrix=HighsSparseMatrix.from_scipy(
            sp.csc_matrix(np.array([[1.0]]))),
        sense=ObjSense.kMaximize)
    hessian = HighsHessian(
        dim=1, start=np.array([0, 1]), index=np.array([0]),
        value=np.array([-2.0]))  # Q = -2 (concave for maximize)
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(HighsModel(lp=lp, hessian=hessian))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - 1.0) < 1e-6
    assert abs(h.getSolution().col_value[0] - 1.0) < 1e-5
