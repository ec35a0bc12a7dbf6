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


def test_qp_sparse_large_separable():
    """A 1200-variable separable QP stays sparse end to end (the dense
    r02 path materialized Q and [A -I]): min 1/2||x - a||^2 subject to
    sum x = 1 has the closed form x = a + (1 - sum a)/n."""
    import numpy as np
    import scipy.sparse as sp

    from highs_tpu.constants import HighsModelStatus
    from highs_tpu.models.lp import (HighsHessian, HighsLp,
                                     HighsModel, HighsSparseMatrix)
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.qp.active_set import solve_qp_active_set

    n = 1200
    rng = np.random.default_rng(9)
    a = rng.standard_normal(n) * 0.01  # small: no bound activates
    lp = HighsLp(
        num_col=n, num_row=1, col_cost=-a,
        col_lower=np.full(n, -10.0), col_upper=np.full(n, 10.0),
        row_lower=np.ones(1), row_upper=np.ones(1),
        a_matrix=HighsSparseMatrix.from_scipy(
            sp.csc_matrix(np.ones((1, n)))), sense=1)
    import numpy as _np
    hess = HighsHessian(
        dim=n, start=_np.arange(n + 1, dtype=_np.int64),
        index=_np.arange(n, dtype=_np.int64),
        value=_np.ones(n))
    model = HighsModel(lp=lp, hessian=hess)
    st, sol, info = solve_qp_active_set(model, HighsOptions())
    assert st == HighsModelStatus.kOptimal
    x_exp = a + (1.0 - a.sum()) / n
    assert np.allclose(sol.col_value, x_exp, atol=1e-6)


def test_qp_nullspace_limit():
    import numpy as np
    import scipy.sparse as sp

    from highs_tpu.constants import HighsModelStatus
    from highs_tpu.models.lp import (HighsHessian, HighsLp,
                                     HighsModel, HighsSparseMatrix)
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.qp.active_set import solve_qp_active_set

    n = 60
    rng = np.random.default_rng(4)
    a = rng.standard_normal(n)
    lp = HighsLp(
        num_col=n, num_row=1, col_cost=-a,
        col_lower=np.full(n, -10.0), col_upper=np.full(n, 10.0),
        row_lower=np.ones(1), row_upper=np.ones(1),
        a_matrix=HighsSparseMatrix.from_scipy(
            sp.csc_matrix(np.ones((1, n)))), sense=1)
    import numpy as _np
    model = HighsModel(lp=lp, hessian=HighsHessian(
        dim=n, start=_np.arange(n + 1, dtype=_np.int64),
        index=_np.arange(n, dtype=_np.int64), value=_np.ones(n)))
    opts = HighsOptions()
    opts.qp_nullspace_limit = 5
    st, sol, info = solve_qp_active_set(model, opts)
    # reference behavior: QpModelStatus::kLargeNullspace (quass.cpp:364)
    assert st == HighsModelStatus.kUnknown
