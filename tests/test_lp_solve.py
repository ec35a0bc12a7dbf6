"""End-to-end LP solves against reference objective anchors
(check/CMakeLists.txt:207-218 objectives; BASELINE.md)."""
import numpy as np
import pytest
import scipy.sparse as sp

from highs_tpu import Highs, HighsModelStatus, HighsLp, ObjSense, kHighsInf
from highs_tpu.models.lp import HighsSparseMatrix

from conftest import instance_path

# instance -> reference objective (check/CMakeLists.txt:208-218)
LP_OBJECTIVES = {
    "afiro": -4.6475314286e2,
    "adlittle": 2.2549496316e5,
}


@pytest.mark.parametrize("name,ref_obj", sorted(LP_OBJECTIVES.items()))
def test_netlib_objective(instances_dir, name, ref_obj):
    h = Highs()
    assert h.readModel(instance_path(f"{name}.mps")) == 0
    h.setOptionValue("output_flag", False)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    obj = h.getObjectiveValue()
    assert abs(obj - ref_obj) / max(1.0, abs(ref_obj)) < 1e-5


def _small_lp():
    # min -x - 2y  s.t. x + y <= 4, x + 3y <= 6, x,y >= 0
    a = sp.csc_matrix(np.array([[1.0, 1.0], [1.0, 3.0]]))
    return HighsLp(
        num_col=2, num_row=2,
        col_cost=np.array([-1.0, -2.0]),
        col_lower=np.zeros(2), col_upper=np.array([kHighsInf, kHighsInf]),
        row_lower=np.array([-kHighsInf, -kHighsInf]),
        row_upper=np.array([4.0, 6.0]),
        a_matrix=HighsSparseMatrix.from_scipy(a))


def test_small_lp():
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(_small_lp())
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    # optimum at x=3, y=1, obj=-5
    assert abs(h.getObjectiveValue() - (-5.0)) < 1e-5
    sol = h.getSolution()
    np.testing.assert_allclose(sol.col_value, [3.0, 1.0], atol=1e-4)
    # duals: y1 = -(1/2), y2 = -(1/2) for <= rows in minimize
    assert sol.dual_valid


def test_maximize_sense():
    lp = _small_lp()
    lp.col_cost = -lp.col_cost
    lp.sense = ObjSense.kMaximize
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - 5.0) < 1e-5


def test_bound_lp_no_rows():
    lp = HighsLp(
        num_col=2, num_row=0,
        col_cost=np.array([1.0, -1.0]),
        col_lower=np.array([-1.0, -2.0]),
        col_upper=np.array([5.0, 3.0]),
        row_lower=np.zeros(0), row_upper=np.zeros(0),
        a_matrix=HighsSparseMatrix(num_col=2, num_row=0,
                                   start=np.zeros(3, dtype=np.int64)))
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-1.0 - 3.0)) < 1e-9


def test_unbounded_lp():
    lp = HighsLp(
        num_col=1, num_row=0,
        col_cost=np.array([-1.0]),
        col_lower=np.array([0.0]), col_upper=np.array([kHighsInf]),
        row_lower=np.zeros(0), row_upper=np.zeros(0),
        a_matrix=HighsSparseMatrix(num_col=1, num_row=0,
                                   start=np.zeros(2, dtype=np.int64)))
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kUnbounded


def test_infeasible_bounds():
    lp = _small_lp()
    lp.col_lower = np.array([5.0, 0.0])
    lp.col_upper = np.array([4.0, 1.0])
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kInfeasible


def test_kkt_info_filled(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("afiro.mps"))
    h.run()
    info = h.getInfo()
    assert info.valid
    assert (info.pdlp_iteration_count > 0 or
            info.ipm_iteration_count > 0 or
            info.simplex_iteration_count > 0)
    assert info.max_primal_infeasibility < 1e-7
    assert info.max_dual_infeasibility < 1e-6
    assert info.num_primal_infeasibilities == 0
    assert info.num_dual_infeasibilities == 0


def test_empty_model():
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kModelEmpty


def test_pdlp_mixed_precision_stepping(instances_dir):
    """tpu_step_dtype=bfloat16: bf16 step matvecs with full-precision
    metrics must still reach the exact optimum (switches to full
    precision when the bf16 phase floors)."""
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "pdlp")
    h.setOptionValue("presolve", "off")
    h.setOptionValue("tpu_step_dtype", "bfloat16")
    h.readModel(instance_path("afiro.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-464.7531429)) < 1e-3


@pytest.mark.parametrize("strategy,restart", [(0, 2), (1, 1), (2, 1)])
def test_pdlp_step_size_strategies(instances_dir, strategy, restart):
    """pdlp_step_size_strategy codes (reference cupdlp_step.c: 0 fixed,
    1 adaptive, 2 Malitsky-Pock) must all reach the optimum."""
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "pdlp")
    h.setOptionValue("presolve", "off")
    h.setOptionValue("pdlp_step_size_strategy", strategy)
    h.setOptionValue("pdlp_restart_strategy", restart)
    h.readModel(instance_path("afiro.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-464.7531429)) < 1e-3


def test_pdlp_average_iterate_engine(instances_dir):
    """'pdlp' routes to the cuPDLP-C-style average-iterate restarted
    PDHG, 'hipdlp' to the reflected-Halpern engine (reference
    HighsSolve.cpp:686-688 two-solver semantics); both reach the
    ctest objectives."""
    for solver, inst, ref in [("pdlp", "afiro", -464.7531429),
                              ("pdlp", "adlittle", 225494.9632),
                              ("hipdlp", "afiro", -464.7531429)]:
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("solver", solver)
        h.readModel(instance_path(f"{inst}.mps"))
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        obj = h.getInfo().objective_function_value
        assert abs(obj - ref) / max(1.0, abs(ref)) < 1e-4, (solver,
                                                           inst, obj)


def test_dispatch_boundaries_solve_correctly():
    """The 'choose' routing thresholds (dispatch.py capacity model)
    must hand off cleanly at their boundaries: instances just below and
    above the simplex/IPM gates all reach the same optimum."""
    import numpy as np
    import scipy.sparse as sp

    from highs_tpu.constants import HighsModelStatus
    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.dispatch import solve_lp

    rng = np.random.default_rng(8)

    def make(m):
        n = m
        a = (sp.random(m, n, density=min(0.05, 20 / m),
                       random_state=rng, format="csc") +
             sp.identity(m) * 3.0).tocsc()
        xstar = rng.uniform(0, 1, n)
        b = a @ xstar
        return HighsLp(
            num_col=n, num_row=m, col_cost=rng.uniform(0.5, 1.5, n),
            col_lower=np.zeros(n), col_upper=np.full(n, 2.0),
            row_lower=np.asarray(b).ravel(),
            row_upper=np.asarray(b).ravel(),
            a_matrix=HighsSparseMatrix.from_scipy(a), sense=1)

    # boundary sizes around the simplex gate (1500 rows) — both sides
    # must solve; the exact engine choice is the capacity model's call
    objs = {}
    for m in (1499, 1501):
        lp = make(m)
        st, sol, info = solve_lp(lp, HighsOptions(), presolve=False)
        assert st == HighsModelStatus.kOptimal, m
        objs[m] = float(lp.col_cost @ sol.col_value)
        # sanity vs a forced-simplex solve
        o = HighsOptions()
        o.solver = "simplex"
        st2, sol2, _ = solve_lp(lp, o, presolve=False)
        assert st2 == HighsModelStatus.kOptimal
        ref = float(lp.col_cost @ sol2.col_value)
        assert abs(objs[m] - ref) <= 1e-5 * (1 + abs(ref)), m
