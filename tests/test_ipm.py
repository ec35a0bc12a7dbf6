"""IPM solver tests: high-accuracy objectives on Netlib anchors
(check/CMakeLists.txt:207-218) and infeasible/unbounded classification
(check/CMakeLists.txt:249-264)."""
import numpy as np
import pytest

from highs_tpu import Highs, HighsModelStatus
from highs_tpu.io.mps import read_mps
from highs_tpu.options import HighsOptions
from highs_tpu.solvers.ipm.solver import solve_lp_ipm_native

from conftest import instance_path

IPM_OBJECTIVES = {
    "afiro": -4.6475314286e2,
    "adlittle": 2.2549496316e5,
    "stair": -2.5126695119e2,
    "standata": 1.2576995000e3,
    "standgub": 1.2576995000e3,
    "shell": 1.2088253460e9,
}


@pytest.mark.parametrize("name,ref_obj", sorted(IPM_OBJECTIVES.items()))
def test_ipm_objective(instances_dir, name, ref_obj):
    lp = read_mps(instance_path(f"{name}.mps")).lp
    st, sol, info = solve_lp_ipm_native(lp, HighsOptions())
    assert st == HighsModelStatus.kOptimal
    assert abs(info.primal_obj - ref_obj) / max(1.0, abs(ref_obj)) < 1e-7


def test_ipm_duals_satisfy_kkt(instances_dir):
    from highs_tpu.models.solution import HighsSolution
    from highs_tpu.utils.kkt import compute_kkt
    lp = read_mps(instance_path("adlittle.mps")).lp
    st, sol, info = solve_lp_ipm_native(lp, HighsOptions())
    rep = compute_kkt(lp, sol)
    assert rep.num_primal_infeasibilities == 0
    assert rep.num_dual_infeasibilities == 0
    assert rep.max_dual_residual_error < 1e-6
    assert rep.primal_dual_objective_error < 1e-7


# reference: these instances must be detected infeasible
# (check/CMakeLists.txt:250-264)
INFEASIBLE = ["galenet", "woodinfe", "box1"]


@pytest.mark.parametrize("name", INFEASIBLE)
def test_infeasible_detection(instances_dir, name):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path(f"{name}.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kInfeasible


def test_unbounded_detection(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("gas11.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kUnbounded


def test_solver_option_ipm(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "ipm")
    h.readModel(instance_path("afiro.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert h.getInfo().ipm_iteration_count > 0
    assert abs(h.getObjectiveValue() - (-4.6475314286e2)) < 1e-5


def test_ipm_crossover_basis(instances_dir):
    """run_crossover=on (default): IPM solutions get a vertex basis and
    exact complementarity (reference: TestCrossover behavior)."""
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "ipm")
    h.readModel(instance_path("adlittle.mps"))
    h.run()
    info = h.getInfo()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert info.crossover_iteration_count >= 0
    assert h.getBasis().valid
    assert info.max_complementarity_violation < 1e-8
    assert abs(h.getObjectiveValue() - 2.2549496316e5) < 1e-2


def test_crossover_api(instances_dir):
    """Highs.crossover(solution) converts a user solution to a basis."""
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("afiro.mps"))
    h.setOptionValue("solver", "pdlp")
    h.run()
    sol = h.getSolution()
    h2 = Highs()
    h2.setOptionValue("output_flag", False)
    h2.readModel(instance_path("afiro.mps"))
    assert h2.crossover(sol) == 0
    assert h2.getBasis().valid
    assert abs(h2.getObjectiveValue() - (-4.6475314286e2)) < 1e-4


def test_ipm_cg_newton_matches_cholesky(instances_dir):
    """The matrix-free CG Newton path (tpu_ipm_newton=cg) must reach the
    same optimum as the dense Cholesky path."""
    objs = {}
    for newton in ("cholesky", "cg"):
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("solver", "ipm")
        h.setOptionValue("presolve", "off")
        h.setOptionValue("tpu_ipm_newton", newton)
        h.readModel(instance_path("adlittle.mps"))
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        objs[newton] = h.getObjectiveValue()
    assert abs(objs["cg"] - 2.2549496316e5) < 1e-2
    assert abs(objs["cg"] - objs["cholesky"]) < 1e-3


def test_run_centring_analytic_centre(instances_dir):
    """run_centring (reference ipx run_centring, ipm.cc:450): returns a
    strictly interior, primal-feasible point — the analytic centre."""
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "ipm")
    h.setOptionValue("run_centring", True)
    h.setOptionValue("run_crossover", "off")
    h.setOptionValue("presolve", "off")
    h.readModel(instance_path("afiro.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    lp = h.getLp()
    x = np.asarray(h.getSolution().col_value)
    ax = lp.a_matrix.to_scipy() @ x
    assert np.all(ax >= lp.row_lower - 1e-6)
    assert np.all(ax <= lp.row_upper + 1e-6)
    # strictly interior w.r.t. finite bounds
    fin_lo = np.isfinite(lp.col_lower)
    assert np.all(x[fin_lo] > lp.col_lower[fin_lo])
