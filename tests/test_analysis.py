"""Tests for callbacks, rays, ranging, basis IO, IIS, multi-objective,
feasibility relaxation (reference: TestCallbacks/TestRays/TestRanging/
TestIis/TestMultiObjective behaviors)."""
import numpy as np
import pytest
import scipy.sparse as sp

from highs_tpu import (Highs, HighsLinearObjective, HighsLp,
                       HighsModelStatus, HighsStatus, kHighsInf)
from highs_tpu.constants import HighsCallbackType
from highs_tpu.models.lp import HighsSparseMatrix

from conftest import instance_path


def _small_lp():
    a = sp.csc_matrix(np.array([[1.0, 1.0], [1.0, 3.0]]))
    return HighsLp(
        num_col=2, num_row=2,
        col_cost=np.array([-1.0, -2.0]),
        col_lower=np.zeros(2), col_upper=np.array([kHighsInf, kHighsInf]),
        row_lower=np.array([-kHighsInf, -kHighsInf]),
        row_upper=np.array([4.0, 6.0]),
        a_matrix=HighsSparseMatrix.from_scipy(a))


def test_logging_callback():
    messages = []

    def cb(callback_type, message, data_out, data_in, user_data):
        messages.append((callback_type, message))

    h = Highs()
    h.passModel(_small_lp())
    h.setCallback(cb, None)
    h.startCallback(HighsCallbackType.kCallbackLogging)
    h.run()
    h.reportSolvedStats()
    assert any("Model status" in m for _, m in messages)


def test_mip_interrupt_callback(instances_dir):
    def cb(callback_type, message, data_out, data_in, user_data):
        if callback_type == int(HighsCallbackType.kCallbackMipInterrupt):
            if data_out.mip_node_count >= 5:
                data_in.user_interrupt = True

    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("flugpl.mps"))
    h.setCallback(cb, None)
    h.startCallback(HighsCallbackType.kCallbackMipInterrupt)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kInterrupt


def test_mip_solution_callback(instances_dir):
    solutions = []

    def cb(callback_type, message, data_out, data_in, user_data):
        if callback_type == int(HighsCallbackType.kCallbackMipSolution):
            solutions.append(data_out.objective_function_value)

    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("time_limit", 60.0)
    h.readModel(instance_path("flugpl.mps"))
    h.setCallback(cb, None)
    h.startCallback(HighsCallbackType.kCallbackMipSolution)
    h.run()
    assert len(solutions) >= 1


def test_dual_ray(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("galenet.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kInfeasible
    has_ray, ray = h.getDualRay()
    assert has_ray
    assert len(ray) == h.getNumRow()
    assert np.abs(ray).max() > 1e-8


def test_primal_ray():
    lp = HighsLp(
        num_col=2, num_row=1,
        col_cost=np.array([-1.0, 0.0]),
        col_lower=np.zeros(2), col_upper=np.full(2, kHighsInf),
        row_lower=np.array([-kHighsInf]), row_upper=np.array([5.0]),
        a_matrix=HighsSparseMatrix.from_scipy(
            sp.csc_matrix(np.array([[0.0, 1.0]]))))
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kUnbounded
    has_ray, ray = h.getPrimalRay()
    assert has_ray
    # the ray must increase x0 (the unbounded direction)
    assert ray[0] > 1e-6


def test_ranging_small():
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(_small_lp())
    h.run()
    st, ranging = h.getRanging()
    assert st == HighsStatus.kOk
    assert ranging.valid
    # optimal basis x=(3,1): both structural basic; increasing cost of
    # col 0 beyond some range changes the basis
    assert ranging.col_cost_up.value_[0] >= -1.0
    assert ranging.col_cost_dn.value_[0] <= -1.0
    # row bound ranging: row 0 at upper 4
    assert ranging.row_bound_up.value_[0] >= 4.0


def test_kappa():
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(_small_lp())
    h.run()
    st, kappa = h.getKappa(exact=True)
    assert st == HighsStatus.kOk
    assert kappa >= 1.0


def test_basis_write_read(tmp_path, instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("afiro.mps"))
    h.run()
    basis = h.getBasis()
    assert basis.valid
    path = str(tmp_path / "b.bas")
    assert h.writeBasis(path) == HighsStatus.kOk
    h2 = Highs()
    h2.setOptionValue("output_flag", False)
    h2.readModel(instance_path("afiro.mps"))
    assert h2.readBasis(path) == HighsStatus.kOk
    b2 = h2.getBasis()
    assert list(map(int, b2.col_status)) == \
        list(map(int, basis.col_status))


def test_iis_galenet(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("galenet.mps"))
    h.run()
    st, iis = h.getIis()
    assert st == HighsStatus.kOk
    assert iis.valid
    assert len(iis.row_index) >= 1
    # dropping all IIS rows must make the model feasible
    lp = h.getLp().copy()
    for i in iis.row_index:
        lp.row_lower[i] = -kHighsInf
        lp.row_upper[i] = kHighsInf
    h3 = Highs()
    h3.setOptionValue("output_flag", False)
    h3.passModel(lp)
    h3.run()
    assert h3.getModelStatus() == HighsModelStatus.kOptimal


def test_multiobjective_blend():
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(_small_lp())
    o1 = HighsLinearObjective(weight=1.0,
                              coefficients=np.array([-1.0, 0.0]))
    o2 = HighsLinearObjective(weight=1.0,
                              coefficients=np.array([0.0, -2.0]))
    h.addLinearObjective(o1)
    h.addLinearObjective(o2)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    # blended = original objective: optimum -5
    assert abs(h.getObjectiveValue() - (-5.0)) < 1e-5


def test_multiobjective_lexicographic():
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("blend_multi_objectives", False)
    h.passModel(_small_lp())
    # priority 1: minimize -x (i.e. maximize x); then minimize -y
    o1 = HighsLinearObjective(weight=1.0, priority=10,
                              coefficients=np.array([-1.0, 0.0]),
                              abs_tolerance=0.0, rel_tolerance=0.0)
    o2 = HighsLinearObjective(weight=1.0, priority=1,
                              coefficients=np.array([0.0, -1.0]),
                              abs_tolerance=0.0, rel_tolerance=0.0)
    h.passLinearObjectives([o1, o2])
    h.run()
    sol = h.getSolution()
    # first maximize x -> x = 4 (row0), then maximize y subject to x=4:
    # x+y<=4 -> y=0... x+3y<=6 -> y<=2/3; y=0 from row 0
    assert abs(sol.col_value[0] - 4.0) < 1e-5
    assert abs(sol.col_value[1] - 0.0) < 1e-5


def test_feasibility_relaxation():
    lp = _small_lp()
    lp.col_lower = np.array([5.0, 0.0])  # infeasible with x+y<=4
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.feasibilityRelaxation()
    sol = h.getSolution()
    assert sol.value_valid
    # relaxed solution respects col bound x >= 5
    assert sol.col_value[0] >= 5.0 - 1e-6


def test_simplex_interrupt_callback(instances_dir):
    fired = {"n": 0}

    def cb(callback_type, message, data_out, data_in, user_data):
        if callback_type == int(
                HighsCallbackType.kCallbackSimplexInterrupt):
            fired["n"] += 1
            data_in.user_interrupt = True

    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("presolve", "off")
    h.readModel(instance_path("25fv47.mps"))
    h.setCallback(cb, None)
    h.startCallback(HighsCallbackType.kCallbackSimplexInterrupt)
    h.run()
    assert fired["n"] >= 1
    assert h.getModelStatus() == HighsModelStatus.kInterrupt


def test_ipm_interrupt_callback(instances_dir):
    fired = {"n": 0}

    def cb(callback_type, message, data_out, data_in, user_data):
        if callback_type == int(HighsCallbackType.kCallbackIpmInterrupt):
            fired["n"] += 1
            if data_out.ipm_iteration_count >= 2:
                data_in.user_interrupt = True

    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "ipm")
    h.readModel(instance_path("adlittle.mps"))
    h.setCallback(cb, None)
    h.startCallback(HighsCallbackType.kCallbackIpmInterrupt)
    h.run()
    assert fired["n"] >= 1


def test_mip_user_solution_callback(instances_dir):
    """kCallbackMipUserSolution: inject the known optimum."""
    state = {"fired": 0}

    def cb(callback_type, message, data_out, data_in, user_data):
        if callback_type == int(
                HighsCallbackType.kCallbackMipUserSolution):
            state["fired"] += 1
            if state["fired"] == 1 and user_data is not None:
                data_in.user_has_solution = True
                data_in.user_solution = user_data

    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("flugpl.mps"))
    h.run()
    xopt = np.array(h.getSolution().col_value)

    h2 = Highs()
    h2.setOptionValue("output_flag", False)
    h2.readModel(instance_path("flugpl.mps"))
    h2.setCallback(cb, xopt)
    h2.startCallback(HighsCallbackType.kCallbackMipUserSolution)
    h2.run()
    assert state["fired"] >= 1
    assert abs(h2.getInfo().objective_function_value - 1201500.0) < 1.0


def test_mip_cut_pool_callback(instances_dir):
    got = {"cuts": -1}

    def cb(callback_type, message, data_out, data_in, user_data):
        if callback_type == int(
                HighsCallbackType.kCallbackMipGetCutPool):
            got["cuts"] = data_out.cutpool_num_cut

    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("bell5.mps"))
    h.setCallback(cb, None)
    h.startCallback(HighsCallbackType.kCallbackMipGetCutPool)
    h.run()
    # fired at least once with a well-formed (possibly empty) pool
    assert got["cuts"] >= 0


def test_mip_lazy_constraint_callback_fires(instances_dir):
    fired = {"n": 0}

    def cb(callback_type, message, data_out, data_in, user_data):
        if callback_type == int(
                HighsCallbackType.kCallbackMipDefineLazyConstraints):
            fired["n"] += 1
            assert data_out.mip_solution is not None

    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("egout.mps"))
    h.setCallback(cb, None)
    h.startCallback(
        HighsCallbackType.kCallbackMipDefineLazyConstraints)
    h.run()
    assert fired["n"] >= 1


def test_iis_strategies(instances_dir):
    """IIS strategy bits (reference HConst.h:291-301): from-ray
    pre-filtering and the irreducible column-bound filter produce
    valid subsystems on galenet."""
    from highs_tpu.constants import HighsStatus

    base_rows = None
    for strategy in [0, 1, 4, 1 | 4, 8 | 4, 16]:
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("iis_strategy", strategy)
        h.readModel(instance_path("galenet.mps"))
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kInfeasible
        st, iis = h.getIis()
        assert st == HighsStatus.kOk
        assert iis.valid and len(iis.row_index) >= 1
        if strategy == 0:
            base_rows = set(iis.row_index)
        if strategy & 4:
            assert len(iis.col_bound) == len(iis.col_index)
    assert base_rows


def test_highs_debug_level_checks(instances_dir):
    """highs_debug_level-gated consistency layer (reference
    HighsDebug.cpp / HighsSolutionDebug.cpp / HEkkDebug role): a clean
    optimal solve at level 3 produces no findings; a corrupted solution
    is flagged at level 2."""
    from conftest import instance_path
    from highs_tpu import Highs, HighsModelStatus
    from highs_tpu.utils.debug import debug_check_lp_solution

    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("highs_debug_level", 3)
    h.readModel(instance_path("afiro.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    findings = debug_check_lp_solution(
        h._model.lp, h._solution,
        h._basis if h._basis.valid else None, h._options,
        h.getModelStatus())
    assert findings == []

    # corrupt the primal solution: level-2 census must notice
    bad = h._solution
    bad.col_value = bad.col_value + 100.0
    h.setOptionValue("highs_debug_level", 2)
    findings = debug_check_lp_solution(
        h._model.lp, bad, None, h._options, h.getModelStatus())
    assert findings


def test_get_ill_conditioning_methods():
    # reference Highs::getIllConditioning (Highs.h:644-751): a basis
    # exists after an optimal simplex solve; both views and methods
    # return normalized multipliers summing to unit 1-norm
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel("/root/reference/check/instances/afiro.mps")
    h.run()
    for constraint in (True, False):
        st, ill, measure = h.getIllConditioning(constraint, method=0)
        assert st == HighsStatus.kOk
        assert ill.record, "well-posed basis still yields multipliers"
        norm1 = sum(abs(r.multiplier) for r in ill.record)
        assert abs(norm1 - 1.0) < 1e-4
        # sorted by decreasing magnitude
        mags = [abs(r.multiplier) for r in ill.record]
        assert mags == sorted(mags, reverse=True)
        assert measure is not None and measure >= 0
    # method 1 with a generous bound solves; tiny bound -> empty kOk
    st, ill, measure = h.getIllConditioning(True, method=1,
                                            ill_conditioning_bound=1e2)
    assert st == HighsStatus.kOk
    st2, ill2, _ = h.getIllConditioning(True, method=1,
                                        ill_conditioning_bound=1e-300)
    assert st2 in (HighsStatus.kOk, HighsStatus.kError)


def test_run_data_registry():
    # reference lp_data/HighsRunData.h:29-47: post-run metric registry
    from highs_tpu.run_data import HighsRunData
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel("/root/reference/check/instances/adlittle.mps")
    rd0 = h.getRunData()
    assert not rd0.valid
    h.run()
    rd = h.getRunData()
    assert rd.valid
    assert rd.presolved_model_num_col > 0
    assert rd.presolved_model_num_row > 0
    assert rd.presolved_model_num_nz > 0
    assert rd.solve_time >= 0 and rd.presolve_time >= 0
    # presolve reduced adlittle: fewer columns than the full model
    assert rd.presolved_model_num_col <= h.getNumCol()
    # name access and typed census
    assert h.getRunDataValue("presolved_model_num_col") == \
        rd.presolved_model_num_col
    assert h.getRunDataType("solve_time") is float
    names = [n for (n, t, d) in HighsRunData.records()]
    assert "num_simplex_iterations_after_postsolve" in names
    # MIP path fills the registry too
    h2 = Highs()
    h2.setOptionValue("output_flag", False)
    h2.readModel("/root/reference/check/instances/flugpl.mps")
    h2.run()
    assert h2.getRunData().valid
    assert h2.getRunData().presolved_model_num_col > 0
