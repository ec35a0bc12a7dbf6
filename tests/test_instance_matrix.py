"""Instance-matrix harness.

Mirror of the reference ctest instance tests (check/CMakeLists.txt
add_instancetests :204-450): each instance runs across a settings
matrix (--presolve=off/on, --random_seed variations) and must print the
expected model status and objective.  Objectives are the reference's
own expected values (BASELINE.md)."""
import numpy as np
import pytest

from highs_tpu import Highs, HighsModelStatus

from conftest import instance_path

# name -> reference objective (check/CMakeLists.txt:207-218)
LP_OBJECTIVES = {
    "afiro": -4.6475314286e2,
    "adlittle": 2.2549496316e5,
    "stair": -2.5126695119e2,
    "standata": 1.2576995000e3,
    "avgas": -7.75,
    "25fv47": 5.5018458883e3,
    "greenbea": -7.2555248130e7,
    "80bau3b": 9.8722419241e5,
}

INFEASIBLE = ["galenet", "woodinfe", "box1", "bgetam"]
UNBOUNDED = ["gas11"]


def _solve(name, presolve="on", seed=0, solver="simplex"):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("presolve", presolve)
    h.setOptionValue("random_seed", seed)
    h.setOptionValue("solver", solver)
    h.setOptionValue("time_limit", 300.0)
    assert h.readModel(instance_path(f"{name}.mps")) == 0
    h.run()
    return h


@pytest.mark.parametrize("presolve", ["on", "off"])
@pytest.mark.parametrize("name", sorted(LP_OBJECTIVES))
def test_lp_objective_matrix(instances_dir, name, presolve):
    h = _solve(name, presolve=presolve)
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    ref = LP_OBJECTIVES[name]
    assert abs(h.getObjectiveValue() - ref) <= 1e-6 * max(1.0, abs(ref))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_seed_determinism(instances_dir, seed):
    """Determinism: the same seed twice gives identical objectives, and
    every seed gives the reference optimum (ctest --random_seed runs)."""
    h1 = _solve("adlittle", seed=seed)
    h2 = _solve("adlittle", seed=seed)
    assert h1.getObjectiveValue() == h2.getObjectiveValue()
    ref = LP_OBJECTIVES["adlittle"]
    assert abs(h1.getObjectiveValue() - ref) <= 1e-6 * abs(ref)


@pytest.mark.parametrize("name", INFEASIBLE)
def test_infeasible_instances(instances_dir, name):
    h = _solve(name)
    assert h.getModelStatus() == HighsModelStatus.kInfeasible


@pytest.mark.parametrize("name", UNBOUNDED)
def test_unbounded_instances(instances_dir, name):
    h = _solve(name)
    assert h.getModelStatus() in (
        HighsModelStatus.kUnbounded,
        HighsModelStatus.kUnboundedOrInfeasible)


@pytest.mark.parametrize("name", ["afiro", "adlittle", "stair"])
def test_pdlp_objective_agreement(instances_dir, name):
    """PDLP instance list objective agreement at relative tolerance
    (check/CMakeLists.txt:303-345)."""
    h = _solve(name, solver="pdlp")
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    ref = LP_OBJECTIVES[name]
    assert abs(h.getObjectiveValue() - ref) <= 1e-4 * max(1.0, abs(ref))
