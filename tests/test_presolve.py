"""Presolve rule tests (reference: TestPresolve.cpp /
TestPresolveRules.cpp behavior: solutions and duals must be identical
with presolve on/off, per-rule off switches honored)."""
import numpy as np
import pytest

from highs_tpu import Highs, HighsModelStatus
from highs_tpu.constants import PresolveRuleType
from highs_tpu.io.mps import read_mps
from highs_tpu.options import HighsOptions
from highs_tpu.presolve.presolve import presolve_lp

from conftest import instance_path

INSTANCES = ["afiro", "adlittle", "stair", "standata"]


@pytest.mark.parametrize("name", INSTANCES)
def test_presolve_on_off_same_solution(instances_dir, name):
    results = {}
    for presolve in ("on", "off"):
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("presolve", presolve)
        h.readModel(instance_path(f"{name}.mps"))
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        results[presolve] = (h.getObjectiveValue(), h.getInfo())
    obj_on, info_on = results["on"]
    obj_off, info_off = results["off"]
    assert abs(obj_on - obj_off) / max(1.0, abs(obj_off)) < 1e-8
    # postsolved duals must satisfy KKT as strictly as direct solves
    assert info_on.max_dual_residual_error < 1e-6
    assert info_on.num_dual_infeasibilities == 0
    assert info_on.num_primal_infeasibilities == 0


def test_presolve_reduces(instances_dir):
    lp = read_mps(instance_path("adlittle.mps")).lp
    pr = presolve_lp(lp, HighsOptions())
    assert pr.reduced
    assert pr.reduced_lp.num_col < lp.num_col
    assert pr.reduced_lp.num_row < lp.num_row


def test_presolve_rule_off_bitmask(instances_dir):
    lp = read_mps(instance_path("adlittle.mps")).lp
    opts = HighsOptions()
    # switching off every implemented rule must yield no reductions
    mask = 0
    for rule in (PresolveRuleType.kEmptyRow,
                 PresolveRuleType.kSingletonRow,
                 PresolveRuleType.kRedundantRow,
                 PresolveRuleType.kEmptyCol,
                 PresolveRuleType.kFixedCol,
                 PresolveRuleType.kDoubletonEquation):
        mask |= 1 << int(rule)
    opts.presolve_rule_off = mask
    pr = presolve_lp(lp, opts)
    assert not pr.reduced


def test_presolve_detects_infeasible_empty_row():
    import scipy.sparse as sp
    from highs_tpu import HighsLp, kHighsInf
    from highs_tpu.models.lp import HighsSparseMatrix
    # row with no entries but positive lower bound
    a = sp.csc_matrix(np.zeros((1, 1)))
    lp = HighsLp(num_col=1, num_row=1,
                 col_cost=np.array([1.0]),
                 col_lower=np.array([0.0]),
                 col_upper=np.array([kHighsInf]),
                 row_lower=np.array([1.0]),
                 row_upper=np.array([2.0]),
                 a_matrix=HighsSparseMatrix.from_scipy(a))
    pr = presolve_lp(lp, HighsOptions())
    assert pr.status == HighsModelStatus.kInfeasible


def test_presolve_mip_consistency(instances_dir):
    objs = []
    for presolve in ("on", "off"):
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("presolve", presolve)
        h.setOptionValue("time_limit", 60.0)
        h.readModel(instance_path("flugpl.mps"))
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        objs.append(h.getObjectiveValue())
    assert abs(objs[0] - objs[1]) < 1e-4 * max(1.0, abs(objs[1]))
