"""MIP primal heuristic tests (reference: HighsPrimalHeuristics.cpp
behaviors — ZI-round, shifting, randomized rounding, RINS/RENS bounds,
reduced-cost fixing)."""
import numpy as np
import pytest
import scipy.sparse as sp

from highs_tpu.solvers.mip import heuristics as heur


def small_problem():
    # max x1 + x2 s.t. x1 + x2 <= 3.5, integers in [0, 3]
    a = sp.csc_matrix(np.array([[1.0, 1.0]]))
    row_lower = np.array([-np.inf])
    row_upper = np.array([3.5])
    lo = np.zeros(2)
    up = np.full(2, 3.0)
    cost = np.array([-1.0, -1.0])  # minimize -x1-x2
    is_int = np.array([True, True])
    return a, row_lower, row_upper, lo, up, cost, is_int


def test_zi_round_integral_result():
    a, rl, ru, lo, up, cost, is_int = small_problem()
    x0 = np.array([1.75, 1.75])  # LP relaxation optimum
    x = heur.zi_round(a, rl, ru, lo, up, cost, is_int, x0)
    assert x is not None
    assert np.allclose(x, np.round(x))
    assert x.sum() <= 3.5 + 1e-6


def test_zi_round_gives_up_when_stuck():
    # x1 + x2 = 1.5 equality: no integral point reachable by shifting
    a = sp.csc_matrix(np.array([[1.0, 1.0]]))
    rl = np.array([1.5])
    ru = np.array([1.5])
    lo, up = np.zeros(2), np.ones(2)
    cost = np.zeros(2)
    is_int = np.array([True, True])
    x = heur.zi_round(a, rl, ru, lo, up, cost, is_int,
                      np.array([0.75, 0.75]))
    assert x is None


def test_shifting_repairs_violation():
    a, rl, ru, lo, up, cost, is_int = small_problem()
    # rounding 1.75 up to 2 violates the row (4 > 3.5); shifting must
    # pull one variable back down
    x = heur.shifting(a, rl, ru, lo, up, cost, is_int,
                      np.array([1.75, 1.75]))
    assert x is not None
    assert np.allclose(x[is_int], np.round(x[is_int]))
    assert (a @ x)[0] <= 3.5 + 1e-6


def test_shifting_with_continuous_var():
    # x_int + x_cont <= 2, round int up to 2 => cont must shift to 0
    a = sp.csc_matrix(np.array([[1.0, 1.0]]))
    rl = np.array([-np.inf])
    ru = np.array([2.0])
    lo, up = np.zeros(2), np.array([3.0, 3.0])
    cost = np.array([-1.0, 0.0])
    is_int = np.array([True, False])
    x = heur.shifting(a, rl, ru, lo, up, cost, is_int,
                      np.array([1.6, 0.9]))
    assert x is not None
    assert abs(x[0] - round(x[0])) < 1e-9
    assert x[0] + x[1] <= 2.0 + 1e-6


def test_randomized_rounding_is_integral_and_deterministic():
    a = sp.csr_matrix(np.array([[1.0, 1.0]]))
    lo, up = np.zeros(2), np.full(2, 5.0)
    is_int = np.array([True, True])
    x0 = np.array([1.3, 2.7])
    x1 = heur.randomized_rounding(a, lo, up, is_int, x0, seed=7)
    x2 = heur.randomized_rounding(a, lo, up, is_int, x0, seed=7)
    assert np.array_equal(x1, x2)
    assert np.allclose(x1, np.round(x1))
    assert np.all(np.abs(x1 - x0) <= 1.0)


def test_rins_bounds_fix_agreeing_vars():
    is_int = np.array([True, True, False])
    incumbent = np.array([2.0, 3.0, 0.7])
    x_relax = np.array([2.0, 2.4, 0.9])
    lo = np.zeros(3)
    up = np.full(3, 10.0)
    lo2, up2, nfx = heur.submip_bounds_rins(is_int, incumbent, x_relax,
                                            lo, up)
    assert nfx == 1
    assert lo2[0] == up2[0] == 2.0
    assert lo2[1] == 0.0 and up2[1] == 10.0  # disagrees: stays free
    assert lo2[2] == 0.0 and up2[2] == 10.0  # continuous: free


def test_rens_bounds_box():
    is_int = np.array([True, False])
    x_relax = np.array([2.4, 1.7])
    lo, up = np.zeros(2), np.full(2, 10.0)
    lo2, up2 = heur.submip_bounds_rens(is_int, x_relax, lo, up)
    assert lo2[0] == 2.0 and up2[0] == 3.0
    assert lo2[1] == 0.0 and up2[1] == 10.0


def test_redcost_fixing_tightens():
    # minimize: node obj 10, cutoff 12, z = [4, -4, 0]
    z = np.array([4.0, -4.0, 0.0])
    x = np.array([0.0, 5.0, 1.0])
    lo = np.array([0.0, 0.0, 0.0])
    up = np.array([5.0, 5.0, 5.0])
    is_int = np.array([True, True, True])
    lo2, up2, n = heur.redcost_fixing(z, x, 10.0, 12.0, lo, up, is_int)
    assert n == 2
    # x0 <= 0 + 2/4 = 0.5 -> floor 0
    assert up2[0] == 0.0
    # x1 >= 5 - 0.5 = 4.5 -> ceil 5
    assert lo2[1] == 5.0
    assert up2[2] == 5.0 and lo2[2] == 0.0


def test_redcost_fixing_no_gap_no_change():
    z = np.array([4.0])
    x = np.array([0.0])
    lo, up = np.zeros(1), np.full(1, 5.0)
    lo2, up2, n = heur.redcost_fixing(z, x, 10.0, np.inf, lo, up,
                                      np.array([True]))
    assert n == 0 and up2[0] == 5.0


def _mip_solve(name, **opts):
    from highs_tpu import Highs
    h = Highs()
    h.readModel(f"/root/reference/check/instances/{name}")
    h.setOptionValue("output_flag", False)
    h.setOptionValue("time_limit", 120)
    for k, v in opts.items():
        h.setOptionValue(k, v)
    h.run()
    return h


@pytest.mark.parametrize("flags", [
    {"mip_heuristic_run_zi_round": True,
     "mip_heuristic_run_shifting": True},
    {"mip_heuristic_run_rins": False, "mip_heuristic_run_rens": False,
     "mip_heuristic_run_root_reduced_cost": False},
])
def test_egout_with_heuristic_matrix(flags):
    h = _mip_solve("egout.mps", **flags)
    assert h.getModelStatus().name == "kOptimal"
    assert abs(h.getObjectiveValue() - 568.1007) < 1e-3


def test_objective_bound_cutoff():
    # flugpl optimum 1201500: an objective_bound below it prunes all
    h = _mip_solve("flugpl.mps", objective_bound=1201000.0)
    assert h.getModelStatus().name in ("kObjectiveBound", "kOptimal")
    from highs_tpu.constants import HighsModelStatus
    assert h.getModelStatus() == HighsModelStatus.kObjectiveBound


def test_objective_target_stops_early():
    # target above the optimum: any incumbent at least this good stops
    h = _mip_solve("flugpl.mps", objective_target=1300000.0)
    assert h.getModelStatus().name in ("kObjectiveTarget", "kOptimal")
