"""MIP solver tests vs reference objective expectations
(check/CMakeLists.txt:268-280)."""
import numpy as np
import pytest
import scipy.sparse as sp

from highs_tpu import (Highs, HighsLp, HighsModelStatus, HighsVarType,
                      ObjSense, kHighsInf)
from highs_tpu.models.lp import HighsSparseMatrix

from conftest import instance_path

# fast reference MIP instances: name -> objective
MIP_OBJECTIVES = {
    "small_mip": 3.2368421,
    "flugpl": 1201500.0,
    "egout": 568.1007,
    "rgn": 82.19999924,
    "gt2": 21166.0,
    "lseu": 1120.0,
}


@pytest.mark.parametrize("name,ref_obj", sorted(MIP_OBJECTIVES.items()))
def test_mip_objective(instances_dir, name, ref_obj):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("time_limit", 120.0)
    assert h.readModel(instance_path(f"{name}.mps")) == 0
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - ref_obj) / max(1.0, abs(ref_obj)) \
        < 1e-5
    # integrality of the incumbent
    assert h.getInfo().max_integrality_violation < 1e-5


def test_mip_infeasible():
    # x + y <= 1, x + y >= 2, x,y binary
    a = sp.csc_matrix(np.array([[1.0, 1.0]]))
    lp = HighsLp(
        num_col=2, num_row=1,
        col_cost=np.array([1.0, 1.0]),
        col_lower=np.zeros(2), col_upper=np.ones(2),
        row_lower=np.array([1.6]), row_upper=np.array([1.8]),
        a_matrix=HighsSparseMatrix.from_scipy(a),
        integrality=np.array([1, 1], dtype=np.uint8))
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kInfeasible


def test_mip_simple_knapsack():
    # max 8a + 11b + 6c + 4d s.t. 5a+7b+4c+3d <= 14, binary
    a = sp.csc_matrix(np.array([[5.0, 7.0, 4.0, 3.0]]))
    lp = HighsLp(
        num_col=4, num_row=1,
        col_cost=np.array([8.0, 11.0, 6.0, 4.0]),
        col_lower=np.zeros(4), col_upper=np.ones(4),
        row_lower=np.array([-kHighsInf]), row_upper=np.array([14.0]),
        a_matrix=HighsSparseMatrix.from_scipy(a),
        sense=ObjSense.kMaximize,
        integrality=np.ones(4, dtype=np.uint8))
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    # optimum: b + c + d = 21 (weight 14)
    assert abs(h.getObjectiveValue() - 21.0) < 1e-6


def test_solve_relaxation_option(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solve_relaxation", True)
    h.readModel(instance_path("flugpl.mps"))
    h.run()
    # LP relaxation optimum ~1167185.73 < MIP optimum
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert h.getObjectiveValue() < 1201500.0 - 1.0


def test_semi_continuous(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("semi-continuous.lp"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    # semi variables must be 0 or within their [l, u]
    lp = h.getLp()
    sol = h.getSolution()
    integ = np.asarray(lp.integrality)
    semi = (integ == int(HighsVarType.kSemiContinuous)) | (
        integ == int(HighsVarType.kSemiInteger))
    for j in np.nonzero(semi)[0]:
        v = sol.col_value[j]
        assert abs(v) < 1e-5 or v >= lp.col_lower[j] - 1e-5


def test_mip_debug_solution_tracer(instances_dir, tmp_path):
    """mip_debug_solution_file: a known optimum must survive cuts and
    propagation without warnings (reference HighsDebugSol)."""
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("time_limit", 60.0)
    h.readModel(instance_path("egout.mps"))
    h.run()
    sol = h.getSolution()
    dbg = str(tmp_path / "egout.debug")
    lp = h.getLp()
    with open(dbg, "w") as f:
        for j in range(lp.num_col):
            f.write(f"{lp.col_names[j]} {sol.col_value[j]:.15g}\n")
    warnings = []
    h2 = Highs()
    h2.setLogCallback(lambda t, m: warnings.append(m)
                      if "debug solution violated" in m else None)
    h2.setOptionValue("mip_debug_solution_file", dbg)
    h2.setOptionValue("time_limit", 60.0)
    h2.readModel(instance_path("egout.mps"))
    h2.run()
    assert h2.getModelStatus() == HighsModelStatus.kOptimal
    assert warnings == []


def test_mip_improving_solution_file(instances_dir, tmp_path):
    path = str(tmp_path / "improving.txt")
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("mip_improving_solution_file", path)
    h.setOptionValue("time_limit", 60.0)
    h.readModel(instance_path("flugpl.mps"))
    h.run()
    text = open(path).read()
    assert "# objective" in text
    # last recorded objective equals the final optimum
    objs = [float(ln.split()[2]) for ln in text.splitlines()
            if ln.startswith("# objective")]
    assert abs(objs[-1] - 1201500.0) < 1.0


@pytest.mark.parametrize("mode", [{"tpu_mip_batch_nodes": 4},
                                  {"mip_search_simulate_concurrency": True}])
def test_mip_batched_node_evaluation(instances_dir, mode):
    """Batched node-LP rounds (vmapped IPM over node bounds) must reach
    the same optimum as the sequential engine (SURVEY §7.7)."""
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("time_limit", 120.0)
    for k, v in mode.items():
        h.setOptionValue(k, v)
    h.readModel(instance_path("egout.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - 568.1007) < 1e-2


def test_semi_variable_modification_sequence(instances_dir):
    """Reference TestSemiVariables.cpp: solve (8.22333), fix the semi
    column at 0 (6.83333), switch to semi-integer and restore bounds
    (8.13333)."""
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.readModel(instance_path("semi-continuous.mps"))
    lp = h.getLp()
    integ = np.asarray(lp.integrality)
    semi_col = int(np.nonzero(
        integ == int(HighsVarType.kSemiContinuous))[0][0])
    lo0, up0 = float(lp.col_lower[semi_col]), float(lp.col_upper[semi_col])
    h.run()
    assert abs(h.getObjectiveValue() - 8.22333) < 1e-4

    h.changeColBounds(semi_col, 0.0, 0.0)
    h.run()
    assert abs(h.getObjectiveValue() - 6.83333) < 1e-4

    h.changeColIntegrality(semi_col, HighsVarType.kSemiInteger)
    h.changeColBounds(semi_col, lo0, up0)
    h.run()
    assert abs(h.getObjectiveValue() - 8.13333) < 1e-4


def test_sos1_enforced():
    """SOS1: at most one member nonzero (reference: SOS via HMpsFF +
    SOS branching).  max x1+x2+x3 s.t. x <= 1 each, SOS1{x1,x2,x3}:
    LP optimum picks all three (3.0); SOS1 forces exactly one (1.0)."""
    import scipy.sparse as sp
    from highs_tpu import HighsLp
    from highs_tpu.models.lp import HighsSparseMatrix
    lp = HighsLp(
        num_col=3, num_row=1,
        col_cost=np.array([-1.0, -1.0, -1.0]),
        col_lower=np.zeros(3), col_upper=np.ones(3),
        row_lower=np.array([-np.inf]), row_upper=np.array([10.0]),
        a_matrix=HighsSparseMatrix.from_scipy(
            sp.csc_matrix(np.ones((1, 3)))),
        sos=[("S1", 0, [0, 1, 2], [1.0, 2.0, 3.0])])
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    x = np.asarray(h.getSolution().col_value)
    assert np.sum(np.abs(x) > 1e-6) <= 1
    assert abs(h.getObjectiveValue() - (-1.0)) < 1e-6


def test_sos2_enforced():
    """SOS2: at most two nonzero and adjacent.  max sum(x), SOS2 over
    4 members: optimum = 2 adjacent at their bounds."""
    import scipy.sparse as sp
    from highs_tpu import HighsLp
    from highs_tpu.models.lp import HighsSparseMatrix
    lp = HighsLp(
        num_col=4, num_row=1,
        col_cost=np.array([-1.0, -2.0, -1.0, -2.0]),
        col_lower=np.zeros(4), col_upper=np.ones(4),
        row_lower=np.array([-np.inf]), row_upper=np.array([10.0]),
        a_matrix=HighsSparseMatrix.from_scipy(
            sp.csc_matrix(np.ones((1, 4)))),
        sos=[("S2", 0, [0, 1, 2, 3], [1.0, 2.0, 3.0, 4.0])])
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    x = np.asarray(h.getSolution().col_value)
    nz = np.nonzero(np.abs(x) > 1e-6)[0]
    assert len(nz) <= 2
    if len(nz) == 2:
        assert nz[1] == nz[0] + 1
    # best adjacent pair: (x2, x4)? weights order 1,2,3,4 -> members
    # adjacent in index; best = x_1(index1,cost-2)+neighbor: -3
    assert abs(h.getObjectiveValue() - (-3.0)) < 1e-6


def test_sos_mps_read(instances_dir):
    from highs_tpu.io.mps import read_mps
    lp = read_mps(instance_path("80bau3b.mps")).lp
    # 80bau3b carries SOS sections in the reference instance set
    assert isinstance(lp.sos, list)


def test_mip_restart_on_heavy_fixing():
    """mip_allow_restart: when the root fixes a large share of integer
    variables, the solver restarts on the tightened model (reference
    restart-on-inactive-columns) — same answer either way."""
    import scipy.sparse as sp
    from highs_tpu.models.lp import HighsSparseMatrix
    # x_i binary; constraints force x_i = 0 for most i via singleton
    # rows; objective rewards all
    n = 10
    a = sp.identity(n, format="csc")
    lp = HighsLp(
        num_col=n, num_row=n,
        col_cost=np.full(n, -1.0),
        col_lower=np.zeros(n), col_upper=np.ones(n),
        row_lower=np.full(n, -np.inf),
        row_upper=np.concatenate([np.zeros(n - 2), [1.5, 1.5]]),
        a_matrix=HighsSparseMatrix.from_scipy(a),
        integrality=np.ones(n, dtype=np.uint8))
    objs = {}
    for flag in (True, False):
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("mip_allow_restart", flag)
        h.setOptionValue("presolve", "off")
        h.passModel(lp)
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        objs[flag] = h.getObjectiveValue()
    assert abs(objs[True] - (-2.0)) < 1e-6
    assert abs(objs[True] - objs[False]) < 1e-9


def test_native_conflict_pool_derives_clauses(instances_dir):
    """Propagation-based conflict analysis (native hx_mip_solve,
    reference HighsDomain reason stack + HighsConflictPool): the
    search derives no-good clauses on lseu and the answer stays
    exact with the pool on and off."""
    import os
    import subprocess
    import sys

    script = (
        "from highs_tpu.highs import Highs\n"
        "h = Highs()\n"
        "h.readModel(r'%s')\n"
        "h.setOptionValue('output_flag', False)\n"
        "h.run()\n"
        "print('OBJ', h.getInfo().objective_function_value)\n"
        % str(instances_dir / "lseu.mps"))
    env = dict(os.environ, HX_NATIVE_DEBUG="1")
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "OBJ 1120.0" in out.stdout
    import re
    counts = [int(mm) for mm in re.findall(r"conflicts=(\d+)",
                                           out.stderr)]
    assert counts and max(counts) > 0, out.stderr[-500:]
    env2 = dict(os.environ, HX_NO_CONFLICTS="1")
    out2 = subprocess.run([sys.executable, "-c", script], env=env2,
                          capture_output=True, text=True, timeout=300)
    assert "OBJ 1120.0" in out2.stdout
