"""Symmetry detection tests (reference: HighsSymmetry.cpp generators/
orbits; check/TestPresolve.cpp symmetry usage is internal, so these test
the detector directly plus MIP end-to-end with symmetry on/off)."""
import numpy as np
import scipy.sparse as sp

from highs_tpu import Highs, HighsLp, HighsModelStatus
from highs_tpu.models.lp import HighsSparseMatrix
from highs_tpu.presolve.symmetry import (detect_symmetry, orbits,
                                         symmetry_breaking_rows)


def _identical_items_knapsack(k=4):
    # max sum x_i, sum 2 x_i <= 2k-1, x binary: all items identical
    a = sp.csc_matrix(np.full((1, k), 2.0))
    return HighsLp(
        num_col=k, num_row=1,
        col_cost=np.full(k, -1.0),
        col_lower=np.zeros(k), col_upper=np.ones(k),
        row_lower=np.array([-np.inf]),
        row_upper=np.array([2.0 * k - 1.0]),
        a_matrix=HighsSparseMatrix.from_scipy(a),
        integrality=np.ones(k, dtype=np.uint8))


def test_detects_identical_columns():
    lp = _identical_items_knapsack(4)
    gens = detect_symmetry(lp)
    assert gens, "identical columns must yield generators"
    orb = orbits(gens, lp.num_col)
    # all four columns in one orbit
    assert len(np.unique(orb)) < 4


def test_generators_are_verified_automorphisms():
    lp = _identical_items_knapsack(3)
    for g in detect_symmetry(lp):
        # cost/bounds invariance
        assert np.allclose(lp.col_cost, lp.col_cost[g])
        assert not np.array_equal(g, np.arange(lp.num_col))


def test_no_symmetry_in_asymmetric_model():
    a = sp.csc_matrix(np.array([[1.0, 2.0, 3.0]]))
    lp = HighsLp(
        num_col=3, num_row=1,
        col_cost=np.array([1.0, 2.0, 3.0]),
        col_lower=np.zeros(3), col_upper=np.ones(3),
        row_lower=np.array([-np.inf]), row_upper=np.array([2.0]),
        a_matrix=HighsSparseMatrix.from_scipy(a),
        integrality=np.ones(3, dtype=np.uint8))
    assert detect_symmetry(lp) == []


def test_symmetry_breaking_rows_shape():
    lp = _identical_items_knapsack(4)
    gens = detect_symmetry(lp)
    pairs = symmetry_breaking_rows(gens, lp.num_col)
    for j, k in pairs:
        assert j != k and 0 <= j < 4 and 0 <= k < 4


def test_mip_same_answer_with_symmetry_on_off():
    lp = _identical_items_knapsack(5)
    objs = {}
    for flag in (True, False):
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("mip_detect_symmetry", flag)
        h.setOptionValue("time_limit", 60.0)
        h.passModel(lp)
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        objs[flag] = h.getObjectiveValue()
    # optimum: floor((2k-1)/2) = k-1 items -> obj -(k-1) = -4
    assert abs(objs[True] - (-4.0)) < 1e-6
    assert abs(objs[True] - objs[False]) < 1e-6


def test_mip_symmetric_assignment():
    """2 identical machines, 3 jobs: assignment symmetry over machines;
    answer must match with and without symmetry handling."""
    # x[j,m] binary; each job on exactly one machine; machine load <= 2
    n = 6
    rows = []
    data = []
    # job constraints: x[j,0] + x[j,1] == 1
    a = np.zeros((5, n))
    for j in range(3):
        a[j, 2 * j] = 1.0
        a[j, 2 * j + 1] = 1.0
    # machine loads: sum_j x[j,m] <= 2
    for m in range(2):
        for j in range(3):
            a[3 + m, 2 * j + m] = 1.0
    lp = HighsLp(
        num_col=n, num_row=5,
        col_cost=np.array([1.0, 1.0, 2.0, 2.0, 3.0, 3.0]),
        col_lower=np.zeros(n), col_upper=np.ones(n),
        row_lower=np.array([1.0, 1.0, 1.0, -np.inf, -np.inf]),
        row_upper=np.array([1.0, 1.0, 1.0, 2.0, 2.0]),
        a_matrix=HighsSparseMatrix.from_scipy(sp.csc_matrix(a)),
        integrality=np.ones(n, dtype=np.uint8))
    objs = {}
    for flag in (True, False):
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("mip_detect_symmetry", flag)
        h.passModel(lp)
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        objs[flag] = h.getObjectiveValue()
    assert abs(objs[True] - objs[False]) < 1e-6
    assert abs(objs[True] - 6.0) < 1e-6  # every job placed once


def test_orbital_branching_reduces_nodes():
    """In-tree orbital branching (native search; reference
    HighsSymmetry.h:58-126 stabilizer orbital fixing): on an
    identical-machines assignment MIP the down branch fixes the whole
    node-stabilizer orbit to zero, shrinking the tree while keeping
    the exact optimum."""
    import os
    import numpy as np
    import scipy.sparse as sp
    from highs_tpu.highs import Highs
    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix

    def build():
        rng = np.random.default_rng(3)
        J, M = 12, 5
        w = rng.integers(3, 10, J).astype(float)
        ncol = J * M + 1
        rows, cols, vals, rl, ru = [], [], [], [], []
        r = 0
        for j in range(J):
            for m_ in range(M):
                rows.append(r)
                cols.append(j * M + m_)
                vals.append(1.0)
            rl.append(1.0)
            ru.append(1.0)
            r += 1
        for m_ in range(M):
            for j in range(J):
                rows.append(r)
                cols.append(j * M + m_)
                vals.append(w[j])
            rows.append(r)
            cols.append(J * M)
            vals.append(-1.0)
            rl.append(-np.inf)
            ru.append(0.0)
            r += 1
        A = sp.csc_matrix((vals, (rows, cols)), shape=(r, ncol))
        cost = np.zeros(ncol)
        cost[J * M] = 1.0
        integ = np.ones(ncol, dtype=np.uint8)
        integ[J * M] = 0
        up = np.ones(ncol)
        up[J * M] = float(w.sum())
        lp = HighsLp(num_col=ncol, num_row=r, col_cost=cost,
                     col_lower=np.zeros(ncol), col_upper=up,
                     row_lower=np.array(rl), row_upper=np.array(ru),
                     a_matrix=HighsSparseMatrix.from_scipy(A), sense=1,
                     integrality=integ)
        h = Highs()
        h._model.lp = lp
        h.setOptionValue("output_flag", False)
        h.setOptionValue("presolve", "off")
        h.setOptionValue("mip_rel_gap", 0.0)
        # node-count comparison needs a deterministic tree: the
        # racing search worker (threads != 1) perturbs trajectories
        h.setOptionValue("threads", 1)
        return h

    results = {}
    # isolate ORBITAL BRANCHING: the native root separation stack is
    # its own (trajectory-chaotic) variable — hold it fixed off so the
    # on/off node comparison measures the symmetry machinery alone
    os.environ["HX_NO_NATIVE_ROOT"] = "1"
    for label, env in [("on", None), ("off", "1")]:
        if env:
            os.environ["HX_NO_SYM"] = env
        else:
            os.environ.pop("HX_NO_SYM", None)
        try:
            h = build()
            h.run()
            results[label] = (h.getInfo().objective_function_value,
                              h.getInfo().mip_node_count)
        finally:
            os.environ.pop("HX_NO_SYM", None)
    os.environ.pop("HX_NO_NATIVE_ROOT", None)
    assert abs(results["on"][0] - 13.0) < 1e-6
    assert abs(results["off"][0] - 13.0) < 1e-6
    assert results["on"][1] < results["off"][1]


def test_packing_orbitope_detection_and_fixing():
    """detect_packing_orbitopes finds the machine-column orbitope of an
    assignment model from clean transposition generators, and the
    staircase fixing keeps the exact optimum reachable."""
    import numpy as np
    import scipy.sparse as sp

    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix
    from highs_tpu.presolve.symmetry import (detect_packing_orbitopes,
                                             orbitope_fixings)

    J, M = 4, 3
    ncol = J * M
    rows, cols, vals = [], [], []
    for j in range(J):
        for m_ in range(M):
            rows.append(j)
            cols.append(j * M + m_)
            vals.append(1.0)
    a = sp.csc_matrix((vals, (rows, cols)), shape=(J, ncol))
    lp = HighsLp(
        num_col=ncol, num_row=J, col_cost=np.zeros(ncol),
        col_lower=np.zeros(ncol), col_upper=np.ones(ncol),
        row_lower=np.ones(J), row_upper=np.ones(J),
        a_matrix=HighsSparseMatrix.from_scipy(a), sense=1,
        integrality=np.ones(ncol, dtype=np.uint8))
    g1 = np.arange(ncol)
    g2 = np.arange(ncol)
    for j in range(J):
        g1[j * M + 0], g1[j * M + 1] = j * M + 1, j * M + 0
        g2[j * M + 1], g2[j * M + 2] = j * M + 2, j * M + 1
    orbs = detect_packing_orbitopes(lp, [g1, g2])
    assert [o.shape for o in orbs] == [(J, M)]
    fix = orbitope_fixings(orbs, ncol)
    # staircase: row 0 loses cols 1,2; row 1 loses col 2
    grid = orbs[0]
    expect = {int(grid[0, 1]), int(grid[0, 2]), int(grid[1, 2])}
    assert set(fix) == expect


def test_orbitope_fixing_preserves_optimum():
    """Full MIP solve on the identical-machines model with orbitope
    fixings active keeps the exact optimum."""
    import numpy as np
    import scipy.sparse as sp

    from highs_tpu.highs import Highs
    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix

    rng = np.random.default_rng(3)
    J, M = 10, 4
    w = rng.integers(3, 10, J).astype(float)
    ncol = J * M + 1
    rows, cols, vals, rl, ru = [], [], [], [], []
    r = 0
    for j in range(J):
        for m_ in range(M):
            rows.append(r)
            cols.append(j * M + m_)
            vals.append(1.0)
        rl.append(1.0)
        ru.append(1.0)
        r += 1
    for m_ in range(M):
        for j in range(J):
            rows.append(r)
            cols.append(j * M + m_)
            vals.append(w[j])
        rows.append(r)
        cols.append(J * M)
        vals.append(-1.0)
        rl.append(-np.inf)
        ru.append(0.0)
        r += 1
    a = sp.csc_matrix((vals, (rows, cols)), shape=(r, ncol))
    cost = np.zeros(ncol)
    cost[J * M] = 1.0
    integ = np.ones(ncol, dtype=np.uint8)
    integ[J * M] = 0
    up = np.ones(ncol)
    up[J * M] = float(w.sum())
    lp = HighsLp(num_col=ncol, num_row=r, col_cost=cost,
                 col_lower=np.zeros(ncol), col_upper=up,
                 row_lower=np.array(rl), row_upper=np.array(ru),
                 a_matrix=HighsSparseMatrix.from_scipy(a), sense=1,
                 integrality=integ)
    h = Highs()
    h._model.lp = lp
    h.setOptionValue("output_flag", False)
    h.setOptionValue("mip_rel_gap", 0.0)
    h.run()
    # reference optimum computed without symmetry handling
    import os
    os.environ["HX_NO_SYM"] = "1"
    try:
        h2 = Highs()
        h2._model.lp = lp
        h2.setOptionValue("output_flag", False)
        h2.setOptionValue("mip_rel_gap", 0.0)
        h2.run()
    finally:
        os.environ.pop("HX_NO_SYM", None)
    assert abs(h.getInfo().objective_function_value -
               h2.getInfo().objective_function_value) < 1e-6


def test_symmetric_mip_python_search_with_cut_aging():
    # Regression: symmetry-breaking rows are added to the relaxation
    # WITHOUT incrementing num_cut_rows, so the root cut-aging code
    # must measure the permanent prefix from the actual row count.
    # With tpu_mip_native_search=False this previously crashed in
    # round-1 aging with a broadcast ValueError (advisor r4, high).
    lp = _identical_items_knapsack(6)
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("tpu_mip_native_search", False)
    h.passModel(lp)
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    # objective: 2k-1 = 11 capacity / 2 per item -> 5 items, obj -5
    assert abs(h.getInfo().objective_function_value - (-5.0)) < 1e-6
