"""Cut generation tests (reference model: HighsCutPool /
HighsCutGeneration / HighsTableauSeparator behavior)."""
import numpy as np
import pytest
import scipy.sparse as sp

from highs_tpu.models.lp import HighsLp
from highs_tpu.options import HighsOptions
from highs_tpu.constants import HighsModelStatus, HighsVarType
from highs_tpu.solvers.mip.cuts import (CliqueTable, Cut, CutPool,
                                        separate_gomory, separate_mir)
from highs_tpu.solvers.mip.solver import solve_mip


from highs_tpu.models.lp import HighsSparseMatrix


def _ip(c, a, rl, ru, lo, up):
    n = len(c)
    return HighsLp(
        num_col=n, num_row=a.shape[0],
        col_cost=np.asarray(c, dtype=float),
        col_lower=np.asarray(lo, dtype=float),
        col_upper=np.asarray(up, dtype=float),
        row_lower=np.asarray(rl, dtype=float),
        row_upper=np.asarray(ru, dtype=float),
        a_matrix=HighsSparseMatrix.from_scipy(sp.csc_matrix(a)),
        integrality=np.full(n, int(HighsVarType.kInteger),
                            dtype=np.uint8))


def test_cut_pool_dedupe_and_eviction():
    pool = CutPool(4, age_limit=1, soft_limit=10)
    c1 = Cut(np.array([0, 1], dtype=np.int32), np.array([1.0, 1.0]), 1.0)
    c2 = Cut(np.array([0, 1], dtype=np.int32), np.array([1.0, 1.0]), 1.0)
    assert pool.add(c1)
    assert not pool.add(c2)  # duplicate
    pool.age_and_evict()     # age 1 -> kept
    assert len(pool.cuts) == 1
    pool.age_and_evict()     # age 2 > limit -> evicted
    assert len(pool.cuts) == 0


def test_pool_violated_selection():
    pool = CutPool(3)
    pool.add(Cut(np.array([0], dtype=np.int32), np.array([1.0]), 0.5))
    pool.add(Cut(np.array([1], dtype=np.int32), np.array([1.0]), 2.0))
    x = np.array([1.0, 1.0, 0.0])
    viol = pool.violated(x)
    assert len(viol) == 1
    assert viol[0].cols[0] == 0


def test_mir_separates_simple_knapsack():
    # 2x1 + 2x2 <= 3, x binary: MIR (delta=2) gives x1 + x2 <= 1
    a = sp.csr_matrix(np.array([[2.0, 2.0]]))
    x = np.array([0.75, 0.75])  # LP point violating x1+x2<=1
    cuts = separate_mir(a, np.array([-np.inf]), np.array([3.0]),
                        np.zeros(2), np.ones(2), x,
                        np.array([True, True]))
    assert cuts, "expected a MIR cut"
    best = max(cuts, key=lambda c: c.efficacy)
    # cut must cut off the LP point but keep (1,0),(0,1),(0,0)
    for pt, feas in [((0.75, 0.75), False), ((1, 0), True),
                     ((0, 1), True), ((0, 0), True)]:
        v = sum(best.vals[i] * pt[best.cols[i]]
                for i in range(len(best.cols)))
        if feas:
            assert v <= best.rhs + 1e-9
        else:
            assert v > best.rhs + 1e-9


def test_gomory_cuts_off_fractional_vertex():
    # max x1 + x2  s.t. 3x1 + 2x2 <= 6, x2 <= 1.5 (vertex (1, 1.5));
    # integer x -> optimal integer obj 2
    from highs_tpu.solvers.simplex.native import simplex_solve
    a = sp.csc_matrix(np.array([[3.0, 2.0], [0.0, 1.0]]))
    lo = np.zeros(2)
    up = np.full(2, 10.0)
    rl = np.full(2, -np.inf)
    ru = np.array([6.0, 1.5])
    c = np.array([-1.0, -1.0])
    res, x, y, z, basis, iters = simplex_solve(a, c, lo, up, rl, ru)
    assert res == 0
    cuts = separate_gomory(a, lo, up, rl, ru, basis, x,
                           np.array([True, True]))
    # integer points satisfying the original rows must satisfy the cut
    for cut in cuts:
        for x1 in range(0, 3):
            for x2 in range(0, 2):
                if 3 * x1 + 2 * x2 <= 6 and x2 <= 1.5:
                    pt = np.array([x1, x2], dtype=float)
                    v = float(pt[cut.cols] @ cut.vals)
                    assert v <= cut.rhs + 1e-7, (cut, x1, x2)


def test_clique_extraction_and_separation():
    # x1 + x2 + x3 <= 1 is a clique among binaries
    a = sp.csr_matrix(np.array([[1.0, 1.0, 1.0]]))
    table = CliqueTable(a, np.array([-np.inf]), np.array([1.0]),
                        np.zeros(3), np.ones(3),
                        np.array([True] * 3))
    assert len(table.cliques) == 1
    cuts = table.separate(np.array([0.5, 0.5, 0.5]))
    assert cuts and cuts[0].rhs == 1.0


def test_mip_with_cuts_still_correct():
    # max 5x1+4x2 s.t. 6x1+4x2<=24, x1+2x2<=6, x integer >=0:
    # optimum x=(4,0) with objective 20
    a = np.array([[6.0, 4.0], [1.0, 2.0]])
    lp = _ip([-5.0, -4.0], a, [-np.inf, -np.inf], [24.0, 6.0],
             [0, 0], [10, 10])
    st, sol, info = solve_mip(lp, HighsOptions())
    assert st == HighsModelStatus.kOptimal
    assert info.primal_obj == pytest.approx(-20.0, abs=1e-6)


def test_path_mir_aggregation():
    """Path-aggregation c-MIR (reference HighsPathSeparator): aggregate
    two rows along a degree-2 continuous variable, then MIR.

    Rows:  2x1 + 3x2 + y <= 7.5   and   y >= 1.2 (as -y <= -1.2),
    x integer, y continuous (deg 2).  Aggregate eliminates y:
    2x1 + 3x2 <= 6.3 -> MIR cut exists at fractional x*."""
    import scipy.sparse as sp
    import numpy as np
    from highs_tpu.solvers.mip.cuts import separate_path_mir

    a = sp.csr_matrix(np.array([
        [2.0, 3.0, 1.0],
        [0.0, 0.0, 1.0]]))
    row_lower = np.array([-np.inf, 1.2])
    row_upper = np.array([7.5, np.inf])
    lo = np.zeros(3)
    up = np.array([10.0, 10.0, 10.0])
    is_int = np.array([True, True, False])
    # fractional LP point on the aggregated face
    x = np.array([1.65, 1.0, 1.2])
    cuts = separate_path_mir(a, row_lower, row_upper, lo, up, x, is_int)
    assert cuts, "aggregation must produce at least one cut"
    # every returned cut must be valid for the integer points of the box
    # satisfying the rows: brute-force check
    for c in cuts:
        for x1 in range(0, 4):
            for x2 in range(0, 3):
                y = 1.2
                if 2 * x1 + 3 * x2 + y <= 7.5 + 1e-9:
                    dense = np.zeros(3)
                    dense[c.cols] = c.vals
                    assert dense @ np.array([x1, x2, y]) <= c.rhs + 1e-6


def test_modk_odd_cycle_cut():
    """Mod-2 cut on the triangle matching LP: rows x_i + x_j <= 1 admit
    the aggregated {0,1/2}-cut x1+x2+x3 <= 1 at the fractional vertex
    (1/2,1/2,1/2) (reference HighsModkSeparator)."""
    from highs_tpu.solvers.mip.cuts import separate_modk
    a = sp.csr_matrix(np.array(
        [[1.0, 1.0, 0.0],
         [0.0, 1.0, 1.0],
         [1.0, 0.0, 1.0]]))
    row_lower = np.full(3, -np.inf)
    row_upper = np.ones(3)
    lo = np.zeros(3)
    up = np.ones(3)
    is_int = np.ones(3, dtype=bool)
    x = np.full(3, 0.5)
    cuts = separate_modk(a, row_lower, row_upper, lo, up, x, is_int)
    assert cuts
    found = False
    for c in cuts:
        dense = np.zeros(3)
        dense[c.cols] = c.vals
        # validity on all feasible binary points
        for bits in range(8):
            y = np.array([(bits >> k) & 1 for k in range(3)], dtype=float)
            if (a @ y <= row_upper + 1e-9).all():
                assert dense @ y <= c.rhs + 1e-6
        if np.allclose(dense, [1, 1, 1]) and abs(c.rhs - 1.0) < 1e-9:
            found = True
    assert found, "the odd-cycle cut x1+x2+x3<=1 must be separated"


def test_modk_solver_integration():
    """MIP on the 5-cycle matching problem solves to optimality with
    mod-k separation enabled in the root loop."""
    from highs_tpu import Highs, HighsModelStatus
    h = Highs()
    h.setOptionValue("output_flag", False)
    n = 5
    edges = [(i, (i + 1) % n) for i in range(n)]
    h.addVars(n, np.zeros(n), np.ones(n))
    for j in range(n):
        h.changeColIntegrality(j, 1)
        h.changeColCost(j, -1.0)
    for (i, j) in edges:
        h.addRow(-np.inf, 1.0, 2, np.array([i, j]), np.array([1.0, 1.0]))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-2.0)) < 1e-6


def test_implications_probing_and_implied_bound_cut():
    """Probing an integrality-rounded implication chain (y=1 -> x1>=2.5
    -> x1>=3 -> x2<=5) yields the implied-bound cut x2 <= 8 - 3y
    (reference HighsImplications + implied-bound separation)."""
    from highs_tpu.solvers.mip.implications import Implications
    from highs_tpu.solvers.mip.propagate import Propagator
    # cols: y (binary), x1 (integer in [0,8]), x2 (continuous in [0,8])
    a = sp.csr_matrix(np.array(
        [[-2.5, 1.0, 0.0],    # x1 - 2.5 y >= 0
         [0.0, 1.0, 1.0]]))   # x1 + x2 <= 8
    row_lower = np.array([0.0, -np.inf])
    row_upper = np.array([np.inf, 8.0])
    is_int = np.array([True, True, False])
    prop = Propagator(a, row_lower, row_upper, is_int)
    impl = Implications(prop)
    lo = np.zeros(3)
    up = np.array([1.0, 8.0, 8.0])
    lo2, up2 = impl.probe([0], lo, up)
    assert not impl.infeasible
    assert 0 in impl.store
    lo0, up0, lo1, up1 = impl.store[0]
    assert lo1[1] >= 3.0 - 1e-5        # x1 >= 3 when y=1
    assert up1[2] <= 5.0 + 1e-5        # x2 <= 5 when y=1 (feastol pad)
    x = np.array([0.5, 1.25, 6.75])    # LP-feasible, cut-violated
    cuts = impl.separate(x, lo2, up2)
    assert cuts
    ok = False
    for c in cuts:
        dense = np.zeros(3)
        dense[c.cols] = c.vals
        # validity at the integer corners
        for y in (0.0, 1.0):
            for x1 in range(0, 9):
                if x1 < 2.5 * y:
                    continue
                x2max = 8.0 - x1
                pt = np.array([y, x1, x2max])
                assert dense @ pt <= c.rhs + 1e-6
        if dense @ x > c.rhs + 1e-6:
            ok = True
    assert ok, "at least one cut must be violated at the LP point"


def test_modk_ge_row_rhs_not_double_negated():
    """Regression: the >=-side trial passes -row_lower as the <=-form
    rhs already; multiplying by the sense again shifted candidate rows
    by -2*row_lower and produced invalid congruence cuts (observed on
    sp150x300d).  Every mod-k cut must hold at integer-feasible
    points."""
    import itertools
    from highs_tpu.solvers.mip.cuts import separate_modk
    # x1 - y = -50-ish structure with a >= row: x1 + 2*x2 >= 3
    a = sp.csr_matrix(np.array([
        [1.0, 2.0, 0.0],
        [1.0, -1.0, 1.0]]))
    row_lower = np.array([3.0, -np.inf])
    row_upper = np.array([np.inf, 4.0])
    lo = np.zeros(3)
    up = np.array([5.0, 5.0, 5.0])
    is_int = np.array([True, True, True])
    x = np.array([1.5, 0.75, 2.0])   # fractional point, row 1 tight
    cuts = separate_modk(a, row_lower, row_upper, lo, up, x, is_int)
    for c in cuts:
        dense = np.zeros(3)
        dense[c.cols] = c.vals
        for pt in itertools.product(range(6), repeat=3):
            p = np.array(pt, dtype=float)
            if p[0] + 2 * p[1] >= 3 - 1e-9 and \
                    p[0] - p[1] + p[2] <= 4 + 1e-9:
                assert dense @ p <= c.rhs + 1e-6, (c, pt)


def test_cmir_vub_substitution_fixed_charge():
    """c-MIR with variable-bound substitution (reference
    HighsTransformedLp): on the single-node fixed-charge set
      x1 + x2 <= b,  x_i <= u_i y_i,  y binary
    the flow-cover cut  x1 + x2 + (u1-lambda)(1-y1) + (u2-lambda)(1-y2)
    <= b  (lambda = u1+u2-b) is a c-MIR cut after substituting
    x_i = u_i y_i - s_i.  Plain bound substitution cannot separate the
    fractional point, VUB substitution must."""
    import itertools
    from highs_tpu.solvers.mip.cuts import separate_mir
    # cols: x1, x2, y1, y2
    u1, u2, b = 6.0, 5.0, 8.0
    a = sp.csr_matrix(np.array([
        [1.0, 1.0, 0.0, 0.0],
        [1.0, 0.0, -u1, 0.0],
        [0.0, 1.0, 0.0, -u2]]))
    row_lower = np.full(3, -np.inf)
    row_upper = np.array([b, 0.0, 0.0])
    lo = np.zeros(4)
    up = np.array([u1, u2, 1.0, 1.0])
    is_int = np.array([False, False, True, True])
    # fractional LP vertex: x1=6 (y1=1), x2=2, y2=2/5 (VUB tight)
    x = np.array([6.0, 2.0, 1.0, 0.4])
    cuts = separate_mir(a, row_lower, row_upper, lo, up, x, is_int)
    assert cuts, "VUB substitution must separate the flow point"
    # validity at every mixed-integer feasible point (x continuous grid)
    best_viol = 0.0
    for c in cuts:
        dense = np.zeros(4)
        dense[c.cols] = c.vals
        nrm = np.linalg.norm(c.vals)
        best_viol = max(best_viol, (dense @ x - c.rhs) / nrm)
        for y1, y2 in itertools.product((0, 1), repeat=2):
            for x1 in np.linspace(0, u1 * y1, 7):
                for x2 in np.linspace(0, u2 * y2, 6):
                    if x1 + x2 <= b + 1e-9:
                        p = np.array([x1, x2, y1, y2])
                        assert dense @ p <= c.rhs + 1e-6, (c, p)
    assert best_viol > 1e-3, "cut must actually cut off x*"


def test_clique_table_merging_and_extension():
    """CliqueTable merging absorbs dominated cliques; extension grows
    a violated clique by literals conflicting with every member
    (reference HighsCliqueTable merging/extension)."""
    import numpy as np
    import scipy.sparse as sp
    from highs_tpu.solvers.mip.cuts import CliqueTable

    # rows: {0,1,2} pairwise + the pair rows {0,3},{1,3},{2,3}:
    # extension should grow {0,1,2} to {0,1,2,3}; the pair cliques are
    # dominated by the triangle + extension
    rows = [
        [0, 1, 2],
        [0, 3],
        [1, 3],
        [2, 3],
        [0, 1],  # dominated by [0,1,2]
    ]
    data, ri, ci = [], [], []
    for r, cols in enumerate(rows):
        for c in cols:
            ri.append(r)
            ci.append(c)
            data.append(1.0)
    A = sp.csr_matrix((data, (ri, ci)), shape=(len(rows), 4))
    ru = np.ones(len(rows))
    rl = np.full(len(rows), -np.inf)
    lo = np.zeros(4)
    up = np.ones(4)
    is_int = np.ones(4, dtype=bool)
    tab = CliqueTable(A, rl, ru, lo, up, is_int)
    # merging dropped the dominated [0,1] row
    assert all(len(c) >= 2 for c, _ in tab.cliques)
    sizes = sorted(len(c) for c, _ in tab.cliques)
    assert [0, 1] not in [sorted(c.tolist()) for c, _ in tab.cliques]
    # fractional point violating the triangle: extension adds var 3
    x = np.array([0.45, 0.45, 0.45, 0.4])
    cuts = tab.separate(x)
    assert cuts
    best = max(cuts, key=lambda c: len(c.cols))
    assert set(best.cols.tolist()) == {0, 1, 2, 3}
    assert best.rhs == 1.0
