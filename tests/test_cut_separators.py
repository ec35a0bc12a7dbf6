"""Tests for the aggregation-based separators and the native B&B.

Covers the components added for fixed-charge-network parity:
tableau-aggregation c-MIR (reference HighsTableauSeparator), exact
min-cut cut-set separation, probing cover cliques (reference
ObjectivePropagation's partition), Ruiz-equilibrated simplex, and the
native branch-and-bound dive loop (hx_bb_solve).
"""
import numpy as np
import pytest
import scipy.sparse as sp

from highs_tpu.solvers.simplex.native import (
    RESULT_OPTIMAL, _ruiz_scales, bb_solve, simplex_solve)


def _fixed_charge_network():
    """Tiny fixed-charge flow: supply node S (row 3, supply -15) with
    two parallel arcs to each of 3 demand nodes (rows 0..2, demands
    4, 5, 6); arcs have vub x_a <= 10 y_a, min sum y."""
    m_eq = 4
    n_arcs = 6
    rows, cols, vals = [], [], []
    for node in range(3):
        for k in range(2):
            a = 2 * node + k
            rows.append(node)      # +1 in the head (demand) row
            cols.append(a)
            vals.append(1.0)
            rows.append(3)         # -1 in the tail (supply) row
            cols.append(a)
            vals.append(-1.0)
    a_eq = sp.csr_matrix((vals, (rows, cols)), shape=(m_eq, 2 * n_arcs))
    # vub rows x_a - 10 y_a <= 0 (y columns 6..11)
    vr, vc, vv = [], [], []
    for a in range(n_arcs):
        vr += [a, a]
        vc += [a, n_arcs + a]
        vv += [1.0, -10.0]
    a_vub = sp.csr_matrix((vv, (vr, vc)), shape=(n_arcs, 2 * n_arcs))
    a_all = sp.vstack([a_eq, a_vub]).tocsr()
    d = np.array([4.0, 5.0, 6.0, -15.0])
    row_lower = np.concatenate([d, np.full(n_arcs, -np.inf)])
    row_upper = np.concatenate([d, np.zeros(n_arcs)])
    lo = np.zeros(2 * n_arcs)
    up = np.concatenate([np.full(n_arcs, np.inf), np.ones(n_arcs)])
    cost = np.concatenate([np.zeros(n_arcs), np.ones(n_arcs)])
    is_int = np.concatenate([np.zeros(n_arcs, bool),
                             np.ones(n_arcs, bool)])
    return a_all, row_lower, row_upper, lo, up, cost, is_int


def test_network_cutset_separator_lifts_lp():
    from highs_tpu.solvers.mip.cuts import separate_network_cutset
    a, rl, ru, lo, up, cost, is_int = _fixed_charge_network()
    a_csc = a.tocsc()
    res, x, y, z, b, it = simplex_solve(a_csc, cost, lo, up, rl, ru,
                                        tol_p=1e-9, tol_d=1e-9)
    assert res == RESULT_OPTIMAL
    base = float(cost @ x)          # LP: y = d/10 per arc -> 1.5
    cuts = separate_network_cutset(a, rl, ru, lo, up, x, is_int)
    assert cuts, "cut-set separator found nothing on a pure network"
    # add the cuts, re-solve: the bound must improve toward 3
    rows = [sp.csr_matrix((c.vals, (np.zeros(len(c.cols)), c.cols)),
                          shape=(1, a.shape[1])) for c in cuts]
    a2 = sp.vstack([a] + rows).tocsc()
    rl2 = np.concatenate([rl, np.full(len(cuts), -np.inf)])
    ru2 = np.concatenate([ru, [c.rhs for c in cuts]])
    res2, x2, *_ = simplex_solve(a2, cost, lo, up, rl2, ru2,
                                 tol_p=1e-9, tol_d=1e-9)
    assert res2 == RESULT_OPTIMAL
    assert float(cost @ x2) > base + 0.4


def test_tableau_mir_cuts_are_valid():
    from highs_tpu.solvers.mip.cuts import separate_tableau_mir
    a, rl, ru, lo, up, cost, is_int = _fixed_charge_network()
    a_csc = a.tocsc()
    res, x, y, z, basis, it = simplex_solve(a_csc, cost, lo, up, rl,
                                            ru, tol_p=1e-9, tol_d=1e-9)
    assert res == RESULT_OPTIMAL
    cuts = separate_tableau_mir(a_csc, lo, up, rl, ru, basis, x,
                                is_int)
    # validity: the integer optimum y = (1,0,1,0,1,0) x = (4,0,5,0,6,0)
    x_int = np.array([4, 0, 5, 0, 6, 0, 1, 0, 1, 0, 1, 0], float)
    for c in cuts:
        assert float(x_int[c.cols] @ c.vals) <= c.rhs + 1e-6


def test_cover_clique_rows_from_probing():
    from highs_tpu.solvers.mip.implications import Implications
    from highs_tpu.solvers.mip.propagate import Propagator
    # y0 + y1 >= 1 enforced through x0 + x1 = 1, x_i <= y_i
    a = sp.csr_matrix(np.array([
        [1.0, 1.0, 0.0, 0.0],
        [1.0, 0.0, -1.0, 0.0],
        [0.0, 1.0, 0.0, -1.0],
    ]))
    rl = np.array([1.0, -np.inf, -np.inf])
    ru = np.array([1.0, 0.0, 0.0])
    lo = np.zeros(4)
    up = np.array([1.0, 1.0, 1.0, 1.0])
    is_int = np.array([False, False, True, True])
    prop = Propagator(a, rl, ru, is_int)
    imp = Implications(prop)
    imp.probe([2, 3], lo, up, max_probes=2)
    binary = is_int.copy()
    rows = imp.cover_clique_rows(lo, up, binary, np.ones(4))
    assert rows, "probing found no cover clique"
    r = rows[0]
    # -y2 - y3 <= -1  <=>  y2 + y3 >= 1
    assert set(r.cols.tolist()) == {2, 3}
    assert r.rhs == pytest.approx(-1.0)


def test_ruiz_equilibrated_solve_matches_unscaled():
    rng = np.random.default_rng(5)
    m, n = 30, 40
    a = sp.random(m, n, density=0.3, random_state=7, format="csc")
    a.data = a.data * 1e4 + 1.0  # badly scaled
    cost = rng.normal(size=n)
    lo = np.zeros(n)
    up = np.full(n, 10.0)
    rl = np.full(m, -np.inf)
    ru = a @ (np.ones(n) * 2.0)   # feasible by construction
    r0 = simplex_solve(a, cost, lo, up, rl, ru, tol_p=1e-9, tol_d=1e-9)
    r1 = simplex_solve(a, cost, lo, up, rl, ru, tol_p=1e-9, tol_d=1e-9,
                       equilibrate=True)
    assert r0[0] == RESULT_OPTIMAL and r1[0] == RESULT_OPTIMAL
    assert float(cost @ r0[1]) == pytest.approx(float(cost @ r1[1]),
                                                rel=1e-7, abs=1e-7)
    sc = _ruiz_scales(a)
    assert sc is not None
    r, c = sc
    # power-of-two factors: exact in binary floating point
    assert np.all(np.exp2(np.round(np.log2(r))) == r)


def test_native_bb_solves_small_mip():
    a, rl, ru, lo, up, cost, is_int = _fixed_charge_network()
    a_csc = a.tocsc()
    st, found, x, obj, dual, nodes, iters = bb_solve(
        a_csc, a_csc.tocsr(), cost, lo, up, rl, ru, is_int, None,
        np.inf, 1.0, 0.0, 0.0, 0.0, -np.inf, time_limit=30.0)
    assert st == 0 and found
    assert obj == pytest.approx(3.0)
    assert dual == pytest.approx(3.0)
    y = x[6:]
    assert np.all(np.abs(y - np.round(y)) < 1e-9)


def test_native_bb_infeasible():
    # x0 + x1 = 3 with binaries and x <= 1 each: infeasible
    a = sp.csc_matrix(np.array([[1.0, 1.0]]))
    rl = np.array([3.0])
    ru = np.array([3.0])
    lo = np.zeros(2)
    up = np.ones(2)
    is_int = np.ones(2, bool)
    st, found, x, obj, dual, nodes, iters = bb_solve(
        a, a.tocsr(), np.ones(2), lo, up, rl, ru, is_int, None,
        np.inf, 1.0, 0.0, 0.0, 0.0, -np.inf, time_limit=10.0)
    assert st == 0 and not found


def test_native_search_option_end_to_end(instances_dir):
    from highs_tpu.highs import Highs
    h = Highs()
    h.readModel(str(instances_dir / "egout.mps"))
    h.setOptionValue("output_flag", False)
    h.setOptionValue("tpu_mip_native_search", True)
    h.setOptionValue("time_limit", 60.0)
    h.run()
    assert h.getInfo().objective_function_value == pytest.approx(
        568.1007, abs=1e-4)


def test_path_mixing_cuts_valid_and_violated(instances_dir):
    """Path mixing cuts (reference HighsPathSeparator.cpp:395-545):
    generated cuts are violated at the fractional LP optimum and valid
    at the known integer optimum of sp150x300d."""
    import numpy as np
    from highs_tpu.io.mps import read_mps
    from highs_tpu.solvers.simplex.native import simplex_solve
    from highs_tpu.solvers.mip.cuts import separate_path_mixing

    model = read_mps(str(instances_dir / "sp150x300d.mps"))
    lp = model.lp if hasattr(model, "lp") else model
    A = lp.a_matrix.to_scipy().tocsr()
    is_int = np.asarray(lp.integrality) == 1
    lo = np.asarray(lp.col_lower, float)
    up = np.asarray(lp.col_upper, float)
    rl = np.asarray(lp.row_lower, float)
    ru = np.asarray(lp.row_upper, float)
    cost = np.asarray(lp.col_cost, float)
    res, x, y, z, bas, it = simplex_solve(
        A.tocsc(), cost, lo, up, rl, ru, tol_p=1e-9, tol_d=1e-9,
        max_iter=100000)
    cuts = separate_path_mixing(A, rl, ru, lo, up, x, is_int, 1e-6,
                                time_budget=5.0)
    assert len(cuts) >= 5  # the fixed-charge structure separates
    # known optimum (objective 69): solve the MIP quickly
    from highs_tpu.highs import Highs
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("time_limit", 60.0)
    h.readModel(str(instances_dir / "sp150x300d.mps"))
    h.run()
    xo = np.asarray(h.getSolution().col_value)
    for c in cuts:
        assert float(xo[c.cols] @ c.vals) <= c.rhs + 1e-6
        viol = float(x[c.cols] @ c.vals) - c.rhs
        assert viol > 0  # separates the LP point
