"""Native dual simplex engine (native/hdual.cpp) tests.

Reference parity: the dual simplex iteration structure of
highs/simplex/HEkkDual.cpp (CHUZR/BTRAN/PRICE/CHUZC with DSE + BFRT)
and the hot-start node-re-solve shape of highs/mip/HighsLpRelaxation.
Ground truth comes from the repo's independent primal engine and from
the reference ctest objectives (check/CMakeLists.txt).
"""
import numpy as np
import pytest
import scipy.sparse as sp

from highs_tpu.solvers.simplex import dual_native as dn
from highs_tpu.solvers.simplex.native import simplex_solve


def _random_lp(rng, boxed=True):
    m = int(rng.integers(3, 40))
    n = int(rng.integers(3, 60))
    a = sp.random(m, n, density=float(rng.uniform(0.15, 0.6)),
                  random_state=int(rng.integers(1e6)),
                  data_rvs=lambda k: rng.normal(0, 2, k)).tocsc()
    c = rng.normal(0, 1, n)
    lo = rng.uniform(-5, 0, n)
    up = lo + rng.uniform(0.5, 10, n)
    if not boxed:
        lo = np.where(rng.random(n) < 0.3, -np.inf, lo)
        up = np.where(rng.random(n) < 0.3, np.inf, up)
    rl = np.where(rng.random(m) < 0.5, rng.uniform(-10, 0, m), -np.inf)
    ru = np.where(rng.random(m) < 0.5, rng.uniform(0, 10, m), np.inf)
    return a, c, lo, up, rl, ru


def test_boxed_agrees_with_primal():
    rng = np.random.default_rng(7)
    for _ in range(40):
        a, c, lo, up, rl, ru = _random_lp(rng, boxed=True)
        r1, x1, *_ = simplex_solve(a, c, lo, up, rl, ru)
        r2, x2, y2, z2, b2, i2 = dn.dual_solve(
            a, a.tocsr(), c, lo, up, rl, ru)
        assert r1 == r2
        if r1 == dn.RESULT_OPTIMAL:
            o1, o2 = c @ x1, c @ x2
            assert abs(o1 - o2) <= 1e-6 * (1 + abs(o1))


def test_warm_restart_matches_cold_primal():
    """MIP node shape: optimal parent basis + tightened bounds."""
    rng = np.random.default_rng(11)
    tested = 0
    for _ in range(40):
        a, c, lo, up, rl, ru = _random_lp(rng, boxed=True)
        r0, x0, y0, z0, b0, i0 = simplex_solve(a, c, lo, up, rl, ru)
        if r0 != 0:
            continue
        j = int(rng.integers(0, a.shape[1]))
        lo2, up2 = lo.copy(), up.copy()
        if rng.random() < 0.5:
            up2[j] = max(lo[j], np.floor(x0[j]))
        else:
            lo2[j] = min(up[j], np.ceil(x0[j]))
        r1, x1, *_ = simplex_solve(a, c, lo2, up2, rl, ru)
        r2, x2, *_rest = dn.dual_solve(a, a.tocsr(), c, lo2, up2, rl,
                                       ru, basis_in=b0)
        assert r1 == r2
        if r1 == 0:
            assert abs(c @ x1 - c @ x2) <= 1e-6 * (1 + abs(c @ x1))
        tested += 1
    assert tested >= 20


def test_need_primal_on_free_cold_start():
    """A free variable with nonzero cost is dual infeasible from the
    all-logical basis: the engine must hand back NEED_PRIMAL rather
    than guess."""
    a = sp.csc_matrix(np.array([[1.0, 1.0]]))
    c = np.array([1.0, -1.0])
    lo = np.array([-np.inf, -np.inf])
    up = np.array([np.inf, np.inf])
    rl = np.array([-1.0])
    ru = np.array([1.0])
    r, *_ = dn.dual_solve(a, a.tocsr(), c, lo, up, rl, ru)
    assert r == dn.RESULT_NEED_PRIMAL


def test_persistent_engine_dive_pattern():
    """Repeated bound tightenings on one engine (dive): each re-solve
    starts from the previous basis without refactorization."""
    rng = np.random.default_rng(3)
    a, c, lo, up, rl, ru = _random_lp(rng, boxed=True)
    eng = dn.DualEngine(a, a.tocsr(), c, lo, up, rl, ru)
    r, x, y, z, b, i = eng.solve()
    assert r == dn.RESULT_OPTIMAL
    lo2, up2 = lo.copy(), up.copy()
    for step in range(6):
        j = int(rng.integers(0, a.shape[1]))
        mid = 0.5 * (lo2[j] + up2[j])
        if rng.random() < 0.5:
            up2[j] = mid
        else:
            lo2[j] = mid
        eng.set_col_bounds(lo2, up2)
        r, x, y, z, b, i = eng.solve()
        assert r in (dn.RESULT_OPTIMAL, dn.RESULT_INFEASIBLE)
        r_ref, x_ref, *_ = simplex_solve(a, c, lo2, up2, rl, ru)
        if r_ref == 1:
            # primal phase-1 claims need confirmation; the dual
            # engine's verdict is the checked one here
            assert r in (dn.RESULT_OPTIMAL, dn.RESULT_INFEASIBLE)
        elif r == dn.RESULT_OPTIMAL and r_ref == 0:
            assert abs(c @ x - c @ x_ref) <= 1e-6 * (1 + abs(c @ x_ref))
        if r == dn.RESULT_INFEASIBLE:
            break
    eng.close()


def test_obj_cut_early_exit():
    """The MIP bound-prune path: a cutoff below the optimum must stop
    the solve early with RESULT_OBJ_CUT."""
    rng = np.random.default_rng(5)
    a, c, lo, up, rl, ru = _random_lp(rng, boxed=True)
    r0, x0, *_ = simplex_solve(a, c, lo, up, rl, ru)
    assert r0 == 0
    opt = c @ x0
    eng = dn.DualEngine(a, a.tocsr(), c, lo, up, rl, ru)
    # cutoff far below the optimum: the dual objective (monotone
    # nondecreasing) must cross it and exit early, or prove optimality
    # below the cut (only possible if opt <= cut, excluded here)
    r, x, y, z, b, i = eng.solve(obj_cut=opt - 10.0)
    assert r in (dn.RESULT_OBJ_CUT, dn.RESULT_OPTIMAL,
                 dn.RESULT_NEED_PRIMAL)
    if r == dn.RESULT_OPTIMAL:
        assert c @ x <= opt - 10.0 + 1e-9 or abs(c @ x - opt) < 1e-6
    eng.close()


@pytest.mark.parametrize("name,expect", [
    ("egout", 568.1007),
    ("flugpl", 1201500.0),
    ("rgn", 82.19999924),
    ("dcmulti", 188182.0),
])
def test_native_mip_solve_objectives(name, expect):
    """hx_mip_solve raw search (no presolve/cuts) reaches the reference
    ctest objectives (check/CMakeLists.txt:268-280) within the default
    relative gap."""
    from highs_tpu.io.mps import read_mps
    lp = read_mps(
        f"/root/reference/check/instances/{name}.mps").lp
    a = lp.a_matrix.to_scipy().tocsc()
    c = lp.col_cost * float(lp.sense)
    is_int = (np.asarray(lp.integrality) == 1).astype(np.int8)
    st, found, bx, bobj, db, nn, it = dn.mip_solve(
        a, a.tocsr(), c, lp.col_lower, lp.col_upper, lp.row_lower,
        lp.row_upper, is_int, None, np.inf, 0.0, 0.0, 1e-4, lp.offset,
        -np.inf, time_limit=60.0)
    assert found
    obj = float(lp.sense) * bobj + lp.offset
    assert abs(obj - expect) <= max(2e-4 * abs(expect), 1e-3)


def test_native_mip_callback_fires_and_interrupts():
    from highs_tpu.io.mps import read_mps
    lp = read_mps("/root/reference/check/instances/flugpl.mps").lp
    a = lp.a_matrix.to_scipy().tocsc()
    c = lp.col_cost * float(lp.sense)
    is_int = (np.asarray(lp.integrality) == 1).astype(np.int8)
    seen = {"incumbents": 0, "x": None}

    def cb(what, primal, dual, nds, lpit, xs):
        if what == 1:
            seen["incumbents"] += 1
            seen["x"] = xs
            return True  # interrupt on the first incumbent
        return False

    st, found, bx, bobj, db, nn, it = dn.mip_solve(
        a, a.tocsr(), c, lp.col_lower, lp.col_upper, lp.row_lower,
        lp.row_upper, is_int, None, np.inf, 0.0, 0.0, 1e-4, lp.offset,
        -np.inf, time_limit=30.0, callback=cb)
    assert seen["incumbents"] == 1
    assert seen["x"] is not None and len(seen["x"]) == lp.num_col
    assert st == 2  # interrupted
