"""Sparse-direct IPM path: native LDL' kernel + end-to-end solves.

Reference role: HiPO's FactorHiGHS supernodal LDL' + AMD ordering
(highs/ipm/hipo/factorhighs/Analyse.cpp, Factorise.cpp) serving the
interior-point Newton systems without any dense-capacity cap.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from highs_tpu.options import HighsOptions
from highs_tpu.solvers.ipm.sparse_ldl import LdlBlowup, SparseLdl
from highs_tpu.solvers.ipm.solver import solve_lp_ipm_native


def _spd(n, seed=0, density=0.01):
    rng = np.random.default_rng(seed)
    a = sp.random(n, n, density=density, random_state=rng, format="csc")
    m = (a @ a.T + sp.identity(n) * (n * density + 1.0)).tocsc()
    m.sum_duplicates()
    return m


def test_ldl_solves_spd_system():
    m = _spd(400, seed=1)
    h = SparseLdl(m)
    rng = np.random.default_rng(2)
    for _ in range(3):
        b = rng.standard_normal(400)
        x = h.solve(b)
        assert np.linalg.norm(m @ x - b) <= 1e-10 * np.linalg.norm(b)


def test_ldl_refactor_same_pattern():
    m = _spd(300, seed=3)
    h = SparseLdl(m)
    m2 = m.copy()
    m2.data = m2.data * 2.0
    assert h.matches(m2)
    h.factor(m2)
    b = np.ones(300)
    x = h.solve(b)
    assert np.linalg.norm(m2 @ x - b) <= 1e-10 * np.linalg.norm(b)


def test_ldl_blowup_budget():
    # near-dense pattern with a tiny work budget must abort cleanly
    m = _spd(200, seed=4, density=0.5)
    with pytest.raises(LdlBlowup):
        SparseLdl(m, max_work=10)


def _grid_flow_lp(g=40, seed=5):
    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix
    m = g * g
    rows, cols, vals = [], [], []
    e = 0
    for i in range(g):
        for j in range(g):
            if j + 1 < g:
                rows += [i * g + j, i * g + j + 1]
                cols += [e, e]
                vals += [1.0, -1.0]
                e += 1
            if i + 1 < g:
                rows += [i * g + j, (i + 1) * g + j]
                cols += [e, e]
                vals += [1.0, -1.0]
                e += 1
    a = sp.csc_matrix((vals, (rows, cols)), shape=(m, e))
    rng = np.random.default_rng(seed)
    supply = rng.standard_normal(m)
    supply -= supply.mean()
    c = rng.uniform(1.0, 3.0, e)
    return HighsLp(
        num_col=e, num_row=m, col_cost=c,
        col_lower=np.full(e, -50.0), col_upper=np.full(e, 50.0),
        row_lower=supply, row_upper=supply,
        a_matrix=HighsSparseMatrix.from_scipy(a), sense=1)


def test_sparse_ipm_grid_flow():
    """A 1600-row grid min-cost flow solved by the ldl newton mode;
    cross-checked against the simplex engine."""
    from highs_tpu.constants import HighsModelStatus
    lp = _grid_flow_lp(40)
    opts = HighsOptions()
    opts.tpu_ipm_newton = "ldl"
    st, sol, info = solve_lp_ipm_native(lp, opts)
    assert st == HighsModelStatus.kOptimal
    from highs_tpu.solvers.simplex.wrapper import solve_lp_simplex
    st2, sol2, info2 = solve_lp_simplex(lp, HighsOptions())
    assert st2 == HighsModelStatus.kOptimal
    ref = float(lp.col_cost @ sol2.col_value)
    assert abs(info.primal_obj - ref) <= 1e-6 * (1.0 + abs(ref))


def test_sparse_ipm_netlib_agreement():
    from highs_tpu.constants import HighsModelStatus
    from highs_tpu.io.mps import read_mps
    for name, ref in [("25fv47", 5501.8458883),
                      ("80bau3b", 987224.19241)]:
        lp = read_mps(
            f"/root/reference/check/instances/{name}.mps").lp
        opts = HighsOptions()
        opts.tpu_ipm_newton = "ldl"
        st, sol, info = solve_lp_ipm_native(lp, opts)
        assert st == HighsModelStatus.kOptimal, name
        assert abs(info.primal_obj - ref) <= 1e-6 * (1 + abs(ref)), name


def test_banded_cholesky_device_route():
    # VERDICT r4 item 6: on-device blocked banded Cholesky replaces
    # the host SuperLU route for structured large SPD systems
    import scipy.sparse as sp
    from highs_tpu.solvers.ipm.banded_chol import BandedCholesky
    rng = np.random.default_rng(3)
    g = 30
    m = g * g
    G = sp.diags([np.full(m, 8.0), np.full(m - 1, -1.0),
                  np.full(m - 1, -1.0), np.full(m - g, -1.0),
                  np.full(m - g, -1.0)], [0, 1, -1, g, -g],
                 format="csr")
    bc = BandedCholesky.from_spd(G)
    assert bc is not None
    bc.factor(G)
    rhs = rng.standard_normal(m)
    x = bc.solve(rhs)
    assert np.linalg.norm(G @ x - rhs) / np.linalg.norm(rhs) < 1e-3
    # refinement (the solver's protocol) reaches f64-grade accuracy
    for _ in range(3):
        x = x + bc.solve(rhs - G @ x)
    assert np.linalg.norm(G @ x - rhs) / np.linalg.norm(rhs) < 1e-10
    # an unstructured matrix is rejected -> callers keep the fallback
    R = sp.random(600, 600, density=0.05, random_state=1)
    R = (R + R.T + sp.diags(np.full(600, 50.0))).tocsr()
    assert BandedCholesky.from_spd(R, max_block_bw=2) is None
