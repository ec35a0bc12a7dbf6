"""Native c-MIR (native/hcuts.cpp hx_mir_on_leq) vs the python oracle
(cuts._mir_on_leq_py).

The native port implements the identical algorithm; on near-tie divisor
choices (efficacies equal to ~1e-10) the two may pick different — but
equally valid — cuts because summation order differs between BLAS dot
products and the sequential native loop.  So the contract tested is:

1. noneness agrees (same rows produce/reject cuts),
2. the vast majority of produced cuts agree exactly,
3. EVERY native cut is valid: satisfied by all sampled feasible points
   of {a'x <= b, bounds, vbound rows, x_I integer} (the inputs c-MIR
   derives from), and genuinely violated at the fractional point.
"""
import numpy as np
import pytest

from highs_tpu.solvers.mip import cuts as C
from highs_tpu.solvers.mip.native_cuts import VBounds, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native cuts lib unavailable")


def _random_case(rng):
    n = int(rng.integers(2, 25))
    is_int = rng.random(n) < 0.6
    lo = np.where(rng.random(n) < 0.8,
                  np.round(rng.normal(0, 3, n)), -np.inf)
    up = np.where(rng.random(n) < 0.8,
                  lo + np.abs(np.round(rng.normal(2, 3, n))) +
                  (rng.random(n) < 0.5), np.inf)
    bin_m = rng.random(n) < 0.3
    lo[bin_m] = 0.0
    up[bin_m] = 1.0
    x = np.where(np.isfinite(lo), lo, 0.0) + rng.random(n) * np.minimum(
        np.where(np.isfinite(up), up, 5.0) -
        np.where(np.isfinite(lo), lo, 0.0), 5.0)
    nnz = int(rng.integers(2, min(n, 12) + 1))
    cols = rng.choice(n, size=nnz, replace=False).astype(np.int64)
    vals = np.round(rng.normal(0, 2, nnz), 3)
    vals[vals == 0] = 1.0
    rhs = float(vals @ x[cols]) - rng.random() * 2 + 0.5
    vubs, vlbs = VBounds(), VBounds()
    for j in range(n):
        if is_int[j]:
            continue
        for _ in range(int(rng.integers(0, 3))):
            y = int(rng.integers(0, n))
            if not is_int[y]:
                continue
            c1 = float(np.round(rng.normal(0, 2), 2))
            c0 = float(np.round(rng.normal(0, 2), 2))
            (vubs if rng.random() < .5 else vlbs).setdefault(
                j, []).append((y, c1, c0))
    return cols, vals, rhs, x, lo, up, is_int, vubs, vlbs


def _sample_feasible(rng, cols, vals, rhs, lo, up, is_int, vubs, vlbs,
                     n_samples=400):
    """Rejection-sample points satisfying the base row, bounds, vbound
    rows and integrality — the exact inputs c-MIR derives from."""
    n = len(lo)
    lo_s = np.where(np.isfinite(lo), lo, -8.0)
    up_s = np.where(np.isfinite(up), up, 8.0)
    pts = []
    for _ in range(n_samples):
        p = lo_s + rng.random(n) * (up_s - lo_s)
        p[is_int] = np.round(p[is_int])
        p = np.clip(p, lo_s, up_s)
        if float(vals @ p[cols]) > rhs + 1e-9:
            continue
        ok = True
        for j, lst in vubs.items():
            for (y, c1, c0) in lst:
                if p[j] > c0 + c1 * p[y] + 1e-9:
                    ok = False
        for j, lst in vlbs.items():
            for (y, c1, c0) in lst:
                if p[j] < c0 + c1 * p[y] - 1e-9:
                    ok = False
        if ok:
            pts.append(p)
    return pts


def test_native_matches_python_oracle():
    rng = np.random.default_rng(7)
    agree = differ = produced = 0
    for _t in range(1200):
        cols, vals, rhs, x, lo, up, is_int, vubs, vlbs = \
            _random_case(rng)
        pv = bool(rng.random() < 0.5)
        a = C._mir_on_leq_py(cols, vals, rhs, x, lo, up, is_int, 1e-6,
                             vubs=vubs, vlbs=vlbs, prefer_vbds=pv)
        b = C._mir_on_leq(cols, vals.copy(), rhs, x, lo, up, is_int,
                          1e-6, vubs=vubs, vlbs=vlbs, prefer_vbds=pv)
        assert (a is None) == (b is None)
        if a is None:
            continue
        produced += 1
        ca, va, ra, _ = a
        cb, vb_, rb, _ = b
        if (len(ca) == len(cb) and np.array_equal(ca, cb) and
                np.allclose(va, vb_, rtol=1e-9, atol=1e-12) and
                np.isclose(ra, rb, rtol=1e-9, atol=1e-9)):
            agree += 1
        else:
            differ += 1
    assert produced > 150
    # near-tie divisor choices may diverge, but rarely
    assert agree / produced > 0.9, (agree, differ)


def test_native_cuts_are_valid():
    rng = np.random.default_rng(11)
    checked = 0
    for _t in range(600):
        cols, vals, rhs, x, lo, up, is_int, vubs, vlbs = \
            _random_case(rng)
        got = C._mir_on_leq(cols, vals, rhs, x, lo, up, is_int, 1e-6,
                            vubs=vubs, vlbs=vlbs,
                            prefer_vbds=bool(rng.random() < 0.5))
        if got is None:
            continue
        cc, cv, cr, eff = got
        assert eff > 0
        pts = _sample_feasible(rng, cols, vals, rhs, lo, up, is_int,
                               vubs, vlbs)
        for p in pts:
            assert float(cv @ p[cc]) <= cr + 1e-6 * (1 + abs(cr)), \
                "native cut violated by a feasible point"
        checked += 1
    assert checked > 100


def test_extended_space_prefer_vbds():
    # exercise the prefer_vbds tie-break path against the oracle
    rng = np.random.default_rng(3)
    for _t in range(300):
        cols, vals, rhs, x, lo, up, is_int, vubs, vlbs = \
            _random_case(rng)
        a = C._mir_on_leq_py(cols, vals, rhs, x, lo, up, is_int, 1e-6,
                             vubs=vubs, vlbs=vlbs, prefer_vbds=True)
        b = C._mir_on_leq(cols, vals.copy(), rhs, x, lo, up, is_int,
                          1e-6, vubs=vubs, vlbs=vlbs, prefer_vbds=True)
        assert (a is None) == (b is None)


def _random_mip(rng, n_max=8, m_max=6, all_int=False):
    import scipy.sparse as sp
    n = int(rng.integers(3, n_max + 1))
    m = int(rng.integers(2, m_max + 1))
    is_int = (rng.random(n) < 0.7) | all_int
    lo = np.round(rng.normal(0, 2, n))
    up = lo + rng.integers(1, 4, n)
    dens = rng.random((m, n)) * (rng.random((m, n)) < 0.6)
    A = sp.csr_matrix(np.round(dens * 4) / 2)
    mid = A @ ((lo + up) / 2)
    wid = np.abs(A) @ (up - lo) / 2
    row_lo = np.where(rng.random(m) < 0.5, mid - rng.random(m) * wid,
                      -np.inf)
    row_up = np.where(rng.random(m) < 0.8, mid + rng.random(m) * wid,
                      np.inf)
    eqm = rng.random(m) < 0.2
    row_lo[eqm] = row_up[eqm] = mid[eqm]
    return A, row_lo, row_up, lo, up, is_int


def test_path_cuts_valid_by_enumeration():
    """Every cut from the (native) path separator must be satisfied by
    every feasible grid point of the full system (path cuts aggregate
    multiple rows, so validity is model-wide).  Path aggregation
    eliminates CONTINUOUS variables, so mixed MIPs are required for the
    separator to fire; continuous variables are enumerated on a 1/4
    grid (linear cuts attain their max over a polytope at vertices —
    the grid is a dense sample)."""
    import itertools
    rng = np.random.default_rng(5)
    total_cuts = 0
    for _t in range(150):
        A, row_lo, row_up, lo, up, is_int = _random_mip(
            rng, n_max=6, m_max=5)
        if is_int.all():
            is_int[int(rng.integers(0, len(is_int)))] = False
        n = A.shape[1]
        # fractional point inside bounds
        x = lo + rng.random(n) * (up - lo)
        cuts = C.separate_path_mir(A, row_lo, row_up, lo, up, x,
                                   is_int, max_starts=40,
                                   time_budget=0.5)
        if not cuts:
            continue
        ranges = [np.arange(lo[j], up[j] + 0.5) if is_int[j]
                  else np.arange(lo[j], up[j] + 0.125, 0.25)
                  for j in range(n)]
        npts = int(np.prod([len(r) for r in ranges]))
        if npts > 200000:
            continue
        for pt in itertools.product(*ranges):
            p = np.array(pt, dtype=float)
            act = A @ p
            if np.any(act < row_lo - 1e-9) or np.any(act > row_up + 1e-9):
                continue
            for c in cuts:
                assert float(c.vals @ p[c.cols]) <= c.rhs + 1e-6 * (
                    1 + abs(c.rhs)), \
                    "path cut violated by a feasible point"
        total_cuts += len(cuts)
    assert total_cuts > 20
