"""Feasibility Jump primal heuristic.

Re-implements the behavior of the reference's vendored feasibility-jump
heuristic (highs/mip/feasibilityjump.hh, HighsFeasibilityJump.cpp;
Luteberget & Sartorius 2023): weighted-violation local search over
variable assignments — each move sets one variable to the value
minimizing the weighted constraint violation along its coordinate
(piecewise-linear minimum over row breakpoints); when stuck in a local
minimum the weights of violated rows are bumped.  Integers move on
integral values; a small objective term breaks ties toward good
solutions.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp


def feasibility_jump(a: sp.spmatrix, row_lower: np.ndarray,
                     row_upper: np.ndarray, col_lower: np.ndarray,
                     col_upper: np.ndarray, cost: np.ndarray,
                     is_int: np.ndarray,
                     x0: Optional[np.ndarray] = None,
                     max_moves: int = 30000,
                     feastol: float = 1e-6,
                     seed: int = 0,
                     time_budget: float = float("inf")
                     ) -> Optional[np.ndarray]:
    """Return a row-feasible assignment (integers integral) or None."""
    import time as _time
    deadline = _time.perf_counter() + time_budget
    m, n = a.shape
    a_csc = a.tocsc()
    a_csr = a.tocsr()
    rng = np.random.default_rng(seed)

    lo = np.where(np.isfinite(col_lower), col_lower, -1e9)
    up = np.where(np.isfinite(col_upper), col_upper, 1e9)

    if x0 is None:
        x = np.clip(0.0, lo, up)
    else:
        x = np.clip(np.asarray(x0, dtype=np.float64).copy(), lo, up)
    x = np.where(is_int, np.clip(np.round(x), lo, up), x)

    # native local-search engine (reference analogue: the vendored
    # feasibilityjump.hh is C++); the numpy loop below is the fallback
    try:
        from ..simplex import native as _nat
        lib = _nat.get_lib()
        x_io = np.ascontiguousarray(x, dtype=np.float64).copy()
        ok = lib.hx_feasibility_jump(
            m, n,
            np.ascontiguousarray(a_csc.indptr, dtype=np.int64),
            np.ascontiguousarray(a_csc.indices, dtype=np.int32),
            np.ascontiguousarray(a_csc.data, dtype=np.float64),
            np.ascontiguousarray(a_csr.indptr, dtype=np.int64),
            np.ascontiguousarray(a_csr.indices, dtype=np.int32),
            np.ascontiguousarray(a_csr.data, dtype=np.float64),
            np.ascontiguousarray(
                np.where(np.isfinite(row_lower), row_lower, -1e30),
                dtype=np.float64),
            np.ascontiguousarray(
                np.where(np.isfinite(row_upper), row_upper, 1e30),
                dtype=np.float64),
            np.ascontiguousarray(lo, dtype=np.float64),
            np.ascontiguousarray(up, dtype=np.float64),
            np.ascontiguousarray(cost, dtype=np.float64),
            np.ascontiguousarray(is_int, dtype=np.int8),
            float(feastol), int(max_moves), float(time_budget),
            np.uint64(seed * 7919 + 1), x_io)
        return x_io if ok else None
    except (OSError, AttributeError):
        pass

    act = a_csr @ x
    w = np.ones(m)
    # objective tie-break weight, relative to typical cost magnitude
    cscale = np.abs(cost).max() if n else 1.0
    obj_w = 1e-4 / (1.0 + cscale)

    def row_viol(vals, rows=None):
        rl = row_lower if rows is None else row_lower[rows]
        ru = row_upper if rows is None else row_upper[rows]
        return np.maximum(rl - vals, 0.0) + np.maximum(vals - ru, 0.0)

    def col_entries(j):
        s, e = a_csc.indptr[j], a_csc.indptr[j + 1]
        return a_csc.indices[s:e], a_csc.data[s:e]

    def best_value(j):
        """Minimize weighted violation along coordinate j."""
        rows, vals = col_entries(j)
        if len(rows) == 0:
            v = lo[j] if cost[j] > 0 else up[j]
            return v if np.isfinite(v) else 0.0
        base = act[rows] - vals * x[j]
        # candidate breakpoints: values making each row hit its bounds
        cands = [x[j]]
        with np.errstate(divide="ignore", invalid="ignore"):
            for bnd in (row_lower[rows], row_upper[rows]):
                t = (bnd - base) / vals
                t = t[np.isfinite(t)]
                cands.extend(t.tolist())
        cands.append(lo[j])
        cands.append(up[j])
        cands = np.clip(np.asarray(cands, dtype=np.float64), lo[j], up[j])
        if is_int[j]:
            cands = np.unique(np.concatenate([
                np.floor(cands), np.ceil(cands)]))
            cands = cands[(cands >= lo[j] - 1e-9) & (cands <= up[j] + 1e-9)]
        if len(cands) == 0:
            return x[j]
        # evaluate weighted violation of affected rows for each candidate
        new_act = base[None, :] + np.outer(cands, vals)
        viol = (np.maximum(row_lower[rows][None, :] - new_act, 0.0) +
                np.maximum(new_act - row_upper[rows][None, :], 0.0))
        score = viol @ w[rows] + obj_w * cost[j] * cands
        k = int(np.argmin(score))
        return float(cands[k])

    viol = row_viol(act)
    for move in range(max_moves):
        if move % 256 == 0 and _time.perf_counter() > deadline:
            return None
        violated = np.nonzero(viol > feastol)[0]
        if len(violated) == 0:
            return np.where(is_int, np.round(x), x)
        # pick a violated row (weighted random among worst)
        wv = w[violated] * viol[violated]
        i = violated[int(np.argmax(wv * (0.5 + rng.random(len(violated)))))]
        s, e = a_csr.indptr[i], a_csr.indptr[i + 1]
        row_cols = a_csr.indices[s:e]
        if len(row_cols) == 0:
            return None  # empty violated row: infeasible
        improved = False
        # try the variables of this row in random order
        for j in rng.permutation(row_cols):
            v_new = best_value(int(j))
            if abs(v_new - x[j]) < 1e-12:
                continue
            rows_j, vals_j = col_entries(int(j))
            delta_act = vals_j * (v_new - x[j])
            old_score = float(w[rows_j] @ row_viol(act[rows_j], rows_j))
            new_vals = act[rows_j] + delta_act
            new_score = float(w[rows_j] @ row_viol(new_vals, rows_j))
            if new_score < old_score - 1e-12:
                x[j] = v_new
                act[rows_j] = new_vals
                viol[rows_j] = row_viol(new_vals, rows_j)
                improved = True
                break
        if not improved:
            # local minimum: bump weights of violated rows
            w[violated] += 1.0
    return None
