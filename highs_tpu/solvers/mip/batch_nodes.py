"""Batched MIP node-LP evaluation.

The TPU-first replacement for the reference's parallel MIP workers
(HighsMipSolver worker dive loop, docs/src/parallel.md): open nodes
share the relaxation matrix and differ ONLY in their bound vectors, so
a round of K node LPs is ONE vmapped program — the dense
normal-equations IPM (solvers/ipm) stepped in lockstep over a (K, ...)
batch (SURVEY §7.7: "open nodes grouped and solved as a vmapped batch";
padding/masking waste accepted).

Each lane yields:
- a VALID dual bound (the IPM dual objective once the lane's relative
  dual residual is tiny) for cutoff pruning, and
- the primal iterate for branching/heuristics once converged.

Lanes that fail to converge report nothing and fall back to the exact
sequential node engine.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np

from ...models.lp import HighsLp
from ..ipm.solver import IpmProblem, IpmSettings, _starting_point, ipm_step
from ..pdlp.preprocess import preprocess_lp


class BatchNodeEvaluator:
    def __init__(self, relax_lp: HighsLp, tolerance: float = 1e-9,
                 max_iters: int = 80):
        import jax
        import jax.numpy as jnp

        self.jax = jax
        self.jnp = jnp
        self.tolerance = tolerance
        self.max_iters = max_iters
        self.n_orig = relax_lp.num_col
        self.sense = float(relax_lp.sense)

        std = preprocess_lp(relax_lp)
        self.std = std
        m, n_std = std.num_row, std.num_col
        self.m, self.n_std = m, n_std
        a_np = std.a.toarray()

        def _geo_scale(mat, axis):
            amax = mat.max(axis=axis, initial=0.0)
            amin = np.where(mat > 0, mat, np.inf).min(axis=axis,
                                                      initial=np.inf)
            ok = (amax > 0) & np.isfinite(amin)
            return np.where(ok,
                            1.0 / np.sqrt(np.where(ok, amax * amin, 1.0)),
                            1.0)

        abs_a = np.abs(a_np)
        self.row_s = _geo_scale(abs_a, 1)
        self.col_s = _geo_scale(np.abs(self.row_s[:, None] * a_np), 0)
        a_scaled = self.row_s[:, None] * a_np * self.col_s[None, :]
        self.a_scaled = a_scaled
        self.b_scaled = self.row_s * std.b
        self.c_scaled = std.c * self.col_s
        self.is_ineq = (np.arange(m) >= std.num_eq).astype(np.float64)

        dtype = jnp.float64
        self._shared = dict(
            a=jnp.asarray(a_scaled, dtype=dtype),
            b=jnp.asarray(self.b_scaled, dtype=dtype),
            c=jnp.asarray(self.c_scaled, dtype=dtype),
            slack_mask=jnp.asarray(self.is_ineq, dtype=dtype),
            norm_c=jnp.asarray(np.linalg.norm(self.c_scaled),
                               dtype=dtype),
            norm_b=jnp.asarray(np.linalg.norm(self.b_scaled),
                               dtype=dtype))

        axes = IpmProblem(
            a=None, b=None, c=None, slack_mask=None,
            lo=0, up=0, lo_fin=0, up_fin=0, active=0,
            norm_c=None, norm_b=None)
        self._vstart = jax.jit(jax.vmap(_starting_point,
                                        in_axes=(axes,)))
        sett = IpmSettings()
        self._sett_tuple = (sett.sigma_min, sett.sigma_max,
                            sett.fraction_to_boundary, sett.theta_max)
        self._regs = np.array([sett.reg_primal, sett.reg_dual])

        def step1(problem, state, regs):
            return ipm_step(problem, state, regs, self._sett_tuple)

        self._vstep = jax.jit(jax.vmap(step1, in_axes=(axes, 0, 0)))

    def _problem_fields(self, los: np.ndarray, ups: np.ndarray):
        """Per-node (K, n_std + m) bound/mask arrays from original-space
        node bounds (K, n_orig)."""
        K = los.shape[0]
        m, n_std = self.m, self.n_std
        std = self.std
        with np.errstate(invalid="ignore"):
            lo_x = los / self.col_s[:self.n_orig][None, :]
            up_x = ups / self.col_s[:self.n_orig][None, :]
        # slack-column bounds come from the template std (fixed)
        lo_rest = np.tile(std.col_lower[self.n_orig:] /
                          self.col_s[self.n_orig:], (K, 1))
        up_rest = np.tile(std.col_upper[self.n_orig:] /
                          self.col_s[self.n_orig:], (K, 1))
        lo_xs = np.concatenate([lo_x, lo_rest], axis=1)
        up_xs = np.concatenate([up_x, up_rest], axis=1)
        lo_sl = np.zeros((K, m))
        up_sl = np.where(self.is_ineq[None, :] > 0, np.inf, 0.0)
        lo = np.concatenate([lo_xs, lo_sl], axis=1)
        up = np.concatenate([up_xs, up_sl], axis=1)

        fixed = np.zeros((K, n_std + m), dtype=bool)
        with np.errstate(invalid="ignore"):
            fixed[:, :n_std] = np.isfinite(lo_xs) & np.isfinite(up_xs) & \
                (up_xs - lo_xs <= 1e-14 * (1.0 + np.abs(lo_xs)))
        fixed[:, n_std:] = self.is_ineq[None, :] == 0
        active = (~fixed).astype(np.float64)
        lo_fin = (np.isfinite(lo) & ~fixed).astype(np.float64)
        up_fin = (np.isfinite(up) & ~fixed).astype(np.float64)
        big = 1e30
        lo_dev = np.where(np.isfinite(lo), lo, -big)
        up_dev = np.where(np.isfinite(up), up, big)
        return lo_dev, up_dev, lo_fin, up_fin, active

    def evaluate(self, los: np.ndarray, ups: np.ndarray
                 ) -> List[Tuple[bool, float, Optional[np.ndarray]]]:
        """Evaluate K node relaxations.

        Returns per node (converged, dual_bound_min_space, x_orig).
        dual_bound is -inf when the lane produced no certified bound."""
        jax, jnp = self.jax, self.jnp
        K = los.shape[0]
        dtype = jnp.float64
        lo_dev, up_dev, lo_fin, up_fin, active = \
            self._problem_fields(np.asarray(los, dtype=np.float64),
                                 np.asarray(ups, dtype=np.float64))
        problem = IpmProblem(
            lo=jnp.asarray(lo_dev, dtype=dtype),
            up=jnp.asarray(up_dev, dtype=dtype),
            lo_fin=jnp.asarray(lo_fin, dtype=dtype),
            up_fin=jnp.asarray(up_fin, dtype=dtype),
            active=jnp.asarray(active, dtype=dtype),
            **self._shared)
        state = self._vstart(problem)
        regs = jnp.asarray(np.tile(self._regs, (K, 1)), dtype=dtype)

        norm_b = 1.0 + float(np.linalg.norm(self.b_scaled))
        norm_c = 1.0 + float(np.linalg.norm(self.c_scaled))
        tol = self.tolerance
        done = np.zeros(K, dtype=bool)
        best_dual = np.full(K, -np.inf)
        mh = None
        prev_state = state
        for it in range(self.max_iters):
            prev_state = state
            state, metrics = self._vstep(problem, state, regs)
            mh = jax.device_get(metrics)
            bad = ~np.isfinite(np.asarray(mh.mu))
            if bad.any():
                # revert broken lanes, escalate their regularization
                state = jax.tree.map(
                    lambda new, old: jnp.where(
                        jnp.asarray(bad).reshape(
                            (K,) + (1,) * (new.ndim - 1)), old, new),
                    state, prev_state)
                regs = regs * jnp.where(
                    jnp.asarray(bad)[:, None], 100.0, 1.0)
            rel_p = np.asarray(mh.primal_res) / norm_b
            rel_d = np.asarray(mh.dual_res) / norm_c
            pobj = np.asarray(mh.primal_obj)
            dobj = np.asarray(mh.dual_obj)
            rel_gap = np.abs(pobj - dobj) / (1.0 + np.abs(pobj) +
                                             np.abs(dobj))
            # certified dual bounds: nearly dual-feasible lanes
            cert = (rel_d < 1e-9) & np.isfinite(dobj) & ~bad
            best_dual[cert] = np.maximum(best_dual[cert], dobj[cert])
            done |= (rel_p < tol) & (rel_d < tol) & (rel_gap < tol)
            if it >= 10 and bool(done.all()):
                break

        results: List[Tuple[bool, float, Optional[np.ndarray]]] = []
        if mh is None:
            return [(False, -np.inf, None)] * K
        xs = np.asarray(jax.device_get(state.x), dtype=np.float64)
        rel_p = np.asarray(mh.primal_res) / norm_b
        rel_d = np.asarray(mh.dual_res) / norm_c
        pobj = np.asarray(mh.primal_obj)
        dobj = np.asarray(mh.dual_obj)
        rel_gap = np.abs(pobj - dobj) / (1.0 + np.abs(pobj) +
                                         np.abs(dobj))
        from ..pdlp.preprocess import recover_solution
        for k in range(K):
            converged = bool(rel_p[k] < tol and rel_d[k] < tol and
                             rel_gap[k] < tol)
            x_orig = None
            if converged:
                x_std = xs[k, :self.n_std] * self.col_s
                y_std = np.zeros(self.m)
                z_std = np.zeros(self.n_std)
                col_value, _, _ = recover_solution(
                    self.std, x_std, y_std, z_std)
                x_orig = col_value
            results.append((converged, float(best_dual[k]), x_orig))
        return results
