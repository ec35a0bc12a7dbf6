"""Batched PDHG: solve many LP instances in one device program.

SURVEY §7.3: "vmap the whole solver over instance batches (Netlib sweep
= one program)".  Each instance is preprocessed/scaled on the host,
padded to the batch's common bucket shape (padding is an exact no-op for
the iteration, see wrapper.py), stacked into a leading batch dimension
and advanced by a vmapped 40-step device block.  The host loop keeps
per-instance restart/termination state; finished instances are frozen by
masking their step size to zero.  On a mesh, the batch dimension shards
over the "batch" axis (data parallelism over instances).
"""
from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import HighsModelStatus
from ...models.lp import HighsLp
from ...models.solution import HighsSolution
from ...options import HighsOptions
from ...ops.linops import DenseMatrix
from .pdhg import (PdhgProblem, PdhgState, RestartCtl, _compute_metrics,
                   _halpern_step, _pdhg_windows_impl, power_method)
from .preprocess import preprocess_lp, recover_solution
from .scaling import scale_problem
from .wrapper import PdlpRunInfo, _bucket


@partial(jax.jit, static_argnames=("gamma",))
def batched_pdhg_block(problem: PdhgProblem, state: PdhgState,
                       n_steps, gamma: float):
    """Vmapped inner block: every leaf has a leading batch dimension.
    ``n_steps`` is traced so the block-size ramp reuses one compile."""
    import jax.numpy as jnp
    nn = jnp.asarray(n_steps, jnp.int32)

    def one(problem, state):
        def body(_, s):
            return _halpern_step(problem, s, gamma)
        state = jax.lax.fori_loop(0, nn, body, state)
        return state, _compute_metrics(problem, state)

    return jax.vmap(one)(problem, state)


@partial(jax.jit, static_argnames=("gamma", "interval"))
def batched_pdhg_windows(problem: PdhgProblem, state: PdhgState,
                         ctl: RestartCtl, n_windows, gamma: float,
                         interval: int, theta):
    """Vmapped 40-step restart windows: the same on-device
    checkRestartCriteria cadence as the single-instance solver
    (pdhg._pdhg_windows_impl), per instance."""
    def one(problem, state, ctl):
        return _pdhg_windows_impl(problem, state, ctl, n_windows,
                                  gamma, interval, theta)
    return jax.vmap(one, in_axes=(0, 0, 0))(problem, state, ctl)


@jax.jit
def batched_restart(state: PdhgState, flags: jax.Array,
                    omegas: jax.Array) -> PdhgState:
    """Reset the Halpern anchor for flagged instances only."""
    f = flags[:, None]
    return state._replace(
        x=jnp.where(f, state.x_pd, state.x),
        y=jnp.where(f, state.y_pd, state.y),
        x_anchor=jnp.where(f, state.x_pd, state.x_anchor),
        y_anchor=jnp.where(f, state.y_pd, state.y_anchor),
        k=jnp.where(flags, 0, state.k),
        omega=jnp.where(flags, omegas, state.omega))


@jax.jit
def freeze_instances(state: PdhgState, frozen: jax.Array) -> PdhgState:
    """Stop finished instances: zero step size AND re-anchor at the
    current iterate so the Halpern blend becomes the identity."""
    f = frozen[:, None]
    return state._replace(
        eta=jnp.where(frozen, 0.0, state.eta),
        x_anchor=jnp.where(f, state.x, state.x_anchor),
        y_anchor=jnp.where(f, state.y, state.y_anchor))


def solve_lp_batch(lps: Sequence[HighsLp], options: HighsOptions,
                   log=None) -> List[Tuple[HighsModelStatus,
                                           HighsSolution, PdlpRunInfo]]:
    """Solve a batch of LPs with one vmapped PDHG program."""
    t_start = time.perf_counter()
    b = len(lps)
    from .wrapper import _resolve_dtype
    dtype = (jnp.float64 if _resolve_dtype(options, None) == "float64"
             else jnp.float32)

    stds = [preprocess_lp(lp) for lp in lps]
    n_pad = _bucket(max(s.num_col for s in stds))
    m_pad = _bucket(max(s.num_row for s in stds))

    problems = []
    scales = []
    for std in stds:
        scaled_a, sc = scale_problem(
            std.a, mode=options.pdlp_scaling_mode,
            ruiz_iterations=options.pdlp_ruiz_iterations)
        dr, dc = sc.row_scale, sc.col_scale
        n_std, m_std = std.num_col, std.num_row

        def padc(v, fill):
            return np.concatenate(
                [v, np.full(n_pad - n_std, fill, dtype=np.float64)])

        def padr(v, fill):
            return np.concatenate(
                [v, np.full(m_pad - m_std, fill, dtype=np.float64)])

        import scipy.sparse as sp_
        a_dense = np.zeros((m_pad, n_pad))
        a_dense[:m_std, :n_std] = scaled_a.toarray()
        with np.errstate(invalid="ignore"):
            lo_s = np.where(np.isfinite(std.col_lower),
                            std.col_lower / dc, std.col_lower)
            up_s = np.where(np.isfinite(std.col_upper),
                            std.col_upper / dc, std.col_upper)
        big = np.finfo(np.float64 if dtype == jnp.float64
                       else np.float32).max / 4
        problems.append(PdhgProblem(
            k_op=DenseMatrix(jnp.asarray(a_dense, dtype=dtype)),
            b=jnp.asarray(padr(dr * std.b, 0.0), dtype=dtype),
            c=jnp.asarray(padc(dc * std.c, 0.0), dtype=dtype),
            lo=jnp.asarray(padc(np.where(np.isfinite(lo_s), lo_s, -big),
                                0.0), dtype=dtype),
            up=jnp.asarray(padc(np.where(np.isfinite(up_s), up_s, big),
                                0.0), dtype=dtype),
            is_eq=jnp.asarray(
                padr((np.arange(m_std) < std.num_eq).astype(float), 1.0),
                dtype=dtype),
            lo_fin=jnp.asarray(
                padc(np.isfinite(std.col_lower).astype(float), 1.0),
                dtype=dtype),
            up_fin=jnp.asarray(
                padc(np.isfinite(std.col_upper).astype(float), 1.0),
                dtype=dtype),
            inv_row_scale=jnp.asarray(padr(1.0 / dr, 1.0), dtype=dtype),
            inv_col_scale=jnp.asarray(padc(1.0 / dc, 1.0), dtype=dtype),
            norm_b=jnp.asarray(np.linalg.norm(std.b), dtype=dtype),
            norm_c=jnp.asarray(np.linalg.norm(std.c), dtype=dtype)))
        scales.append((dr, dc))

    problem = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)

    # per-instance step sizes from the vmapped power method
    norm_k = jax.vmap(
        lambda op: power_method(op, n_pad, 30, dtype))(problem.k_op)
    eta0 = 0.998 / np.maximum(np.asarray(norm_k), 1e-12)
    norms_b = np.array([float(p.norm_b) for p in problems])
    norms_c = np.array([float(p.norm_c) for p in problems])
    omega0 = np.where((norms_b > 1e-12) & (norms_c > 1e-12),
                      norms_c / np.maximum(norms_b, 1e-12), 1.0)

    zeros_n = jnp.zeros((b, n_pad), dtype=dtype)
    zeros_m = jnp.zeros((b, m_pad), dtype=dtype)
    x0 = jnp.clip(zeros_n, problem.lo, problem.up)
    state = PdhgState(
        x=x0, y=zeros_m, x_pd=x0, y_pd=zeros_m,
        x_anchor=x0, y_anchor=zeros_m,
        aty=zeros_n,
        k=jnp.zeros((b,), dtype=jnp.int32),
        eta=jnp.asarray(eta0, dtype=dtype),
        omega=jnp.asarray(omega0, dtype=dtype))

    eps = options.pdlp_optimality_tolerance
    check = options.tpu_check_interval
    iter_limit = min(options.pdlp_iteration_limit, 10**7)

    done = np.zeros(b, dtype=bool)
    status = np.full(b, int(HighsModelStatus.kNotset))
    iters_done = np.zeros(b, dtype=np.int64)
    total = 0
    restarts = np.zeros(b, dtype=np.int64)
    final_pobj = np.zeros(b)
    final_dobj = np.zeros(b)

    # per-instance on-device restart control (pdhg.RestartCtl), same
    # 40-step checkRestartCriteria cadence as the single-instance path
    ctl = RestartCtl(
        fpe_init=jnp.full((b,), np.inf, dtype=dtype),
        fpe_last=jnp.full((b,), np.inf, dtype=dtype),
        fresh=jnp.ones((b,), dtype=bool),
        total_k=jnp.zeros((b,), dtype=jnp.int32),
        n_restarts=jnp.zeros((b,), dtype=jnp.int32))
    # fixed step strategy: no primal-weight update at restarts
    # (reference parity; see pdhg.py theta_dev note)
    theta_dev = jnp.asarray(0.0, dtype=dtype)  # scalar: broadcast in vmap

    n_blocks = 0
    max_block = max(check, min(2560, 64 * check))
    while True:
        # same deterministic block-size ramp as the single-instance
        # loop (pdhg.py): doubles every 4 blocks, count-based only
        block_steps = min(max_block, check << min(6, n_blocks // 4))
        n_windows = max(1, block_steps // check)
        block_steps = n_windows * check
        state, ctl, metrics = batched_pdhg_windows(
            problem, state, ctl, n_windows, 1.0, check, theta_dev)
        restarts = np.asarray(jax.device_get(ctl.n_restarts),
                              dtype=np.int64)
        total += block_steps
        n_blocks += 1
        mh = jax.device_get(metrics)
        pobj = np.asarray(mh.primal_obj, dtype=np.float64) + \
            np.array([s.offset for s in stds])
        dobj = np.asarray(mh.dual_obj, dtype=np.float64) + \
            np.array([s.offset for s in stds])
        rel_p = np.asarray(mh.primal_res) / (1.0 + norms_b)
        rel_d = np.asarray(mh.dual_res) / (1.0 + norms_c)
        rel_gap = np.abs(pobj - dobj) / (1.0 + np.abs(pobj) +
                                         np.abs(dobj))
        newly = (~done & (rel_p < eps) & (rel_d < eps) &
                 (rel_gap < eps))
        if np.any(newly):
            status[newly] = int(HighsModelStatus.kOptimal)
            iters_done[newly] = total
            done |= newly
            final_pobj[newly] = pobj[newly]
            final_dobj[newly] = dobj[newly]
            state = freeze_instances(state, jnp.asarray(done))
        if log is not None:
            log(f"batch iter {total}: {int(done.sum())}/{b} done")
        if np.all(done):
            break
        if total >= iter_limit or \
                time.perf_counter() - t_start > options.time_limit:
            status[~done] = int(HighsModelStatus.kIterationLimit
                                if total >= iter_limit
                                else HighsModelStatus.kTimeLimit)
            iters_done[~done] = total
            final_pobj[~done] = pobj[~done]
            final_dobj[~done] = dobj[~done]
            break

    # ---- recover per-instance solutions ------------------------------
    xh = np.asarray(jax.device_get(state.x_pd), dtype=np.float64)
    yh = np.asarray(jax.device_get(state.y_pd), dtype=np.float64)
    results = []
    for i, (lp, std) in enumerate(zip(lps, stds)):
        dr, dc = scales[i]
        n_std, m_std = std.num_col, std.num_row
        x_std = xh[i, :n_std] * dc
        y_std = yh[i, :m_std] * dr
        z_std = (std.c - std.a.T @ y_std)
        info = PdlpRunInfo()
        info.status = HighsModelStatus(int(status[i]))
        info.iterations = int(iters_done[i])
        info.primal_obj = std.sense_mult * final_pobj[i]
        info.dual_obj = std.sense_mult * final_dobj[i]
        info.restarts = int(restarts[i])
        info.solve_time = time.perf_counter() - t_start
        col_value, row_dual, col_dual = recover_solution(
            std, x_std, y_std, z_std)
        sol = HighsSolution(
            value_valid=True, dual_valid=True,
            col_value=col_value, col_dual=col_dual,
            row_value=(lp.a_matrix.to_scipy() @ col_value
                       if lp.num_row else np.zeros(0)),
            row_dual=row_dual)
        results.append((info.status, sol, info))
    return results
