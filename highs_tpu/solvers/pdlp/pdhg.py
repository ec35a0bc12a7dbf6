"""Restarted reflected-Halpern PDHG — the TPU workhorse LP solver.

Re-implements the algorithmic behavior of the reference HiPDLP solver
(highs/pdlp/hipdlp/pdhg.cc, the cuPDLPx-style reflected-Halpern restarted
PDHG with kUseCupdlpx = true, pdhg.hpp:35) as an idiomatic JAX program:

- the inner block of `check_interval` (default 40, pdhg.cc:32
  PDHG_CHECK_INTERVAL) steps is ONE jitted `lax.fori_loop` that stays on
  device — the TPU equivalent of the reference's CUDA-graph capture of
  the same block (pdhg.cc:610-632);
- each inner step is 2 SpMV/matvecs + elementwise ops
  (performHalpernPdhgStep, pdhg.cc:961): primal gradient step + box
  projection, reflection, dual step + cone projection, reflection, then
  the Halpern anchor blend with weight (k+1)/(k+2);
- between blocks the host reads a handful of scalars (residuals, gap,
  fixed-point error) and runs the restart / primal-weight / termination
  logic (checkRestartCriteria pdhg.cc:901, restart.hpp:85-95 constants);
- step size eta = 0.998 / ||A||_2 from a jitted power method
  (initializeStepSizes pdhg.cc:1944, powerMethod :1529); primal weight
  omega balances primal and dual steps and is updated at restarts.

Convergence is assessed on the UNSCALED problem (relative L2 residuals
and gap, checkConvergence pdhg.cc:1474,1518-1526) by keeping the inverse
scaling vectors on device.
"""
from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import HighsModelStatus
from ..pdlp.preprocess import StandardFormLP
from ...ops.linops import LinOp


class PdhgProblem(NamedTuple):
    """Device-side scaled standard-form problem."""

    k_op: LinOp  # scaled K
    b: jax.Array  # scaled rhs q~
    c: jax.Array  # scaled cost c~
    lo: jax.Array  # scaled lower bounds
    up: jax.Array  # scaled upper bounds
    is_eq: jax.Array  # (m,) 1.0 for equality rows
    lo_fin: jax.Array  # (n,) 1.0 where lower bound finite
    up_fin: jax.Array  # (n,) 1.0 where upper bound finite
    inv_row_scale: jax.Array  # 1/Dr diagonal (unscaling residuals)
    inv_col_scale: jax.Array  # 1/Dc diagonal
    norm_b: jax.Array  # scalar: ||unscaled b||_2
    norm_c: jax.Array  # scalar: ||unscaled c||_2
    # Dual lower bound on inequality rows (default None = 0).  Used by
    # the shifted-iterate refinement rounds (wrapper._refine_pdlp): the
    # delta-problem's dual must keep y_base + dy in the cone, i.e.
    # dy >= -y_base on inequality rows.
    y_lo: Optional[jax.Array] = None


class PdhgState(NamedTuple):
    x: jax.Array  # Halpern iterate (primal)
    y: jax.Array  # Halpern iterate (dual)
    x_pd: jax.Array  # last un-reflected PDHG iterate
    y_pd: jax.Array
    x_anchor: jax.Array
    y_anchor: jax.Array
    aty: jax.Array  # K' y cache
    k: jax.Array  # inner iteration count since restart (int32)
    eta: jax.Array  # step size
    omega: jax.Array  # primal weight


class PdhgMetrics(NamedTuple):
    primal_res: jax.Array  # unscaled L2 primal residual
    dual_res: jax.Array  # unscaled L2 dual residual
    primal_obj: jax.Array
    dual_obj: jax.Array
    fp_err: jax.Array  # weighted fixed-point error of the halpern iterate
    dx_norm: jax.Array  # || x_pd - x_anchor ||
    dy_norm: jax.Array  # || y_pd - y_anchor ||
    # infeasibility-certificate diagnostics from the normalized
    # anchor-difference direction:
    inf_dual_ray_obj: jax.Array  # b' dy / ||dy||  (positive => primal infeas)
    inf_dual_ray_res: jax.Array  # || proj-violation of K' dy || / ||dy||
    inf_primal_ray_obj: jax.Array  # c' dx / ||dx|| (negative => unbounded)
    inf_primal_ray_res: jax.Array  # constraint violation of dx direction


@dataclasses.dataclass
class PdhgSettings:
    eps_optimal: float = 1e-7
    eps_infeasible: float = 1e-10
    iteration_limit: int = 2**31 - 1
    time_limit: float = math.inf
    check_interval: int = 40
    halpern_gamma: float = 1.0  # reflection coefficient rho
    restart_strategy: int = 2  # 0 none / 1 fixed / 2 adaptive-Halpern
    # restart constants (reference restart.hpp:85-95)
    sufficient_decay: float = 0.2
    necessary_decay: float = 0.8
    artificial_restart_fraction: float = 0.36
    omega_smoothing: float = 0.5
    omega_init: Optional[float] = None
    power_method_iters: int = 30
    dtype: str = "float64"
    # checkpoint/resume for long runs (SURVEY §5: the state is a few
    # vectors; no reference analogue — HiGHS solves are minutes-scale)
    checkpoint_file: str = ""
    checkpoint_interval: int = 50  # blocks between checkpoint writes
    # mixed-precision stepping: "" = off, "bfloat16" = run the step
    # matvecs on a bf16 copy of K until residuals reach
    # `step_dtype_switch_tol`, then switch to full precision
    step_dtype: str = ""
    step_dtype_switch_tol: float = 1e-3
    # engine mode: "halpern" = reflected-Halpern (HiPDLP / cuPDLPx,
    # pdhg.cc kUseCupdlpx), "average" = average-iterate restarted PDHG
    # (cuPDLP-C, cupdlp_solver.c PDHG_Solve + cupdlp_restart.c
    # GetRestartIterate) — the two option values "hipdlp" and "pdlp"
    mode: str = "halpern"
    # Refinement-round behavior (wrapper._refine_pdlp): a delta-round
    # terminates on primal+dual residuals alone (the true gap is only
    # computable on the host, which re-checks in f64 between rounds)
    # and must not trigger infeasibility detection (the shifted problem
    # has tiny rhs/cost by construction).
    ignore_gap: bool = False
    detect_infeasibility: bool = True
    # optional host-side convergence oracle called after each device
    # convergence check with the raw (scaled) PDHG iterates; returning
    # True terminates with kOptimal.  The refinement rounds use it to
    # stop exactly when the TRUE f64 KKT of the accumulated iterate
    # clears the user's tolerance instead of overshooting a guessed
    # residual target.
    host_check: object = None
    # residual level at which the oracle starts being consulted (the
    # USER tolerance; the round's own eps_optimal is typically deeper)
    host_check_gate: float = 0.0
    # step-size strategy (reference pdlp_step_size_strategy;
    # cupdlp_step.c fixed/adaptive/Malitsky-Pock).  The Halpern mode is
    # natively fixed-step; "adaptive" and "malitsky_pock" re-estimate
    # eta between device blocks from the observed iterate movement vs
    # operator interaction (the linesearch quantities of cuPDLP,
    # evaluated at block granularity so the device block stays fused)
    step_size_strategy: str = "fixed"
    # Block-ramp warm start: refinement rounds (wrapper._refine_pdlp)
    # continue a converging solve — re-ramping their device blocks from
    # 40 steps pays ~24 extra host round trips of tunnel latency per
    # round for no information.  ramp_start skips that many ramp
    # stages (0 = cold ramp).
    ramp_start: int = 0
    # ON-DEVICE restart windows (halpern mode): run checkRestartCriteria
    # at the reference's 40-step granularity INSIDE the fused device
    # block (pdhg.cc:658 checks every PDHG_CHECK_INTERVAL; the host-side
    # ramped blocks check up to 64x less often, which measurably costs
    # iterations on large instances).  False falls back to the
    # per-block host restart logic.
    device_restarts: bool = True


@dataclasses.dataclass
class PdhgResult:
    status: HighsModelStatus
    x: np.ndarray  # unscaled standard-form primal
    y: np.ndarray  # unscaled standard-form dual
    z: np.ndarray  # unscaled reduced costs c - K'y
    iterations: int
    primal_obj: float
    dual_obj: float
    primal_res: float
    dual_res: float
    rel_gap: float
    solve_time: float
    restarts: int = 0


def _halpern_step(problem: PdhgProblem, state: PdhgState,
                  gamma: float, step_op=None) -> PdhgState:
    """One reflected-Halpern PDHG step (pdhg.cc:961 behavior).

    `step_op` optionally replaces the stepping matvecs with a
    low-precision (bfloat16) copy of K — mixed-precision stepping:
    the iterates stay in the state dtype, only the operator products
    round.  Metrics/termination always use the full-precision K."""
    tau = state.eta / state.omega
    sigma = state.eta * state.omega

    op = problem.k_op if step_op is None else step_op
    from ...ops.linops import linop_dtype
    op_dt = linop_dtype(op)

    x_pd = jnp.clip(state.x - tau * (problem.c - state.aty),
                    problem.lo, problem.up)
    x_r = 2.0 * x_pd - state.x

    ax_r = op.mv(x_r.astype(op_dt)).astype(x_r.dtype)
    y_raw = state.y + sigma * (problem.b - ax_r)
    y_floor = 0.0 if problem.y_lo is None else problem.y_lo
    y_pd = jnp.where(problem.is_eq > 0, y_raw,
                     jnp.maximum(y_raw, y_floor))
    y_r = 2.0 * y_pd - state.y

    kf = state.k.astype(x_pd.dtype)
    w = (kf + 1.0) / (kf + 2.0)
    x_new = w * (gamma * x_r + (1.0 - gamma) * state.x) + \
        (1.0 - w) * state.x_anchor
    y_new = w * (gamma * y_r + (1.0 - gamma) * state.y) + \
        (1.0 - w) * state.y_anchor

    aty_new = op.rmv(y_new.astype(op_dt)).astype(y_new.dtype)
    return state._replace(x=x_new, y=y_new, x_pd=x_pd, y_pd=y_pd,
                          aty=aty_new, k=state.k + 1)


class RestartCtl(NamedTuple):
    """On-device restart-control scalars (reference pdhg.cc:556-690
    state: initial_fpe_, last_trial_fpe, halpern/total counters).
    Carried separately from PdhgState so sharding specs and
    checkpoints stay unchanged — scalars replicate for free."""
    fpe_init: jax.Array   # FPE captured at the first major step after
    #                       a restart (reference initial_fpe_)
    fpe_last: jax.Array   # FPE at the previous 40-step check
    fresh: jax.Array      # bool: capture fpe_init at the next major step
    total_k: jax.Array    # i32 cumulative iteration count
    n_restarts: jax.Array  # i32


# FPE cross term 2*eta*dx'K'dy (reference computeFixedPointError
# pdhg.cc:736).  Measured on the 50k flagship (f64): iteration count
# is IDENTICAL with and without it (45,600 both ways), and dropping it
# saves one SpMV per major step (2 per 40-step window) — so it ships
# OFF; HX_FPE_CROSS=1 restores the reference formula.
import os as _os
_FPE_CROSS = _os.environ.get("HX_FPE_CROSS", "") == "1"


def _halpern_step_fpe(problem: PdhgProblem, state: PdhgState,
                      gamma: float, step_op=None):
    """Major Halpern step that also returns the reference fixed-point
    error (computeFixedPointError pdhg.cc:709): with dx/dy the PDHG
    operator displacement (pre-step iterate minus projected iterate),
    fpe = sqrt(max(0, omega|dx|^2 + |dy|^2/omega + 2 eta dx'K'dy)) —
    including the cross term the old host metric omitted."""
    x_before, y_before = state.x, state.y
    new_state = _halpern_step(problem, state, gamma, step_op)
    dx = x_before - new_state.x_pd
    dy = y_before - new_state.y_pd
    movement = (state.omega * jnp.sum(dx * dx) +
                jnp.sum(dy * dy) / state.omega)
    if _FPE_CROSS:
        op = problem.k_op if step_op is None else step_op
        from ...ops.linops import linop_dtype
        op_dt = linop_dtype(op)
        kt_dy = op.rmv(dy.astype(op_dt)).astype(dy.dtype)
        interaction = 2.0 * state.eta * jnp.sum(dx * kt_dy)
    else:
        interaction = 0.0
    fpe = jnp.sqrt(jnp.maximum(0.0, movement + interaction))
    return new_state, fpe


def _pdhg_windows_impl(problem: PdhgProblem, state: PdhgState,
                       ctl: RestartCtl, n_windows, gamma: float,
                       interval: int, theta, step_op=None):
    """n_windows windows of `interval` steps, each ending with the
    reference restart check (checkRestartCriteria pdhg.cc:901) fully
    on device; one host round trip for the convergence metrics at the
    end.  The TPU analogue of the reference loop structure where the
    CUDA graph covers steps 2..40 and the restart logic runs between
    graph launches — here the whole ramped super-block stays fused."""
    dtype = state.x.dtype

    def window(_, carry):
        s, c = carry
        # step 1 (major): capture initial_fpe right after a restart
        s, fpe1 = _halpern_step_fpe(problem, s, gamma, step_op)
        c = c._replace(
            fpe_init=jnp.where(c.fresh, fpe1, c.fpe_init),
            fresh=jnp.zeros((), dtype=bool))

        # steps 2 .. interval-1 (minor)
        def minor(_, ss):
            return _halpern_step(problem, ss, gamma, step_op)
        s = jax.lax.fori_loop(0, interval - 2, minor, s)

        # step `interval` (major) + restart check
        s, fpe = _halpern_step_fpe(problem, s, gamma, step_op)
        c = c._replace(total_k=c.total_k + interval)
        forced = c.total_k == interval  # very first check ever
        sufficient = fpe <= 0.2 * c.fpe_init
        necessary = (fpe <= 0.8 * c.fpe_init) & (fpe > c.fpe_last)
        artificial = s.k.astype(dtype) >= \
            0.36 * c.total_k.astype(dtype)
        do_r = forced | sufficient | necessary | artificial

        # BRANCHLESS restart: compute the restart candidates every
        # window and select with jnp.where — a lax.cond here breaks
        # XLA's software pipelining of the whole fused loop (measured
        # -23% iteration rate on the 50k flagship); the unconditional
        # extra work is one SpMV + two norms per 40 steps (~3%).
        # Primal-weight update (reference updatePrimalWeightAtRestart,
        # gated by theta: theta=0 keeps omega fixed, the FIXED-strategy
        # default).
        dxn = jnp.linalg.norm(s.x_pd - s.x_anchor)
        dyn = jnp.linalg.norm(s.y_pd - s.y_anchor)
        ok = (dxn > 1e-12) & (dyn > 1e-12)
        log_om = theta * jnp.log(jnp.maximum(dyn, 1e-300) /
                                 jnp.maximum(dxn, 1e-300)) + \
            (1.0 - theta) * jnp.log(s.omega)
        new_om = jnp.where(ok, jnp.exp(jnp.clip(log_om, -12.0, 12.0)),
                           s.omega)
        op = problem.k_op if step_op is None else step_op
        from ...ops.linops import linop_dtype as _ld
        aty_r = op.rmv(s.y_pd.astype(_ld(op))).astype(dtype)
        s = s._replace(
            x=jnp.where(do_r, s.x_pd, s.x),
            y=jnp.where(do_r, s.y_pd, s.y),
            x_anchor=jnp.where(do_r, s.x_pd, s.x_anchor),
            y_anchor=jnp.where(do_r, s.y_pd, s.y_anchor),
            aty=jnp.where(do_r, aty_r, s.aty),
            k=jnp.where(do_r, 0, s.k),
            omega=jnp.where(do_r, new_om, s.omega))
        c = c._replace(
            fresh=do_r,
            fpe_last=jnp.where(do_r, jnp.asarray(jnp.inf, dtype=dtype),
                               fpe),
            n_restarts=c.n_restarts + do_r.astype(jnp.int32))
        return (s, c)

    state, ctl = jax.lax.fori_loop(0, jnp.asarray(n_windows, jnp.int32),
                                   window, (state, ctl))
    metrics = _compute_metrics(problem, state)
    return state, ctl, metrics


@partial(jax.jit, static_argnames=("gamma", "interval"))
def pdhg_block_windows(problem: PdhgProblem, state: PdhgState,
                       ctl: RestartCtl, n_windows, gamma: float,
                       interval: int, theta, step_op=None):
    return _pdhg_windows_impl(problem, state, ctl, n_windows, gamma,
                              interval, theta, step_op)


def _compute_metrics(problem: PdhgProblem, state: PdhgState) -> PdhgMetrics:
    """Residuals/gap on the UNSCALED problem at the PDHG iterate."""
    x, y = state.x_pd, state.y_pd
    ax = problem.k_op.mv(x)
    r = problem.b - ax
    # eq rows: |r|; ineq rows: violation of Kx >= q is max(r, 0)
    r_eff = jnp.where(problem.is_eq > 0, r, jnp.maximum(r, 0.0))
    r_unscaled = r_eff * problem.inv_row_scale
    primal_res = jnp.linalg.norm(r_unscaled)

    z = problem.c - problem.k_op.rmv(y)
    z_plus = jnp.maximum(z, 0.0) * problem.lo_fin
    z_minus = jnp.minimum(z, 0.0) * problem.up_fin
    dres = (z - z_plus - z_minus) * problem.inv_col_scale
    dual_res = jnp.linalg.norm(dres)

    primal_obj = jnp.dot(problem.c, x)
    lo_safe = jnp.where(problem.lo_fin > 0, problem.lo, 0.0)
    up_safe = jnp.where(problem.up_fin > 0, problem.up, 0.0)
    dual_obj = (jnp.dot(problem.b, y) + jnp.dot(lo_safe, z_plus) +
                jnp.dot(up_safe, z_minus))

    # fixed-point error of the halpern iterate (omega-weighted)
    dxh = state.x_pd - state.x
    dyh = state.y_pd - state.y
    fp_err = jnp.sqrt(state.omega * jnp.sum(dxh * dxh) +
                      jnp.sum(dyh * dyh) / state.omega)

    dx = x - state.x_anchor
    dy = y - state.y_anchor
    dx_norm = jnp.linalg.norm(dx)
    dy_norm = jnp.linalg.norm(dy)

    # --- infeasibility certificates from the anchor-difference rays -------
    eps_div = jnp.asarray(1e-30, dtype=x.dtype)
    dyn = dy / jnp.maximum(dy_norm, eps_div)
    # dual ray must satisfy: K'dy <= 0 on vars at finite upper only, etc.
    # residual of the Farkas condition  K' dy (+) bound-compatible signs:
    kt_dy = problem.k_op.rmv(dyn)
    # components of K'dy that cannot be absorbed: positive parts need a
    # finite lower bound, negative parts a finite upper bound
    viol = (jnp.maximum(kt_dy, 0.0) * (1.0 - problem.lo_fin) +
            jnp.minimum(kt_dy, 0.0) * (1.0 - problem.up_fin))
    # Farkas dual objective: b'dy + l'[K'dy]_+ + u'[K'dy]_-
    ray_obj = (jnp.dot(problem.b, dyn) +
               jnp.dot(lo_safe, jnp.maximum(kt_dy, 0.0)) +
               jnp.dot(up_safe, jnp.minimum(kt_dy, 0.0)))
    inf_dual_ray_obj = ray_obj
    inf_dual_ray_res = jnp.linalg.norm(viol)

    dxn = dx / jnp.maximum(dx_norm, eps_div)
    k_dx = problem.k_op.mv(dxn)
    prim_viol = jnp.where(problem.is_eq > 0, jnp.abs(k_dx),
                          jnp.maximum(-k_dx, 0.0))
    # ray must respect bound directions: positive where upper infinite only
    bnd_viol = (jnp.maximum(dxn, 0.0) * problem.up_fin +
                jnp.minimum(dxn, 0.0) * problem.lo_fin)
    inf_primal_ray_obj = jnp.dot(problem.c, dxn)
    inf_primal_ray_res = jnp.sqrt(jnp.sum(prim_viol**2) +
                                  jnp.sum(bnd_viol**2))

    return PdhgMetrics(
        primal_res=primal_res, dual_res=dual_res,
        primal_obj=primal_obj, dual_obj=dual_obj, fp_err=fp_err,
        dx_norm=dx_norm, dy_norm=dy_norm,
        inf_dual_ray_obj=inf_dual_ray_obj,
        inf_dual_ray_res=inf_dual_ray_res,
        inf_primal_ray_obj=inf_primal_ray_obj,
        inf_primal_ray_res=inf_primal_ray_res)


@partial(jax.jit, static_argnames=("gamma",))
def pdhg_block(problem: PdhgProblem, state: PdhgState, n_steps,
               gamma: float, step_op=None):
    """Run n_steps inner steps fully on device, then compute metrics.

    The TPU analogue of the reference's CUDA-graph-captured 40-step block
    (pdhg.cc:610-632): no host synchronization inside.  ``n_steps`` is
    a TRACED scalar so the deterministic block-size ramp reuses ONE
    compiled program for every size (a fresh compile per doubling cost
    ~10s each over a tunneled device link).
    """
    def body(_, s):
        return _halpern_step(problem, s, gamma, step_op)

    state = jax.lax.fori_loop(0, jnp.asarray(n_steps, jnp.int32),
                              body, state)
    metrics = _compute_metrics(problem, state)
    return state, metrics


def _avg_pdhg_step(problem: PdhgProblem, state: PdhgState,
                   step_op=None) -> PdhgState:
    """One plain PDHG step with running-average accumulation
    (cuPDLP-C PDHG_Update_Iterate): x_{k+1} = proj(x - tau(c - K'y)),
    y_{k+1} = proj(y + sigma(b - K(2x_{k+1} - x))).  The anchor fields
    hold the RUNNING SUMS of the iterates since the last restart (the
    Halpern anchor is unused in this mode)."""
    tau = state.eta / state.omega
    sigma = state.eta * state.omega
    op = problem.k_op if step_op is None else step_op
    from ...ops.linops import linop_dtype
    op_dt = linop_dtype(op)

    x_pd = jnp.clip(state.x - tau * (problem.c - state.aty),
                    problem.lo, problem.up)
    x_r = 2.0 * x_pd - state.x
    ax_r = op.mv(x_r.astype(op_dt)).astype(x_r.dtype)
    y_raw = state.y + sigma * (problem.b - ax_r)
    y_floor = 0.0 if problem.y_lo is None else problem.y_lo
    y_pd = jnp.where(problem.is_eq > 0, y_raw,
                     jnp.maximum(y_raw, y_floor))
    aty_new = op.rmv(y_pd.astype(op_dt)).astype(y_pd.dtype)
    return state._replace(
        x=x_pd, y=y_pd, x_pd=x_pd, y_pd=y_pd,
        x_anchor=state.x_anchor + x_pd,
        y_anchor=state.y_anchor + y_pd,
        aty=aty_new, k=state.k + 1)


@jax.jit
def pdhg_block_avg(problem: PdhgProblem, state: PdhgState,
                   n_steps, step_op=None):
    """Average-iterate device block: n_steps plain PDHG steps, then
    metrics at BOTH the current and the average iterate (cuPDLP-C
    checks both and restarts to the better, cupdlp_restart.c)."""
    def body(_, st):
        return _avg_pdhg_step(problem, st, step_op)

    state = jax.lax.fori_loop(0, jnp.asarray(n_steps, jnp.int32),
                              body, state)
    kf = jnp.maximum(state.k.astype(state.x.dtype), 1.0)
    x_avg = state.x_anchor / kf
    y_avg = state.y_anchor / kf
    # current-iterate metrics, with the average as the "anchor" so the
    # difference rays keep a meaningful direction
    m_cur = _compute_metrics(problem, state._replace(
        x_anchor=x_avg, y_anchor=y_avg))
    m_avg = _compute_metrics(problem, state._replace(
        x_pd=x_avg, y_pd=y_avg,
        x_anchor=state.x_pd, y_anchor=state.y_pd))
    return state, m_cur, m_avg, x_avg, y_avg


@jax.jit
def _restart_state_avg(problem: PdhgProblem, state: PdhgState,
                       x_new: jax.Array, y_new: jax.Array,
                       new_omega: jax.Array) -> PdhgState:
    """Restart the average-iterate engine from (x_new, y_new) —
    cuPDLP-C PDHG_Restart_Iterate: sums cleared, aty refreshed."""
    return state._replace(
        x=x_new, y=y_new, x_pd=x_new, y_pd=y_new,
        x_anchor=jnp.zeros_like(x_new),
        y_anchor=jnp.zeros_like(y_new),
        aty=problem.k_op.rmv(y_new),
        k=jnp.zeros_like(state.k), omega=new_omega)


@jax.jit
def _init_aty(k_op: LinOp, y: jax.Array):
    return k_op.rmv(y)


@partial(jax.jit, static_argnames=("n", "iters", "dtype"))
def power_method(k_op: LinOp, n: int, iters: int, dtype):
    """Estimate ||K||_2 via power iteration on K'K (pdhg.cc:1529)."""
    # deterministic start vector (avoids host RNG in the jit)
    v = jnp.ones((n,), dtype=dtype) / jnp.sqrt(jnp.asarray(n, dtype=dtype))

    def body(_, v):
        w = k_op.rmv(k_op.mv(v))
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = k_op.rmv(k_op.mv(v))
    lam = jnp.dot(v, w)
    return jnp.sqrt(jnp.maximum(lam, 1e-30))


@jax.jit
def _step_size_stats(problem: PdhgProblem, state: PdhgState,
                     x_prev: jax.Array, y_prev: jax.Array):
    """movement/interaction of the last block (cuPDLP linesearch
    quantities): movement = w/2 ||dx||^2 + 1/(2w) ||dy||^2,
    interaction = |dy' K dx|."""
    dx = state.x_pd - x_prev
    dy = state.y_pd - y_prev
    movement = (0.5 * state.omega * jnp.sum(dx * dx) +
                0.5 / state.omega * jnp.sum(dy * dy))
    interaction = jnp.abs(jnp.dot(dy, problem.k_op.mv(dx)))
    return movement, interaction


@jax.jit
def _restart_state(state: PdhgState, new_omega: jax.Array) -> PdhgState:
    """Reset the Halpern anchor to the current PDHG iterate."""
    return state._replace(
        x=state.x_pd, y=state.y_pd,
        x_anchor=state.x_pd, y_anchor=state.y_pd,
        k=jnp.zeros_like(state.k), omega=new_omega)


def solve_pdhg(problem: PdhgProblem, n: int, m: int,
               settings: PdhgSettings,
               x0: Optional[np.ndarray] = None,
               y0: Optional[np.ndarray] = None,
               offset: float = 0.0,
               mesh=None,
               log=None) -> PdhgResult:
    """Host-side driver: restart/termination control around pdhg_block.

    With `mesh`, the problem/state are laid out row-sharded over the mesh
    (parallel/mesh.py) and jit/GSPMD turns K'y and row-space reductions
    into ICI collectives — the multi-chip scaling path.
    """
    t_start = time.perf_counter()
    dtype = jnp.float64 if settings.dtype == "float64" else jnp.float32

    if mesh is not None:
        from ...parallel.mesh import shard_pdhg
        # shard the problem before any device compute; the dummy state is
        # replaced below but establishes the layout
        _dummy = PdhgState(
            x=jnp.zeros((n,), dtype=dtype), y=jnp.zeros((m,), dtype=dtype),
            x_pd=jnp.zeros((n,), dtype=dtype),
            y_pd=jnp.zeros((m,), dtype=dtype),
            x_anchor=jnp.zeros((n,), dtype=dtype),
            y_anchor=jnp.zeros((m,), dtype=dtype),
            aty=jnp.zeros((n,), dtype=dtype),
            k=jnp.zeros((), dtype=jnp.int32),
            eta=jnp.zeros((), dtype=dtype),
            omega=jnp.zeros((), dtype=dtype))
        problem, _dummy = shard_pdhg(problem, _dummy, mesh)

    norm_k = power_method(problem.k_op, n, settings.power_method_iters,
                          dtype)
    eta0 = 0.998 / float(norm_k)

    norm_b = float(problem.norm_b)
    norm_c = float(problem.norm_c)
    if settings.omega_init is not None:
        omega0 = settings.omega_init
    elif norm_b > 1e-12 and norm_c > 1e-12:
        omega0 = norm_c / norm_b
    else:
        omega0 = 1.0

    x_init = (jnp.asarray(x0, dtype=dtype) if x0 is not None else
              jnp.clip(jnp.zeros((n,), dtype=dtype),
                       problem.lo, problem.up))
    y_init = (jnp.asarray(y0, dtype=dtype) if y0 is not None
              else jnp.zeros((m,), dtype=dtype))

    state = PdhgState(
        x=x_init, y=y_init, x_pd=x_init, y_pd=y_init,
        x_anchor=x_init, y_anchor=y_init,
        # jitted: an eager bucketed/panel rmv dispatches hundreds of
        # per-op programs through the axon tunnel (seconds of fixed
        # cost); one jitted call is a single cached program
        aty=_init_aty(problem.k_op, y_init),
        k=jnp.zeros((), dtype=jnp.int32),
        eta=jnp.asarray(eta0, dtype=dtype),
        omega=jnp.asarray(omega0, dtype=dtype))
    if mesh is not None:
        from ...parallel.mesh import shard_pdhg
        problem, state = shard_pdhg(problem, state, mesh)

    total_iters = 0
    restarts = 0
    prev_iterates = None
    fp_err_at_restart = None
    last_fp_err = None
    status = HighsModelStatus.kNotset
    eps = settings.eps_optimal
    gamma = settings.halpern_gamma
    infeas_hits = 0
    unbounded_hits = 0
    mlast = None
    # stall-adaptive reflection damping: full reflection (gamma=1) is
    # the fastest mode when it converges, but can cycle on degenerate
    # problems (e.g. Netlib scrs8: 500k+ iterations without progress).
    # When the KKT merit produces no new best for `_STALL_CHECKS`
    # consecutive convergence checks (a true cycle: the merit
    # oscillates without ever improving), damp the reflection to 0.9 —
    # one extra jit compile, then strictly averaged iterations that
    # break the cycle.  Slow-but-monotone convergence keeps setting new
    # bests and never triggers this.
    _STALL_CHECKS = 150
    merit_best = None
    merit_stall = 0
    # uncapped step sizes (opt-in) need an explicit divergence backoff:
    # past the spectral bound PDHG convergence is no longer guaranteed,
    # so if the KKT residuals GROW across consecutive check windows the
    # step is too long — shrink eta and re-anchor.  env read hoisted
    # out of the hot loop (advisor r4).
    _eta_uncap = bool(_os.environ.get("HX_ETA_UNCAP"))
    _res_prev = None
    _res_grow = 0

    # --- mixed-precision step operator ------------------------------------
    step_op = None
    lowprec_best = None
    lowprec_stall = 0
    if settings.step_dtype == "bfloat16":
        from ...ops.linops import cast_linop
        step_op = cast_linop(problem.k_op, jnp.bfloat16)

    # --- checkpoint/resume ------------------------------------------------
    ckpt = settings.checkpoint_file
    if ckpt:
        import os
        if os.path.exists(ckpt):
            try:
                data = np.load(ckpt)
                if data["x"].shape == (n,) and data["y"].shape == (m,):
                    state = PdhgState(
                        x=jnp.asarray(data["x"], dtype=dtype),
                        y=jnp.asarray(data["y"], dtype=dtype),
                        x_pd=jnp.asarray(data["x_pd"], dtype=dtype),
                        y_pd=jnp.asarray(data["y_pd"], dtype=dtype),
                        x_anchor=jnp.asarray(data["x_anchor"],
                                             dtype=dtype),
                        y_anchor=jnp.asarray(data["y_anchor"],
                                             dtype=dtype),
                        aty=problem.k_op.rmv(
                            jnp.asarray(data["y"], dtype=dtype)),
                        k=jnp.asarray(int(data["k"]), dtype=jnp.int32),
                        eta=jnp.asarray(float(data["eta"]), dtype=dtype),
                        omega=jnp.asarray(float(data["omega"]),
                                          dtype=dtype))
                    total_iters = int(data["total_iters"])
                    restarts = int(data["restarts"])
                    if mesh is not None:
                        from ...parallel.mesh import shard_pdhg
                        problem, state = shard_pdhg(problem, state, mesh)
            except Exception:
                pass  # unreadable checkpoint: cold start

    def write_checkpoint():
        if not ckpt:
            return
        try:
            np.savez(
                ckpt,
                x=np.asarray(jax.device_get(state.x)),
                y=np.asarray(jax.device_get(state.y)),
                x_pd=np.asarray(jax.device_get(state.x_pd)),
                y_pd=np.asarray(jax.device_get(state.y_pd)),
                x_anchor=np.asarray(jax.device_get(state.x_anchor)),
                y_anchor=np.asarray(jax.device_get(state.y_anchor)),
                k=int(jax.device_get(state.k)),
                eta=float(jax.device_get(state.eta)),
                omega=float(jax.device_get(state.omega)),
                total_iters=total_iters, restarts=restarts)
        except OSError:
            pass

    blocks_since_ckpt = 0
    # Deterministic block-size ramp: each block costs one host round
    # trip for the convergence metrics (the reference's CUDA-graph
    # block is a fixed 40 steps, pdhg.cc:32, because its host link is
    # PCIe).  On a tunneled / remote TPU the round trip can dwarf 40
    # steps of compute, so the block size doubles every 4 blocks (one
    # recompile per doubling) up to 64x the base interval.  The ramp
    # depends only on the block count — never on wall-clock — so
    # iteration counts stay bit-reproducible across devices, meshes
    # and machine speeds (mesh-invariance tests).
    base_steps = max(1, settings.check_interval)
    max_block = max(base_steps, min(2560, 64 * base_steps))
    n_blocks = 0

    avg_mode = settings.mode == "average"
    avg_err_at_restart = None
    avg_last_err = None
    avg_xy = None  # device arrays of the current average iterate

    # on-device restart windows (halpern mode): checkRestartCriteria
    # runs every `base_steps` INSIDE the fused block
    dev_restarts = (not avg_mode and settings.device_restarts and
                    settings.restart_strategy > 0)
    ctl = RestartCtl(
        fpe_init=jnp.asarray(np.inf, dtype=dtype),
        fpe_last=jnp.asarray(np.inf, dtype=dtype),
        fresh=jnp.ones((), dtype=bool),
        total_k=jnp.asarray(total_iters, dtype=jnp.int32),
        n_restarts=jnp.asarray(restarts, dtype=jnp.int32))
    # reference parity: the FIXED step-size strategy (hipdlp default)
    # performs NO primal-weight update at restarts — theta=0 keeps
    # omega at its init.  Measured on the 50k flagship (f64): theta=0
    # converges in 45,600 iterations vs 147,200 with the old
    # every-restart smoothing update (the reference takes 47,080).
    theta_dev = jnp.asarray(
        0.0 if settings.step_size_strategy == "fixed"
        else settings.omega_smoothing, dtype=dtype)

    while True:
        block_steps = min(max_block,
                          base_steps << min(6, (n_blocks +
                                                settings.ramp_start)
                                            // 4))
        if avg_mode:
            state, m_cur_d, m_avg_d, x_avg, y_avg = pdhg_block_avg(
                problem, state, block_steps, step_op)
            m_cur = jax.device_get(m_cur_d)
            m_avg = jax.device_get(m_avg_d)

            def _err(mm):
                po = float(mm.primal_obj) + offset
                do_ = float(mm.dual_obj) + offset
                return max(
                    float(mm.primal_res) / (1.0 + norm_b),
                    float(mm.dual_res) / (1.0 + norm_c),
                    abs(po - do_) / (1.0 + abs(po) + abs(do_)))
            use_avg = _err(m_avg) <= _err(m_cur)
            mlast = m_avg if use_avg else m_cur
            avg_xy = (x_avg, y_avg) if use_avg else (state.x_pd,
                                                     state.y_pd)
        elif dev_restarts:
            n_windows = max(1, block_steps // base_steps)
            block_steps = n_windows * base_steps
            state, ctl, metrics = pdhg_block_windows(
                problem, state, ctl, n_windows, gamma, base_steps,
                theta_dev, step_op)
            mlast = jax.device_get(metrics)
            restarts = int(jax.device_get(ctl.n_restarts))
        else:
            state, metrics = pdhg_block(problem, state,
                                        block_steps, gamma,
                                        step_op)
            mlast = jax.device_get(metrics)
        total_iters += block_steps
        n_blocks += 1
        blocks_since_ckpt += 1
        if ckpt and blocks_since_ckpt >= settings.checkpoint_interval:
            blocks_since_ckpt = 0
            write_checkpoint()

        pobj = float(mlast.primal_obj) + offset
        dobj = float(mlast.dual_obj) + offset
        rel_p = float(mlast.primal_res) / (1.0 + norm_b)
        rel_d = float(mlast.dual_res) / (1.0 + norm_c)
        rel_gap = abs(pobj - dobj) / (1.0 + abs(pobj) + abs(dobj))

        if log is not None:
            log(total_iters, pobj, dobj, rel_p, rel_d, rel_gap)

        if _eta_uncap:
            _res_now = max(rel_p, rel_d)
            if _res_prev is not None and _res_now > 1.02 * _res_prev:
                _res_grow += 1
            else:
                _res_grow = 0
            _res_prev = _res_now
            if _res_grow >= 3 and float(state.eta) > eta0:
                # three consecutive growing windows above the spectral
                # bound: the long step is diverging.  Back off to the
                # guaranteed-stable step; the next adaptation may grow
                # it again from a converging trajectory.
                state = state._replace(
                    eta=jnp.asarray(eta0, dtype=dtype))
                _res_grow = 0

        if rel_p < eps and rel_d < eps and (settings.ignore_gap or
                                            rel_gap < eps):
            status = HighsModelStatus.kOptimal
            break
        if settings.host_check is not None and \
                rel_p < max(eps, settings.host_check_gate) and \
                rel_d < max(eps, settings.host_check_gate):
            if avg_mode and avg_xy is not None:
                hc = settings.host_check(avg_xy[0], avg_xy[1])
            else:
                hc = settings.host_check(state.x_pd, state.y_pd)
            if hc:
                status = HighsModelStatus.kOptimal
                break

        # --- stall-adaptive reflection damping ---------------------------
        if gamma > 0.9:
            # with ignore_gap the gap is f32-summation-noise-floored
            # (~sqrt(n)*eps_f32 relative) and must not count as a stall
            merit = (max(rel_p, rel_d) if settings.ignore_gap
                     else max(rel_p, rel_d, rel_gap))
            if merit_best is None or merit < merit_best * (1 - 1e-3):
                merit_best = min(merit, merit_best or merit)
                merit_stall = 0
            else:
                merit_stall += 1
                if merit_stall >= _STALL_CHECKS:
                    gamma = 0.9
                    merit_stall = 0

        # mixed precision: switch to full precision once the bf16 phase
        # reaches its target resolution OR stalls (bf16 rounding floors
        # the attainable residual at matrix-conditioning-dependent level)
        if step_op is not None:
            cur = max(rel_p, rel_d, rel_gap)
            if lowprec_best is None or cur < 0.7 * lowprec_best:
                lowprec_best = min(cur, lowprec_best or cur)
                lowprec_stall = 0
            else:
                lowprec_stall += 1
            if cur < settings.step_dtype_switch_tol or \
                    lowprec_stall >= 15:
                step_op = None
                state = state._replace(
                    aty=problem.k_op.rmv(state.y))

        # --- infeasibility detection via certificate rays ---------------
        if settings.detect_infeasibility:
            ray_obj = float(mlast.inf_dual_ray_obj)
            ray_res = float(mlast.inf_dual_ray_res)
            if (float(mlast.dy_norm) > 1e-8 and ray_obj > 1e-6 and
                    ray_res < 1e-8 * max(1.0, ray_obj) and rel_p > eps):
                infeas_hits += 1
                if infeas_hits >= 3:
                    status = HighsModelStatus.kInfeasible
                    break
            else:
                infeas_hits = 0
            pray_obj = float(mlast.inf_primal_ray_obj)
            pray_res = float(mlast.inf_primal_ray_res)
            if (float(mlast.dx_norm) > 1e-8 and pray_obj < -1e-6 and
                    pray_res < 1e-8 * max(1.0, -pray_obj)):
                unbounded_hits += 1
                if unbounded_hits >= 3:
                    status = HighsModelStatus.kUnbounded
                    break
            else:
                unbounded_hits = 0

        if total_iters >= settings.iteration_limit:
            status = HighsModelStatus.kIterationLimit
            break
        if time.perf_counter() - t_start > settings.time_limit:
            status = HighsModelStatus.kTimeLimit
            break

        # --- adaptive step size (between blocks) -------------------------
        if settings.step_size_strategy in ("adaptive", "malitsky_pock") \
                and prev_iterates is not None:
            movement, interaction = _step_size_stats(
                problem, state, prev_iterates[0], prev_iterates[1])
            movement = float(movement)
            interaction = float(interaction)
            eta_cur = float(jax.device_get(state.eta))
            if interaction > 1e-300 and movement > 0.0:
                eta_limit = movement / interaction
                k = max(1, n_blocks)
                if settings.step_size_strategy == "adaptive":
                    # cuPDLP reduction/growth exponents 0.3/0.6
                    # (defs.hpp:129-137), block-level
                    eta_new = min(eta_limit * (1.0 - (k + 1.0)**-0.3),
                                  eta_cur * (1.0 + (k + 1.0)**-0.6))
                else:  # malitsky_pock: cautious multiplicative ratio
                    grow = min(1.0 + 0.5 / (k + 1.0), 1.2)
                    eta_new = min(eta_limit * 0.9, eta_cur * grow)
                # The spectral bound eta||K|| < 1 is the worst case;
                # the measured movement/interaction ratio is the LOCAL
                # stability limit and routinely sits far above it
                # (cuPDLP's linesearch exploits exactly this).  Allow
                # growth past eta0 up to the safeguarded local limit,
                # capped at 8x spectral; restarts and the KKT check
                # contain any transient divergence.
                _cap = 8.0 * eta0 if _eta_uncap else eta0
                eta_new = min(max(eta_new, 0.25 * eta0), _cap)
                if eta_new > 0 and abs(eta_new - eta_cur) > \
                        1e-12 * eta_cur:
                    state = state._replace(
                        eta=jnp.asarray(eta_new, dtype=dtype))
        if settings.step_size_strategy in ("adaptive", "malitsky_pock"):
            prev_iterates = (state.x_pd, state.y_pd)

        # --- restart logic (avg mode: cupdlp_restart.c
        # GetRestartIterate, KKT-error based) ------------------------------
        if avg_mode and settings.restart_strategy > 0:
            cand_err = max(
                float(mlast.primal_res) / (1.0 + norm_b),
                float(mlast.dual_res) / (1.0 + norm_c),
                abs(float(mlast.primal_obj) + offset -
                    (float(mlast.dual_obj) + offset)) /
                (1.0 + abs(float(mlast.primal_obj) + offset) +
                 abs(float(mlast.dual_obj) + offset)))
            inner = int(jax.device_get(state.k))
            do_restart = False
            if avg_err_at_restart is None:
                avg_err_at_restart = cand_err
            if cand_err <= settings.sufficient_decay *                     avg_err_at_restart:
                do_restart = True
            elif (cand_err <= settings.necessary_decay *
                  avg_err_at_restart and avg_last_err is not None
                  and cand_err > avg_last_err):
                do_restart = True
            elif inner >= settings.artificial_restart_fraction *                     total_iters:
                do_restart = True
            avg_last_err = cand_err
            if do_restart and avg_xy is not None:
                dxn = float(mlast.dx_norm)
                dyn = float(mlast.dy_norm)
                omega = float(jax.device_get(state.omega))
                if dxn > 1e-12 and dyn > 1e-12:
                    theta = settings.omega_smoothing
                    log_om = (theta * math.log(dyn / dxn) +
                              (1.0 - theta) * math.log(omega))
                    omega = math.exp(min(max(log_om, -12.0), 12.0))
                state = _restart_state_avg(
                    problem, state, avg_xy[0], avg_xy[1],
                    jnp.asarray(omega, dtype=dtype))
                restarts += 1
                avg_err_at_restart = None
                avg_last_err = None
        # --- restart logic (checkRestartCriteria behavior; host
        # fallback when device windows are off) ---------------------------
        if not avg_mode and not dev_restarts and \
                settings.restart_strategy > 0:
            fp_err = float(mlast.fp_err)
            inner = int(jax.device_get(state.k))
            do_restart = False
            if fp_err_at_restart is None:
                fp_err_at_restart = fp_err
            if fp_err <= settings.sufficient_decay * fp_err_at_restart:
                do_restart = True
            elif (fp_err <= settings.necessary_decay * fp_err_at_restart
                  and last_fp_err is not None and fp_err > last_fp_err):
                do_restart = True
            elif inner >= settings.artificial_restart_fraction * total_iters:
                do_restart = True
            last_fp_err = fp_err
            if do_restart:
                dxn = float(mlast.dx_norm)
                dyn = float(mlast.dy_norm)
                omega = float(jax.device_get(state.omega))
                if dxn > 1e-12 and dyn > 1e-12:
                    theta = settings.omega_smoothing
                    log_om = (theta * math.log(dyn / dxn) +
                              (1.0 - theta) * math.log(omega))
                    omega = math.exp(min(max(log_om, -12.0), 12.0))
                state = _restart_state(
                    state, jnp.asarray(omega, dtype=dtype))
                restarts += 1
                fp_err_at_restart = None
                last_fp_err = None

    if avg_mode and avg_xy is not None:
        # report the iterate the last convergence check used
        state = state._replace(x_pd=avg_xy[0], y_pd=avg_xy[1])
    x = np.asarray(jax.device_get(state.x_pd), dtype=np.float64)
    y = np.asarray(jax.device_get(state.y_pd), dtype=np.float64)
    # unscale: x = Dc x~, y = Dr y~, z = Dc^-1 z~
    inv_col = np.asarray(jax.device_get(problem.inv_col_scale),
                         dtype=np.float64)
    inv_row = np.asarray(jax.device_get(problem.inv_row_scale),
                         dtype=np.float64)
    z_scaled = np.asarray(
        jax.device_get(problem.c - problem.k_op.rmv(state.y_pd)),
        dtype=np.float64)
    x_unscaled = x / inv_col  # Dc = 1/inv_col
    y_unscaled = y / inv_row
    z_unscaled = z_scaled * inv_col

    pobj = float(mlast.primal_obj) + offset if mlast is not None else 0.0
    dobj = float(mlast.dual_obj) + offset if mlast is not None else 0.0
    return PdhgResult(
        status=status, x=x_unscaled, y=y_unscaled, z=z_unscaled,
        iterations=total_iters,
        primal_obj=pobj, dual_obj=dobj,
        primal_res=float(mlast.primal_res) if mlast is not None else np.inf,
        dual_res=float(mlast.dual_res) if mlast is not None else np.inf,
        rel_gap=(abs(pobj - dobj) / (1.0 + abs(pobj) + abs(dobj))),
        solve_time=time.perf_counter() - t_start,
        restarts=restarts)
