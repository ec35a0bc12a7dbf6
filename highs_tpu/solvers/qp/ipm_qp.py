"""Convex QP interior-point solver.

Replaces the reference's QUASS active-set method (qpsolver/a_quass.cpp,
quass.cpp:309) and HiPO-QP (Highs.cpp:4160) with a TPU-native
primal-dual IPM: the reference's strictly sequential active-set pivoting
does not map to TPU, while the IPM's per-iteration work here is two
dense factorizations + matmuls (SURVEY §7.6).

    min 1/2 x'Qx + c'x   s.t.  L <= Ax <= U,  l <= x <= u,  Q psd

Standard form as in the LP IPM (solvers/ipm/solver.py): equality rows
first, surplus slacks on inequality rows.  With H = blockdiag(Q, 0) the
Newton reduction is

    dv = (H + D)^-1 (A_std' dy - rhs_v)
    [A (Q+Dx)^-1 A' + diag(slack)/Ds + reg] dy = rb + A_std (H+D)^-1 rhs_v

so each iteration costs one (n x n) and one (m x m) Cholesky plus dense
matmuls.
"""
from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import HighsModelStatus, HighsStatus
from ...models.lp import HighsModel
from ...models.solution import HighsSolution
from ...options import HighsOptions
from ..ipm.solver import IpmRunInfo
from ..pdlp.preprocess import preprocess_lp, recover_solution


class QpIpmProblem(NamedTuple):
    a: jax.Array  # (m, n_std)
    q: jax.Array  # (n_std, n_std) dense psd Hessian (slack rows/cols 0)
    b: jax.Array
    c: jax.Array
    slack_mask: jax.Array
    lo: jax.Array
    up: jax.Array
    lo_fin: jax.Array
    up_fin: jax.Array
    active: jax.Array
    norm_c: jax.Array
    norm_b: jax.Array


class QpIpmState(NamedTuple):
    x: jax.Array
    xl: jax.Array
    xu: jax.Array
    y: jax.Array
    zl: jax.Array
    zu: jax.Array


class QpIpmMetrics(NamedTuple):
    primal_res: jax.Array
    dual_res: jax.Array
    mu: jax.Array
    primal_obj: jax.Array
    comp_gap: jax.Array
    alpha_p: jax.Array
    alpha_d: jax.Array


def _mv(problem, xs):
    n = problem.a.shape[1]
    return problem.a @ xs[:n] - problem.slack_mask * xs[n:]


def _rmv(problem, y):
    return jnp.concatenate([y @ problem.a, -problem.slack_mask * y])


def _residuals(problem, state):
    m, n = problem.a.shape
    qx = problem.q @ state.x[:n]
    grad = jnp.concatenate([problem.c + qx, jnp.zeros(m, dtype=qx.dtype)])
    rb = problem.b - _mv(problem, state.x)
    rc = (grad - _rmv(problem, state.y) - state.zl + state.zu)
    rc = rc * problem.active
    rl = (problem.lo - state.x + state.xl) * problem.lo_fin
    ru = (problem.up - state.x - state.xu) * problem.up_fin
    return rb, rc, rl, ru


@partial(jax.jit, static_argnames=("settings",))
def qp_ipm_step(problem: QpIpmProblem, state: QpIpmState, regs: jax.Array,
                settings: Tuple):
    (sigma_min, sigma_max, ftb, theta_max) = settings
    reg_p, reg_d = regs[0], regs[1]
    m, n = problem.a.shape
    dtype = problem.a.dtype
    eps = jnp.asarray(1e-30, dtype=dtype)

    rb, rc, rl, ru = _residuals(problem, state)

    n_fin = jnp.sum(problem.lo_fin) + jnp.sum(problem.up_fin)
    gap_sum = (jnp.sum(state.xl * state.zl * problem.lo_fin) +
               jnp.sum(state.xu * state.zu * problem.up_fin))
    mu = gap_sum / jnp.maximum(n_fin, 1.0)

    d = (state.zl / jnp.maximum(state.xl, eps) * problem.lo_fin +
         state.zu / jnp.maximum(state.xu, eps) * problem.up_fin + reg_p)
    # fixed vars: huge D freezes them (dv ~ 0)
    d = jnp.where(problem.active > 0,
                  jnp.maximum(d, 1.0 / theta_max), theta_max)
    d_x, d_s = d[:n], d[n:]

    # factor (Q + Dx) once per iteration
    qd = problem.q + jnp.diag(d_x)
    chol_qd = jnp.linalg.cholesky(qd)
    # W = (Q+Dx)^-1 A'  (n x m)
    w = jax.scipy.linalg.cho_solve((chol_qd, True), problem.a.T)
    theta_s = problem.slack_mask / d_s
    mmat = problem.a @ w + jnp.diag(theta_s + reg_d)
    chol_m = jnp.linalg.cholesky(mmat)

    def hd_solve(v):
        """(H + D)^-1 v over stacked vars."""
        top = jax.scipy.linalg.cho_solve((chol_qd, True), v[:n])
        bot = v[n:] / d_s
        return jnp.concatenate([top, bot])

    def solve_newton(rmu_l, rmu_u):
        rhs_v = (rc -
                 rmu_l / jnp.maximum(state.xl, eps) * problem.lo_fin -
                 state.zl * rl / jnp.maximum(state.xl, eps) *
                 problem.lo_fin +
                 rmu_u / jnp.maximum(state.xu, eps) * problem.up_fin -
                 state.zu * ru / jnp.maximum(state.xu, eps) *
                 problem.up_fin)
        wv = hd_solve(rhs_v)
        rhs_y = rb + _mv(problem, wv)
        dy = jax.scipy.linalg.cho_solve((chol_m, True), rhs_y)
        dv = hd_solve(_rmv(problem, dy) - rhs_v)
        dxl = (dv - rl) * problem.lo_fin
        dxu = (ru - dv) * problem.up_fin
        dzl = ((rmu_l - state.zl * dxl) /
               jnp.maximum(state.xl, eps)) * problem.lo_fin
        dzu = ((rmu_u - state.zu * dxu) /
               jnp.maximum(state.xu, eps)) * problem.up_fin
        return dv, dy, dxl, dxu, dzl, dzu

    def max_step(v, dv, mask):
        ratio = jnp.where((dv < 0) & (mask > 0), -v / jnp.minimum(dv, -eps),
                          jnp.inf)
        return jnp.minimum(1.0, jnp.min(ratio))

    rmu_l_aff = -state.xl * state.zl * problem.lo_fin
    rmu_u_aff = -state.xu * state.zu * problem.up_fin
    dva, dya, dxla, dxua, dzla, dzua = solve_newton(rmu_l_aff, rmu_u_aff)
    ap_aff = jnp.minimum(max_step(state.xl, dxla, problem.lo_fin),
                         max_step(state.xu, dxua, problem.up_fin))
    ad_aff = jnp.minimum(max_step(state.zl, dzla, problem.lo_fin),
                         max_step(state.zu, dzua, problem.up_fin))
    mu_aff = ((jnp.sum((state.xl + ap_aff * dxla) *
                       (state.zl + ad_aff * dzla) * problem.lo_fin) +
               jnp.sum((state.xu + ap_aff * dxua) *
                       (state.zu + ad_aff * dzua) * problem.up_fin)) /
              jnp.maximum(n_fin, 1.0))
    sigma = jnp.clip((mu_aff / jnp.maximum(mu, eps))**3,
                     sigma_min, sigma_max)

    rmu_l = (sigma * mu - state.xl * state.zl - dxla * dzla) * \
        problem.lo_fin
    rmu_u = (sigma * mu - state.xu * state.zu - dxua * dzua) * \
        problem.up_fin
    dv, dy, dxl, dxu, dzl, dzu = solve_newton(rmu_l, rmu_u)

    alpha_p = ftb * jnp.minimum(max_step(state.xl, dxl, problem.lo_fin),
                                max_step(state.xu, dxu, problem.up_fin))
    alpha_d = ftb * jnp.minimum(max_step(state.zl, dzl, problem.lo_fin),
                                max_step(state.zu, dzu, problem.up_fin))
    # QP: primal and dual influence each other through Q — use the joint
    # step to keep the Newton system consistent
    alpha = jnp.minimum(alpha_p, alpha_d)

    new_state = QpIpmState(
        x=state.x + alpha * dv,
        xl=jnp.where(problem.lo_fin > 0, state.xl + alpha * dxl, 1.0),
        xu=jnp.where(problem.up_fin > 0, state.xu + alpha * dxu, 1.0),
        y=state.y + alpha * dy,
        zl=jnp.where(problem.lo_fin > 0, state.zl + alpha * dzl, 0.0),
        zu=jnp.where(problem.up_fin > 0, state.zu + alpha * dzu, 0.0))

    rb2, rc2, _, _ = _residuals(problem, new_state)
    gap2 = (jnp.sum(new_state.xl * new_state.zl * problem.lo_fin) +
            jnp.sum(new_state.xu * new_state.zu * problem.up_fin))
    mu2 = gap2 / jnp.maximum(n_fin, 1.0)
    x_part = new_state.x[:n]
    pobj = 0.5 * jnp.dot(x_part, problem.q @ x_part) + \
        jnp.dot(problem.c, x_part)
    metrics = QpIpmMetrics(
        primal_res=jnp.linalg.norm(rb2),
        dual_res=jnp.linalg.norm(rc2),
        mu=mu2, primal_obj=pobj, comp_gap=gap2,
        alpha_p=alpha, alpha_d=alpha)
    return new_state, metrics


def solve_qp_ipm(model: HighsModel, options: HighsOptions, log=None
                 ) -> Tuple[HighsModelStatus, HighsSolution, IpmRunInfo]:
    t0 = time.perf_counter()
    info = IpmRunInfo()
    lp = model.lp
    sense = float(lp.sense)
    dtype = jnp.float64

    std = preprocess_lp(lp)
    m, n_std = std.num_row, std.num_col
    n_orig = lp.num_col

    a_np = std.a.toarray()
    q_full = model.hessian.to_scipy_full().toarray()
    # sense: minimize sense*(c'x + 1/2 x'Qx); preprocess already scaled c
    q_std = np.zeros((n_std, n_std))
    q_std[:n_orig, :n_orig] = sense * q_full

    is_ineq = (np.arange(m) >= std.num_eq).astype(np.float64)
    lo = np.concatenate([std.col_lower, np.zeros(m)])
    up = np.concatenate([std.col_upper,
                         np.where(is_ineq > 0, np.inf, 0.0)])
    fixed = np.zeros(n_std + m, dtype=bool)
    with np.errstate(invalid="ignore"):
        fixed[:n_std] = (np.isfinite(lo[:n_std]) & np.isfinite(up[:n_std])
                         & (up[:n_std] - lo[:n_std] <=
                            1e-14 * (1.0 + np.abs(lo[:n_std]))))
    fixed[n_std:] = is_ineq == 0
    active = (~fixed).astype(np.float64)
    lo_fin = (np.isfinite(lo) & ~fixed).astype(np.float64)
    up_fin = (np.isfinite(up) & ~fixed).astype(np.float64)
    big = 1e30
    problem = QpIpmProblem(
        a=jnp.asarray(a_np, dtype=dtype),
        q=jnp.asarray(q_std, dtype=dtype),
        b=jnp.asarray(std.b, dtype=dtype),
        c=jnp.asarray(std.c, dtype=dtype),
        slack_mask=jnp.asarray(is_ineq, dtype=dtype),
        lo=jnp.asarray(np.where(np.isfinite(lo), lo, -big), dtype=dtype),
        up=jnp.asarray(np.where(np.isfinite(up), up, big), dtype=dtype),
        lo_fin=jnp.asarray(lo_fin, dtype=dtype),
        up_fin=jnp.asarray(up_fin, dtype=dtype),
        active=jnp.asarray(active, dtype=dtype),
        norm_c=jnp.asarray(np.linalg.norm(std.c), dtype=dtype),
        norm_b=jnp.asarray(np.linalg.norm(std.b), dtype=dtype))

    # starting point: analogous least-squares heuristic via LP machinery
    from ..ipm.solver import IpmProblem, _starting_point
    lp_problem = IpmProblem(
        a=problem.a, b=problem.b, c=problem.c,
        slack_mask=problem.slack_mask, lo=problem.lo, up=problem.up,
        lo_fin=problem.lo_fin, up_fin=problem.up_fin,
        active=problem.active, norm_c=problem.norm_c,
        norm_b=problem.norm_b)
    st0 = _starting_point(lp_problem)
    state = QpIpmState(x=st0.x, xl=st0.xl, xu=st0.xu, y=st0.y,
                       zl=st0.zl, zu=st0.zu)

    tol = options.ipm_optimality_tolerance
    sett = (1e-4, 0.9, 0.9995, 1e10)
    regs = np.array([1e-9, 1e-9])
    norm_b_h = float(problem.norm_b)
    norm_c_h = float(problem.norm_c)
    status = HighsModelStatus.kNotset
    it = 0
    stall = 0
    best_err = np.inf
    nan_retries = 0
    limit = min(options.ipm_iteration_limit, 200)
    while it < limit:
        prev = state
        state, metrics = qp_ipm_step(problem, state,
                                     jnp.asarray(regs, dtype=dtype), sett)
        it += 1
        mh = jax.device_get(metrics)
        if not np.isfinite(float(mh.mu)):
            state = prev
            nan_retries += 1
            regs = regs * 100.0
            if nan_retries > 4:
                status = HighsModelStatus.kUnknown
                break
            continue
        rel_p = float(mh.primal_res) / (1.0 + norm_b_h)
        rel_d = float(mh.dual_res) / (1.0 + norm_c_h)
        mu = float(mh.mu)
        rel_mu = mu / (1.0 + abs(float(mh.primal_obj)))
        if log is not None:
            log(f"qp-ipm {it:3d} pobj={float(mh.primal_obj):.10e} "
                f"mu={mu:.2e} rp={rel_p:.2e} rd={rel_d:.2e}")
        err = rel_p + rel_d + rel_mu
        if err < best_err * 0.99:
            best_err = err
            stall = 0
        else:
            stall += 1
        if rel_p < tol and rel_d < tol and rel_mu < tol:
            status = HighsModelStatus.kOptimal
            break
        if stall > 12:
            status = HighsModelStatus.kUnknown
            break
        if time.perf_counter() - t0 > options.time_limit:
            status = HighsModelStatus.kTimeLimit
            break
    if status == HighsModelStatus.kNotset:
        status = HighsModelStatus.kIterationLimit

    sh = jax.device_get(state)
    xs = np.asarray(sh.x, dtype=np.float64)
    y = np.asarray(sh.y, dtype=np.float64)
    x_std = xs[:n_std]
    # reduced costs: grad - K'y restricted to x block
    grad = q_std @ x_std + std.c
    z_std = grad - (y @ a_np)
    col_value, row_dual, col_dual = recover_solution(std, x_std, y, z_std)
    row_value = lp.a_matrix.to_scipy() @ col_value
    sol = HighsSolution(value_valid=True, dual_valid=True,
                        col_value=col_value, col_dual=col_dual,
                        row_value=row_value, row_dual=row_dual)
    info.status = status
    info.iterations = it
    info.ipm_iterations = it
    info.primal_obj = (float(lp.col_cost @ col_value) + lp.offset +
                       model.hessian.quad_value(col_value))
    info.solve_time = time.perf_counter() - t0
    return status, sol, info
