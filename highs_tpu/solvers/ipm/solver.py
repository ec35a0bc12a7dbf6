"""TPU interior-point LP solver.

Re-implements the behavior of the reference interior-point solvers
(highs/ipm/hipo/ipm/Solver.cpp regularized predictor-corrector;
highs/ipm/ipx/ipm.cc Mehrotra predictor-corrector) in a TPU-native
formulation (SURVEY §7.4, BASELINE.json): each Newton system is solved
through the DENSE normal equations

    (K Theta_x K' + Theta_s + delta_d I) dy = r

on the standard form produced by the PDHG preprocessor (equality rows
first, inequality rows get a surplus slack s >= 0, so the slack block
contributes only a diagonal on inequality rows).  Forming K Theta K' is
two dense matmuls — exactly what the MXU is built for — and the
factorization is a dense Cholesky.  One jitted call per IPM iteration:

  residuals -> Theta -> M = K Theta K' + D_s -> Cholesky
  predictor solve -> affine steps -> mu_aff -> sigma = (mu_aff/mu)^3
  corrector solve (same factor) -> fraction-to-boundary steps -> update

Fixed variables (l == u) are frozen out of the barrier (Theta = 0, step
0); free variables get a capped Theta.  Primal/dual regularization
follows the HiPO style.
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

from ...constants import (HighsCallbackType as _CbT,
                          HighsModelStatus, kHighsInf)
from ...models.lp import HighsLp
from ...models.solution import HighsSolution
from ...options import HighsOptions
from ..pdlp.preprocess import preprocess_lp, recover_solution


class IpmProblem(NamedTuple):
    a: jax.Array  # dense (m, n_std) standard-form K (scaled)
    b: jax.Array  # (m,) rhs
    c: jax.Array  # (n_std,) cost (minimization sense, scaled)
    slack_mask: jax.Array  # (m,) 1.0 on inequality rows (these have slacks)
    # over the n_std + m stacked variables (x then row slacks):
    lo: jax.Array
    up: jax.Array
    lo_fin: jax.Array  # 1.0 where lower bound finite AND var not fixed
    up_fin: jax.Array  # 1.0 where upper bound finite AND var not fixed
    active: jax.Array  # 0.0 for fixed vars (l == u) and eq-row slacks
    norm_c: jax.Array
    norm_b: jax.Array


class IpmState(NamedTuple):
    x: jax.Array  # (n_std + m,) stacked primal (x, s)
    xl: jax.Array
    xu: jax.Array
    y: jax.Array  # (m,)
    zl: jax.Array
    zu: jax.Array


class IpmMetrics(NamedTuple):
    primal_res: jax.Array
    dual_res: jax.Array
    mu: jax.Array
    primal_obj: jax.Array
    dual_obj: jax.Array
    alpha_p: jax.Array
    alpha_d: jax.Array


@dataclasses.dataclass
class IpmSettings:
    tolerance: float = 1e-9
    iteration_limit: int = 200
    time_limit: float = math.inf
    sigma_min: float = 1e-4
    sigma_max: float = 0.9
    fraction_to_boundary: float = 0.9995
    theta_max: float = 1e10
    reg_primal: float = 1e-10
    reg_dual: float = 1e-10


# persistent SparseLdl handles for the "ldl" newton mode, keyed by the
# identity of the (host, sparse) constraint operator: the normal
# matrix's pattern is constant across a solve, so one symbolic
# analysis serves every iteration
_LDL_CACHE: dict = {}
_BANDED_CACHE: dict = {}
_BANDED_REJECT: set = set()


class _JaxLinalg:
    """Dense-linalg backend: jax (device; MXU matmuls + jit)."""
    xp = jnp

    @staticmethod
    def cholesky(mat):
        return jnp.linalg.cholesky(mat)

    @staticmethod
    def cho_solve(chol, rhs):
        return jax.scipy.linalg.cho_solve((chol, True), rhs)

    @staticmethod
    def cg(mdot, rhs, precond):
        dy, _ = jax.scipy.sparse.linalg.cg(
            mdot, rhs, M=precond, tol=1e-14, maxiter=400)
        return dy


class _NumpyLinalg:
    """Dense-linalg backend: numpy/scipy on the host.

    Below MXU-payoff size the accelerator adds only backend-init and
    per-shape compile latency; the MIP node/heuristic path calls the
    IPM on toy relaxations where host BLAS wins outright.  Cholesky
    breakdown returns NaN (matching jnp.linalg.cholesky) so the
    driver's regularization escalation handles both backends alike."""
    xp = np

    @staticmethod
    def cholesky(mat):
        try:
            return np.linalg.cholesky(mat)
        except np.linalg.LinAlgError:
            return np.full_like(mat, np.nan)

    @staticmethod
    def cho_solve(chol, rhs):
        import scipy.linalg as _sla
        if not np.all(np.isfinite(chol)):
            return np.full_like(rhs, np.nan)
        return _sla.cho_solve((chol, True), rhs)

    @staticmethod
    def cg(mdot, rhs, precond):
        import scipy.sparse.linalg as _spla
        nn = len(rhs)
        op = _spla.LinearOperator((nn, nn), matvec=mdot)
        pre = _spla.LinearOperator((nn, nn), matvec=precond)
        dy, _ = _spla.cg(op, rhs, rtol=1e-14, maxiter=400, M=pre)
        return dy


def _mv(problem: IpmProblem, xs, xp=jnp):
    """[K, -I_slack] @ (x, s)."""
    n = problem.a.shape[1]
    return problem.a @ xs[:n] - problem.slack_mask * xs[n:]


def _rmv(problem: IpmProblem, y, xp=jnp):
    """[K, -I_slack]' @ y."""
    return xp.concatenate([y @ problem.a, -problem.slack_mask * y])


def _residuals(problem: IpmProblem, state: IpmState, xp=jnp):
    m, n = problem.a.shape
    c_full = xp.concatenate([problem.c,
                             xp.zeros(m, dtype=problem.c.dtype)])
    rb = problem.b - _mv(problem, state.x, xp)
    rc = c_full - _rmv(problem, state.y, xp) - state.zl + state.zu
    # stationarity on inactive (fixed) vars is satisfied by definition:
    # their reduced cost is free
    rc = rc * problem.active
    rl = (problem.lo - state.x + state.xl) * problem.lo_fin
    ru = (problem.up - state.x - state.xu) * problem.up_fin
    return rb, rc, rl, ru, c_full


def _ipm_step_impl(problem: IpmProblem, state: IpmState, regs,
                   settings: Tuple, newton: str, la
                   ) -> Tuple[IpmState, IpmMetrics]:
    """One Mehrotra predictor-corrector iteration on backend `la`.

    `regs` = array (reg_primal, reg_dual) — dynamic so the host
    can escalate regularization (on Cholesky breakdown) without
    recompilation.  `settings` = (sigma_min, sigma_max, ftb, theta_max).
    `newton` picks the normal-equations solver: "chol" = dense Cholesky
    (MXU matmuls, exact); "cg" = Jacobi-preconditioned conjugate
    gradients, matrix-free in M (two matvecs per CG iteration) — the
    IPX-style iterative KKT path (kkt_solver_diag.h) that scales past
    the O(m^3) factorization.
    """
    xp = la.xp
    (sigma_min, sigma_max, ftb, theta_max) = settings
    reg_p, reg_d = regs[0], regs[1]
    m, n = problem.a.shape
    dtype = problem.a.dtype
    eps = xp.asarray(1e-30, dtype=dtype)

    rb, rc, rl, ru, c_full = _residuals(problem, state, xp)

    n_fin = xp.sum(problem.lo_fin) + xp.sum(problem.up_fin)
    gap_sum = (xp.sum(state.xl * state.zl * problem.lo_fin) +
               xp.sum(state.xu * state.zu * problem.up_fin))
    mu = gap_sum / xp.maximum(n_fin, 1.0)

    # diagonal D = Zl/Xl + Zu/Xu + reg; Theta = 1/D, 0 for fixed vars
    d = (state.zl / xp.maximum(state.xl, eps) * problem.lo_fin +
         state.zu / xp.maximum(state.xu, eps) * problem.up_fin + reg_p)
    theta = xp.where(problem.active > 0,
                     xp.clip(1.0 / d, 0.0, theta_max), 0.0)
    theta_x, theta_s = theta[:n], theta[n:]

    # normal matrix M = K Theta_x K' + Theta_s (ineq diag) + reg_d I
    diag_extra = theta_s * problem.slack_mask + reg_d
    if newton == "ldl":
        # sparse direct path (host only): K stays a scipy CSR; M is
        # built sparse with a CONSTANT pattern across iterations, so
        # the native LDL' (native/hipm.cpp) analyzes once and
        # refactors numerically per step — the HiPO role
        # (ipm/hipo/factorhighs) without the m<=8192 dense cap.
        import scipy.sparse as _sp
        a = problem.a
        aw = a.multiply(np.asarray(theta_x)[None, :]).tocsr()
        mmat = (aw @ a.T + _sp.diags(np.asarray(diag_extra))).tocsc()
        mmat.sum_duplicates()
        # Engine choice for the SPD normal equations: above a size
        # threshold the supernodal SuperLU (scipy splu, BLAS3 panels —
        # the blocked-kernel role of FactorHiGHS DenseFactHybrid.cpp)
        # beats the native scalar up-looking LDL' ~9x per factor
        # (62.5k grid-flow NE: 0.31s vs 2.9s); the native LDL' remains
        # the engine for quasi-definite signed systems (QP KKT, where
        # SuperLU's partial pivoting destroys the 2x2 sign structure)
        # and the fallback when splu fails.
        h = None
        use_banded = False
        use_splu = mmat.shape[0] >= 20000
        if use_splu:
            # ON-DEVICE route first (VERDICT r4 item 6): after an RCM
            # ordering, structured normal matrices (grid/network
            # flows, staircase LPs) are banded, and the blocked banded
            # Cholesky runs the whole factorization as one lax.scan of
            # MXU-shaped (128x128) chol/trsm/syrk steps
            # (banded_chol.py; reference role DenseFactHybrid.cpp).
            # Symbolic (RCM + bandwidth probe) is cached per pattern.
            from .banded_chol import BandedCholesky
            _bc = _BANDED_CACHE.get(id(a))
            if _bc is None and id(a) not in _BANDED_REJECT:
                _bc = BandedCholesky.from_spd(mmat)
                if _bc is None:
                    _BANDED_REJECT.add(id(a))
                else:
                    _BANDED_CACHE.clear()
                    _BANDED_CACHE[id(a)] = _bc
            if _bc is not None:
                try:
                    _bc.factor(mmat)
                    # precision gate: the device factor is f32, and an
                    # ill-conditioned normal matrix (late-IPM Theta
                    # swings; flow Laplacians) makes f32 refinement
                    # non-contracting (cond * eps_f32 >= 1).  Accept
                    # the device route only while a probe solve
                    # actually reaches f64-grade residuals; past that
                    # the solve hands off to the host f64 route for
                    # the remaining iterations.
                    _pb = np.ones(mmat.shape[0])
                    _px = _bc.solve_refined(_pb, refine=3)
                    _pr = np.linalg.norm(mmat @ _px - _pb) / \
                        np.sqrt(mmat.shape[0])
                    if np.isfinite(_pr) and _pr < 1e-6:
                        use_banded = True
                        use_splu = False
                    else:
                        _BANDED_CACHE.pop(id(a), None)
                        _BANDED_REJECT.add(id(a))
                except Exception:
                    _BANDED_CACHE.pop(id(a), None)
                    _BANDED_REJECT.add(id(a))
        if use_splu:
            import scipy.sparse.linalg as _sla2
            try:
                _splu_h = _sla2.splu(mmat.tocsc())
                # splu only raises on EXACT singularity; a
                # successful-but-near-singular factor can return
                # huge/NaN columns.  Probe with a unit solve and fall
                # back to the regularized LDL' path on a bad factor.
                _probe = _splu_h.solve(np.ones(mmat.shape[0]))
                if not np.all(np.isfinite(_probe)):
                    use_splu = False
            except Exception:
                use_splu = False
        if not use_splu and not use_banded:
            h = _LDL_CACHE.get(id(a))
            if h is None or not h.matches(mmat):
                from .sparse_ldl import SparseLdl
                # budget ~ 60x the pattern: past that a direct factor
                # loses to iterating, and the ordering cost blows up
                h = SparseLdl(mmat,
                              max_work=80 * mmat.nnz + 1_000_000,
                              max_fill=60 * mmat.nnz + 1_000_000)
                _LDL_CACHE.clear()
                _LDL_CACHE[id(a)] = h
            else:
                h.factor(mmat, reg_floor=max(1e-12, float(reg_d)))

        def solve_m(rhs_y):
            # two steps of iterative refinement: late-IPM normal
            # matrices are extremely ill-conditioned and the dynamic
            # pivot regularization perturbs the factorization; the
            # refined solve recovers the accuracy the dense path gets
            # from breakdown-escalation (HiPO: KrylovMethods/Refine.cpp)
            rhs = np.asarray(rhs_y)
            if use_banded:
                # device-resident refined solve (banded_chol.py): the
                # band-matvec refinement happens on device, so each
                # Newton rhs costs ONE device call; the host loop
                # below then only tops up in f64
                base = lambda v: _BANDED_CACHE[id(a)].solve_refined(
                    v, refine=3)
            else:
                base = _splu_h.solve if use_splu else h.solve
            x = base(rhs)
            for _ in range(1 if use_banded else 2):
                r = rhs - mmat @ x
                x = x + base(r)
            if not np.all(np.isfinite(x)):
                # near-singular factor slipped through: regularize
                # explicitly and retry once (the LDL path applies
                # reg_floor; mirror it here instead of returning NaNs)
                reg = max(1e-10, float(reg_d)) * (
                    1.0 + float(np.abs(mmat.diagonal()).max()))
                import scipy.sparse.linalg as _sla3
                hreg = _sla3.splu(
                    (mmat + _sp.diags(
                        np.full(mmat.shape[0], reg))).tocsc())
                x = hreg.solve(rhs)
                x = x + hreg.solve(rhs - mmat @ x)
            return x
    elif newton == "chol":
        at_weighted = problem.a * theta_x[None, :]
        mmat = at_weighted @ problem.a.T
        mmat = mmat + xp.diag(diag_extra)
        chol = la.cholesky(mmat)

        def solve_m(rhs_y):
            return la.cho_solve(chol, rhs_y)
    else:
        # matrix-free CG on M with Jacobi preconditioner
        # diag(M)_i = sum_j K_ij^2 theta_j + diag_extra_i
        import scipy.sparse as _spx
        if _spx.issparse(problem.a):
            diag_m = problem.a.multiply(problem.a) @ np.asarray(
                theta_x) + diag_extra
        else:
            diag_m = (problem.a * problem.a) @ theta_x + diag_extra

        def mdot(v):
            # [K,-I_s] Theta [K,-I_s]' v already contains the
            # Theta_s slack diagonal, so only reg_d is added here
            return _mv(problem, theta * _rmv(problem, v, xp), xp) + \
                reg_d * v

        def precond(v):
            return v / xp.maximum(diag_m, eps)

        def solve_m(rhs_y):
            return la.cg(mdot, rhs_y, precond)

    def solve_newton(rmu_l, rmu_u):
        rhs_x = (rc -
                 rmu_l / xp.maximum(state.xl, eps) * problem.lo_fin -
                 state.zl * rl / xp.maximum(state.xl, eps) *
                 problem.lo_fin +
                 rmu_u / xp.maximum(state.xu, eps) * problem.up_fin -
                 state.zu * ru / xp.maximum(state.xu, eps) *
                 problem.up_fin)
        w = theta * rhs_x
        rhs_y = rb + _mv(problem, w, xp)
        dy = solve_m(rhs_y)
        dx = theta * (_rmv(problem, dy, xp) - rhs_x)
        dxl = (dx - rl) * problem.lo_fin
        dxu = (ru - dx) * problem.up_fin
        dzl = ((rmu_l - state.zl * dxl) /
               xp.maximum(state.xl, eps)) * problem.lo_fin
        dzu = ((rmu_u - state.zu * dxu) /
               xp.maximum(state.xu, eps)) * problem.up_fin
        return dx, dy, dxl, dxu, dzl, dzu

    def max_step(v, dv, mask):
        ratio = xp.where((dv < 0) & (mask > 0), -v / xp.minimum(dv, -eps),
                         xp.inf)
        return xp.minimum(1.0, xp.min(ratio))

    # ---- predictor (affine scaling) --------------------------------------
    rmu_l_aff = -state.xl * state.zl * problem.lo_fin
    rmu_u_aff = -state.xu * state.zu * problem.up_fin
    dxa, dya, dxla, dxua, dzla, dzua = solve_newton(rmu_l_aff, rmu_u_aff)

    ap_aff = xp.minimum(max_step(state.xl, dxla, problem.lo_fin),
                        max_step(state.xu, dxua, problem.up_fin))
    ad_aff = xp.minimum(max_step(state.zl, dzla, problem.lo_fin),
                        max_step(state.zu, dzua, problem.up_fin))
    mu_aff = ((xp.sum((state.xl + ap_aff * dxla) *
                      (state.zl + ad_aff * dzla) * problem.lo_fin) +
               xp.sum((state.xu + ap_aff * dxua) *
                      (state.zu + ad_aff * dzua) * problem.up_fin)) /
              xp.maximum(n_fin, 1.0))
    sigma = xp.clip((mu_aff / xp.maximum(mu, eps))**3,
                    sigma_min, sigma_max)

    # ---- corrector (combined) --------------------------------------------
    rmu_l = (sigma * mu - state.xl * state.zl -
             dxla * dzla) * problem.lo_fin
    rmu_u = (sigma * mu - state.xu * state.zu -
             dxua * dzua) * problem.up_fin
    dx, dy, dxl, dxu, dzl, dzu = solve_newton(rmu_l, rmu_u)

    alpha_p = ftb * xp.minimum(max_step(state.xl, dxl, problem.lo_fin),
                               max_step(state.xu, dxu, problem.up_fin))
    alpha_d = ftb * xp.minimum(max_step(state.zl, dzl, problem.lo_fin),
                               max_step(state.zu, dzu, problem.up_fin))

    new_state = IpmState(
        x=state.x + alpha_p * dx,
        xl=xp.where(problem.lo_fin > 0, state.xl + alpha_p * dxl, 1.0),
        xu=xp.where(problem.up_fin > 0, state.xu + alpha_p * dxu, 1.0),
        y=state.y + alpha_d * dy,
        zl=xp.where(problem.lo_fin > 0, state.zl + alpha_d * dzl, 0.0),
        zu=xp.where(problem.up_fin > 0, state.zu + alpha_d * dzu, 0.0))

    # ---- metrics at the new point ----------------------------------------
    rb2, rc2, _, _, _ = _residuals(problem, new_state, xp)
    gap2 = (xp.sum(new_state.xl * new_state.zl * problem.lo_fin) +
            xp.sum(new_state.xu * new_state.zu * problem.up_fin))
    mu2 = gap2 / xp.maximum(n_fin, 1.0)
    pobj = xp.dot(problem.c, new_state.x[:n])
    lo_safe = xp.where(problem.lo_fin > 0, problem.lo, 0.0)
    up_safe = xp.where(problem.up_fin > 0, problem.up, 0.0)
    # dual objective: b'y + l'zl - u'zu + fixed-var contribution
    fixed_mask = 1.0 - problem.active
    c_fixed = xp.concatenate([problem.c, xp.zeros(m, dtype=dtype)])
    z_fixed = (c_fixed - _rmv(problem, new_state.y, xp)) * fixed_mask
    dobj = (xp.dot(problem.b, new_state.y) +
            xp.dot(lo_safe, new_state.zl * problem.lo_fin) -
            xp.dot(up_safe, new_state.zu * problem.up_fin) +
            xp.dot(problem.lo * fixed_mask, z_fixed))
    metrics = IpmMetrics(
        primal_res=xp.linalg.norm(rb2),
        dual_res=xp.linalg.norm(rc2),
        mu=mu2, primal_obj=pobj, dual_obj=dobj,
        alpha_p=alpha_p, alpha_d=alpha_d)
    return new_state, metrics


@partial(jax.jit, static_argnames=("settings", "newton"))
def ipm_step(problem: IpmProblem, state: IpmState, regs: jax.Array,
             settings: Tuple, newton: str = "chol"
             ) -> Tuple[IpmState, IpmMetrics]:
    """One predictor-corrector iteration, fully on device (jitted)."""
    return _ipm_step_impl(problem, state, regs, settings, newton,
                          _JaxLinalg)


def ipm_step_np(problem: IpmProblem, state: IpmState, regs,
                settings: Tuple, newton: str = "chol"
                ) -> Tuple[IpmState, IpmMetrics]:
    """Host (numpy) variant of ipm_step for below-MXU-payoff sizes."""
    with np.errstate(all="ignore"):
        return _ipm_step_impl(problem, state, regs, settings, newton,
                              _NumpyLinalg)


def _starting_point_impl(problem: IpmProblem, la, solve_gram=None):
    """Mehrotra-style least-squares starting point (reference analogue:
    ipx ComputeStartingPoint ipm.cc:23 / HiPO starting-point heuristics).

    x0 = argmin ||x||^2 s.t. K_std x = b  (via one Cholesky of K K' + I),
    y0 = argmin ||c - K_std'y||, then shift slacks/duals positive.
    """
    xp = la.xp
    m, n = problem.a.shape
    dtype = problem.a.dtype
    lo, up = problem.lo, problem.up
    lo_fin, up_fin = problem.lo_fin, problem.up_fin
    fixed = problem.active <= 0

    # Gram matrix of [K, -I_slack]: K K' + slack diag + reg
    if solve_gram is None:
        gram = (problem.a @ problem.a.T +
                xp.diag(problem.slack_mask + 1e-8))
        chol = la.cholesky(gram)

        def solve_gram(rhs):
            return la.cho_solve(chol, rhs)
    # x0 = K'(KK')^-1 b : minimum-norm solution of K_std x = b
    v = solve_gram(problem.b)
    x0 = _rmv(problem, v, xp)
    # y0 from least squares on the cost: K_std K_std' y = K_std c
    c_full = xp.concatenate([problem.c, xp.zeros(m, dtype=dtype)])
    y0 = solve_gram(_mv(problem, c_full, xp))
    z0 = (c_full - _rmv(problem, y0, xp)) * problem.active

    # shift into the interior (Mehrotra's delta heuristics)
    xl_raw = xp.where(lo_fin > 0, x0 - lo, 1.0)
    xu_raw = xp.where(up_fin > 0, up - x0, 1.0)
    shift_p = xp.maximum(0.0, -1.5 * xp.minimum(
        xp.min(xp.where(lo_fin > 0, xl_raw, xp.inf)),
        xp.min(xp.where(up_fin > 0, xu_raw, xp.inf)))) + 0.1
    shift_p = xp.where(xp.isfinite(shift_p), shift_p, 1.0)
    xl0 = xp.where(lo_fin > 0, xl_raw + shift_p, 1.0)
    xu0 = xp.where(up_fin > 0, xu_raw + shift_p, 1.0)

    zl_raw = xp.where(lo_fin > 0, xp.maximum(z0, 0.0), 0.0)
    zu_raw = xp.where(up_fin > 0, xp.maximum(-z0, 0.0), 0.0)
    shift_d = 0.1 + 0.1 * problem.norm_c / xp.sqrt(
        xp.asarray(n + m, dtype=dtype))
    zl0 = xp.where(lo_fin > 0, zl_raw + shift_d, 0.0)
    zu0 = xp.where(up_fin > 0, zu_raw + shift_d, 0.0)

    x_init = xp.where(fixed, lo, x0)
    return IpmState(x=x_init, xl=xl0, xu=xu0, y=y0, zl=zl0, zu=zu0)


@jax.jit
def _starting_point(problem: IpmProblem):
    return _starting_point_impl(problem, _JaxLinalg)


def _starting_point_np(problem: IpmProblem):
    with np.errstate(all="ignore"):
        return _starting_point_impl(problem, _NumpyLinalg)


def _starting_point_sparse(problem: IpmProblem):
    # Sparse-direct starting point: the same least-squares heuristic
    # with K K' factored by the native LDL'; the handle is cached so
    # the first IPM iteration refactors it in place.
    import scipy.sparse as _sp
    from .sparse_ldl import SparseLdl
    a = problem.a
    gram = (a @ a.T +
            _sp.diags(np.asarray(problem.slack_mask) + 1e-8)).tocsc()
    gram.sum_duplicates()
    h = SparseLdl(gram, max_work=80 * gram.nnz + 1_000_000,
                  max_fill=60 * gram.nnz + 1_000_000)
    _LDL_CACHE.clear()
    _LDL_CACHE[id(a)] = h
    with np.errstate(all="ignore"):
        return _starting_point_impl(
            problem, _NumpyLinalg,
            solve_gram=lambda r: h.solve(np.asarray(r)))


def _starting_point_cg(problem: IpmProblem):
    # least-squares starting point with CG on K K' (sparse, host) —
    # the fallback when the direct analysis blows up
    import scipy.sparse.linalg as _spla
    import scipy.sparse as _sp
    a = problem.a
    m = a.shape[0]
    gram = (a @ a.T +
            _sp.diags(np.asarray(problem.slack_mask) + 1e-8)).tocsr()
    dg = np.maximum(np.asarray(gram.diagonal()), 1e-12)
    pre = _spla.LinearOperator((m, m), matvec=lambda v: v / dg)

    def solve_gram(rhs):
        x, _ = _spla.cg(gram, np.asarray(rhs), rtol=1e-12,
                        maxiter=500, M=pre)
        return x
    with np.errstate(all="ignore"):
        return _starting_point_impl(problem, _NumpyLinalg,
                                    solve_gram=solve_gram)


@dataclasses.dataclass
class IpmRunInfo:
    status: HighsModelStatus = HighsModelStatus.kNotset
    iterations: int = 0
    ipm_iterations: int = 0
    primal_obj: float = 0.0
    dual_obj: float = 0.0
    solve_time: float = 0.0


def solve_lp_ipm_native(lp: HighsLp, options: HighsOptions, log=None,
                        x0: Optional[np.ndarray] = None
                        ) -> Tuple[HighsModelStatus, HighsSolution,
                                   IpmRunInfo]:
    """Solve an LP with the dense normal-equations IPM.

    Small problems run entirely on the host (numpy/LAPACK): below
    MXU-payoff size the accelerator adds only backend-init and
    per-shape compile latency — the MIP node/heuristic path calls the
    IPM on toy relaxations with ever-changing shapes, where even
    initializing the jax backend (seconds for a tunneled TPU client)
    dwarfs the solve."""
    host = (lp.num_row <= 1500 and
            lp.num_row * max(1, lp.num_col) <= 2_000_000)
    return _solve_lp_ipm_impl(lp, options, log=log, x0=x0, host=host)


def _solve_lp_ipm_impl(lp: HighsLp, options: HighsOptions, log=None,
                       x0: Optional[np.ndarray] = None,
                       host: bool = False
                       ) -> Tuple[HighsModelStatus, HighsSolution,
                                  IpmRunInfo]:
    t0 = time.perf_counter()
    info = IpmRunInfo()
    deadline = getattr(options, "_solve_deadline", None)
    if deadline is not None and time.perf_counter() > deadline:
        info.status = HighsModelStatus.kTimeLimit
        return info.status, HighsSolution(), info
    if lp.num_row == 0:
        from ..pdlp.wrapper import _solve_bound_lp
        status, sol = _solve_bound_lp(lp)
        info.status = status
        if sol.value_valid:
            info.primal_obj = float(lp.col_cost @ sol.col_value) + lp.offset
        return status, sol, info

    dtype = jnp.float64
    std = preprocess_lp(lp)
    m, n_std = std.num_row, std.num_col

    # solver mode is decided BEFORE materializing K: the sparse-direct
    # path ("ldl", native LDL' of the normal equations) never builds a
    # dense copy and replaces the former m<=8192 dense capacity cap
    newton_opt = getattr(options, "tpu_ipm_newton", "choose")
    # a dense copy of K is m x (n_std) f64; cap the dense working set
    # so a wide (2500 x 5M) or very tall LP never materializes a
    # multi-GB array on the default path
    dense_ok = m * max(1, n_std) <= 50_000_000
    if newton_opt in ("cg", "ldl"):
        newton = newton_opt
    elif newton_opt == "cholesky":
        newton = "chol"
    else:
        # dense Cholesky on the MXU while M fits comfortably dense;
        # sparse direct beyond; matrix-free CG for the very largest
        if m <= 2500 and dense_ok:
            newton = "chol"
        elif m <= 60000:
            newton = "ldl"
        else:
            newton = "cg"
    # "sparse_mode" = K stays a scipy sparse matrix end to end; the
    # CG path's matvecs and Jacobi diagonal both support sparse K, so
    # large CG solves never densify either
    sparse_mode = newton == "ldl" or (newton == "cg" and not dense_ok)
    if sparse_mode:
        host = True

    def _geo_scale_sparse(mat_csr):
        absd = np.abs(mat_csr.data)
        nr = mat_csr.shape[0]
        out = np.ones(nr)
        ptr = mat_csr.indptr
        nz = np.diff(ptr) > 0
        if absd.size:
            amax = np.zeros(nr)
            amin = np.full(nr, np.inf)
            amax[nz] = np.maximum.reduceat(absd, ptr[:-1][nz])
            amin[nz] = np.minimum.reduceat(
                np.where(absd > 0, absd, np.inf), ptr[:-1][nz])
            ok = nz & (amax > 0) & np.isfinite(amin)
            with np.errstate(invalid="ignore"):
                out = np.where(ok, 1.0 / np.sqrt(
                    np.where(ok, amax * amin, 1.0)), 1.0)
        return out

    if sparse_mode:
        import scipy.sparse as _spm
        a_csr = std.a.tocsr()
        row_s = _geo_scale_sparse(a_csr)
        a_rs = (_spm.diags(row_s) @ a_csr).tocsc()
        col_s = _geo_scale_sparse(a_rs.T.tocsr())
        a_scaled = (a_rs @ _spm.diags(col_s)).tocsr()
    else:
        a_np = std.a.toarray()

        # geometric-mean equilibration for numerical stability
        def _geo_scale(mat, axis):
            amax = mat.max(axis=axis, initial=0.0)
            amin = np.where(mat > 0, mat, np.inf).min(axis=axis,
                                                      initial=np.inf)
            ok = (amax > 0) & np.isfinite(amin)
            with np.errstate(invalid="ignore"):
                return np.where(
                    ok, 1.0 / np.sqrt(np.where(ok, amax * amin, 1.0)),
                    1.0)

        abs_a = np.abs(a_np)
        row_s = _geo_scale(abs_a, 1)
        col_s = _geo_scale(np.abs(row_s[:, None] * a_np), 0)
        a_scaled = row_s[:, None] * a_np * col_s[None, :]
    b_scaled = row_s * std.b
    c_scaled = std.c * col_s

    # stacked bounds: x~ = x / col_s; surplus slacks s >= 0 on ineq rows
    with np.errstate(invalid="ignore"):
        lo_x = std.col_lower / col_s
        up_x = std.col_upper / col_s
    is_ineq = (np.arange(m) >= std.num_eq).astype(np.float64)
    lo_slack = np.zeros(m)  # s >= 0 on ineq rows; fixed at 0 on eq rows
    up_slack = np.where(is_ineq > 0, np.inf, 0.0)
    lo = np.concatenate([lo_x, lo_slack])
    up = np.concatenate([up_x, up_slack])

    fixed = np.zeros(n_std + m, dtype=bool)
    with np.errstate(invalid="ignore"):
        fixed[:n_std] = np.isfinite(lo_x) & np.isfinite(up_x) & (
            up_x - lo_x <= 1e-14 * (1.0 + np.abs(lo_x)))
    fixed[n_std:] = is_ineq == 0  # eq-row slacks fixed at 0
    active = (~fixed).astype(np.float64)
    lo_fin = (np.isfinite(lo) & ~fixed).astype(np.float64)
    up_fin = (np.isfinite(up) & ~fixed).astype(np.float64)
    big = 1e30
    lo_dev = np.where(np.isfinite(lo), lo, -big)
    up_dev = np.where(np.isfinite(up), up, big)

    # analytic-centring mode (reference run_centring, ipx/ipm.cc:450):
    # zero objective + near-unit centering parameter drives the iterate
    # to the analytic centre of the feasible region (used by the MIP
    # root's analytic-centre heuristic).  Must happen before the
    # problem pytree is built so the solve itself sees the zero cost.
    centring = bool(getattr(options, "run_centring", False))
    if centring:
        c_scaled = np.zeros_like(c_scaled)

    _asarray = (lambda v, dtype: np.asarray(v, dtype=np.float64)) \
        if host else jnp.asarray
    problem = IpmProblem(
        a=(a_scaled if sparse_mode else _asarray(a_scaled,
                                                 dtype=dtype)),
        b=_asarray(b_scaled, dtype=dtype),
        c=_asarray(c_scaled, dtype=dtype),
        slack_mask=_asarray(is_ineq, dtype=dtype),
        lo=_asarray(lo_dev, dtype=dtype),
        up=_asarray(up_dev, dtype=dtype),
        lo_fin=_asarray(lo_fin, dtype=dtype),
        up_fin=_asarray(up_fin, dtype=dtype),
        active=_asarray(active, dtype=dtype),
        norm_c=_asarray(np.linalg.norm(c_scaled), dtype=dtype),
        norm_b=_asarray(np.linalg.norm(b_scaled), dtype=dtype))

    time_budget = options.time_limit
    if deadline is not None:
        time_budget = min(time_budget,
                          max(0.0, deadline - time.perf_counter()))
    settings = IpmSettings(
        tolerance=options.ipm_optimality_tolerance,
        iteration_limit=(min(options.max_centring_steps, 300) if centring
                         else min(options.ipm_iteration_limit, 300)),
        time_limit=time_budget)
    sett_tuple = ((0.5, 0.99, settings.fraction_to_boundary,
                   settings.theta_max) if centring else
                  (settings.sigma_min, settings.sigma_max,
                   settings.fraction_to_boundary, settings.theta_max))
    regs = np.array([settings.reg_primal, settings.reg_dual])

    if sparse_mode:
        from .sparse_ldl import LdlBlowup
        if newton == "cg":
            state = _starting_point_cg(problem)
        else:
            try:
                state = _starting_point_sparse(problem)
            except LdlBlowup:
                # fill-catastrophic pattern: matrix-free CG Newton
                # instead (still sparse, still host)
                newton = "cg"
                state = _starting_point_cg(problem)
    else:
        state = (_starting_point_np(problem) if host else
                 _starting_point(problem))

    norm_c_h = float(problem.norm_c)
    norm_b_h = float(problem.norm_b)
    it = 0
    status = HighsModelStatus.kNotset
    stall = 0
    best_err = np.inf
    nan_retries = 0
    # user interrupt hook (reference kCallbackIpmInterrupt, fired per
    # IPM iteration — hipo/ipm/Control.cpp:27)
    _cbs = getattr(options, "_callbacks", None)
    while it < settings.iteration_limit:
        if _cbs is not None and _cbs.callback_active(
                _CbT.kCallbackIpmInterrupt):
            _cbs.data_out.ipm_iteration_count = it
            if _cbs.call(_CbT.kCallbackIpmInterrupt, "IPM interrupt"):
                status = HighsModelStatus.kInterrupt
                break
        prev_state = state
        if host:
            state, metrics = ipm_step_np(problem, state, regs,
                                         sett_tuple, newton)
            mh = metrics
        else:
            state, metrics = ipm_step(problem, state,
                                      jnp.asarray(regs, dtype=dtype),
                                      sett_tuple, newton)
            mh = jax.device_get(metrics)
        it += 1
        if not np.isfinite(float(mh.mu)):
            # Cholesky breakdown (degenerate basis as mu -> 0): keep the
            # previous iterate and escalate regularization
            # (reference analogue: HiPO dynamic regularization,
            # FactorHiGHS regularization; IPX switches to stabilized
            # basis preconditioning)
            state = prev_state
            nan_retries += 1
            regs = regs * 100.0
            if nan_retries > 4:
                status = HighsModelStatus.kUnknown
                break
            continue
        pres = float(mh.primal_res)
        dres = float(mh.dual_res)
        mu = float(mh.mu)
        pobj = float(mh.primal_obj)
        dobj = float(mh.dual_obj)
        rel_p = pres / (1.0 + norm_b_h)
        rel_d = dres / (1.0 + norm_c_h)
        rel_gap = abs(pobj - dobj) / (1.0 + abs(pobj) + abs(dobj))
        if log is not None:
            log(f"ipm {it:3d} pobj={pobj:.10e} mu={mu:.2e} "
                f"rp={rel_p:.2e} rd={rel_d:.2e} gap={rel_gap:.2e} "
                f"ap={float(mh.alpha_p):.2f} ad={float(mh.alpha_d):.2f}")
        err = rel_p + rel_d + rel_gap
        if err < best_err * 0.99:
            best_err = err
            stall = 0
        else:
            stall += 1
        if centring:
            # centring termination: primal feasible and the pairwise
            # products x_i z_i within the centring ratio tolerance
            if rel_p < settings.tolerance and it >= 3:
                sh = jax.device_get(state)
                prods = np.concatenate([
                    np.asarray(sh.xl) * np.asarray(sh.zl),
                    np.asarray(sh.xu) * np.asarray(sh.zu)])
                fin = np.concatenate([
                    np.asarray(jax.device_get(problem.lo_fin)) > 0,
                    np.asarray(jax.device_get(problem.up_fin)) > 0])
                prods = prods[fin]
                prods = prods[prods > 0]
                if len(prods) == 0 or (prods.max() <=
                                       options.centring_ratio_tolerance *
                                       max(prods.min(), 1e-300)):
                    status = HighsModelStatus.kOptimal
                    break
        elif (rel_p < settings.tolerance and rel_d < settings.tolerance
                and rel_gap < settings.tolerance):
            status = HighsModelStatus.kOptimal
            break
        if float(mh.alpha_p) < 1e-8 and float(mh.alpha_d) < 1e-8:
            stall += 5
        if stall > 12:
            status = HighsModelStatus.kUnknown
            break
        if time.perf_counter() - t0 > settings.time_limit:
            status = HighsModelStatus.kTimeLimit
            break
    if status == HighsModelStatus.kNotset:
        status = HighsModelStatus.kIterationLimit

    # ---- recover original-space solution ---------------------------------
    sh = jax.device_get(state)
    xs = np.asarray(sh.x, dtype=np.float64)
    y_sc = np.asarray(sh.y, dtype=np.float64)
    # unscale standard-form quantities: x = col_s x~, y = row_s y~,
    # z = z~ / col_s where z~ = c~ - K~'y~
    x_std = xs[:n_std] * col_s
    y_std = y_sc * row_s
    z_std = (c_scaled - (y_sc @ a_scaled)) / col_s

    col_value, row_dual, col_dual = recover_solution(
        std, x_std, y_std, z_std)
    row_value = lp.a_matrix.to_scipy() @ col_value
    sol = HighsSolution(
        value_valid=True, dual_valid=True,
        col_value=col_value, col_dual=col_dual,
        row_value=row_value, row_dual=row_dual)
    info.status = status
    info.iterations = it
    info.ipm_iterations = it
    info.primal_obj = float(lp.col_cost @ col_value) + lp.offset
    info.solve_time = time.perf_counter() - t0
    return status, sol, info
