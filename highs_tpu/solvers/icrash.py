"""ICrash — iterative crash starting-point heuristic.

Re-implements the behavior of the reference ICrash
(highs/presolve/ICrash.cpp / ICrashX.cpp): an augmented-Lagrangian /
quadratic-penalty method that produces an approximately feasible,
low-cost point (and multiplier estimate) used to warm-start the
LP solvers (strategies kPenalty/kAdmm/kICA, ICrash.h:20-40).

TPU-first formulation: each outer iteration approximately minimizes

    Phi(x) = w c'x + lambda' r(x) + (1/(2 mu)) ||r(x)||^2,
    r(x) = Ax - clamp(Ax, rl, ru)

over the box [l, u] with `icrash_approx_iter` projected-gradient steps
— one jitted lax.fori_loop of matvec + elementwise ops — then updates
lambda <- lambda + r/mu and tightens mu.  The objective weight w ramps
from icrash_starting_weight toward 1 so early iterations prioritize
feasibility (the reference's strategy)."""
from __future__ import annotations

import dataclasses
import math
import time
from functools import partial

import numpy as np

from ..constants import HighsModelStatus
from ..models.lp import HighsLp
from ..options import HighsOptions


@dataclasses.dataclass
class ICrashInfo:
    """Mirror of the reference ICrashInfo record."""
    num_iterations: int = 0
    final_lambda_norm2: float = 0.0
    final_residual_norm2: float = 0.0
    starting_weight: float = 0.0
    total_time: float = 0.0
    x: object = None
    lambda_: object = None


def run_icrash(lp: HighsLp, options: HighsOptions, log=None) -> ICrashInfo:
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    info = ICrashInfo(starting_weight=options.icrash_starting_weight)
    n, m = lp.num_col, lp.num_row
    from .pdlp.wrapper import _resolve_dtype
    dtype = (jnp.float64 if _resolve_dtype(options, None) == "float64"
             else jnp.float32)

    a = lp.a_matrix.to_scipy().tocsr()
    a_dense = jnp.asarray(a.toarray(), dtype=dtype) if n * m and \
        n * m <= 4_000_000 else None
    sense = float(lp.sense)
    c = jnp.asarray(sense * lp.col_cost, dtype=dtype)
    big = 1e20
    lo = jnp.asarray(np.where(np.isfinite(lp.col_lower), lp.col_lower,
                              -big), dtype=dtype)
    up = jnp.asarray(np.where(np.isfinite(lp.col_upper), lp.col_upper,
                              big), dtype=dtype)
    rl = jnp.asarray(np.where(np.isfinite(lp.row_lower), lp.row_lower,
                              -big), dtype=dtype)
    ru = jnp.asarray(np.where(np.isfinite(lp.row_upper), lp.row_upper,
                              big), dtype=dtype)

    if a_dense is not None:
        mv = lambda x: a_dense @ x
        rmv = lambda y: a_dense.T @ y
        norm_a = float(np.linalg.norm(a.toarray(), 2)) if m else 1.0
    else:
        import jax.experimental.sparse as jsparse
        a_bcoo = jsparse.BCOO.from_scipy_sparse(a.tocoo())
        mv = lambda x: a_bcoo @ x
        rmv = lambda y: a_bcoo.T @ y
        # cheap spectral bound
        norm_a = float(np.sqrt(abs(a).sum(axis=0).max() *
                               abs(a).sum(axis=1).max())) if m else 1.0

    approx_iter = options.icrash_approx_iter

    @partial(jax.jit, static_argnames=())
    def inner(x, lam, w, rho):
        step = 1.0 / (rho * norm_a * norm_a + 1e-12)

        def body(_, x):
            ax = mv(x)
            r = ax - jnp.clip(ax, rl, ru)
            g = w * c + rmv(lam + rho * r)
            return jnp.clip(x - step * g, lo, up)

        x = jax.lax.fori_loop(0, approx_iter, body, x)
        ax = mv(x)
        r = ax - jnp.clip(ax, rl, ru)
        return x, r

    x = jnp.clip(jnp.zeros((n,), dtype=dtype), lo, up)
    lam = jnp.zeros((m,), dtype=dtype)
    w = options.icrash_starting_weight
    mu = 1.0
    iters = max(1, min(options.icrash_iterations, 200))
    for k in range(iters):
        rho = 1.0 / mu
        x, r = inner(x, lam, w, rho)
        lam = lam + rho * r
        res = float(jnp.linalg.norm(r))
        if log is not None:
            log(f"iCrash {k + 1:3d}: residual {res:.3e} weight {w:.1e}")
        info.num_iterations = k + 1
        if res <= 1e-9 * (1.0 + float(jnp.linalg.norm(ru))):
            break
        mu *= 0.7
        w = min(1.0, w * 10.0)

    info.final_residual_norm2 = float(jnp.linalg.norm(r)) if m else 0.0
    info.final_lambda_norm2 = float(jnp.linalg.norm(lam)) if m else 0.0
    info.total_time = time.perf_counter() - t0
    info.x = np.asarray(jax.device_get(x), dtype=np.float64)
    # multiplier for L <= Ax <= U in the original sense: y = -sense*lam
    info.lambda_ = -sense * np.asarray(jax.device_get(lam),
                                       dtype=np.float64)
    return info
