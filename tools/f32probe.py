"""Probe: f32 PDHG raw path on the 50k synthetic + persistent-cache check."""
import os
import sys
import time

import numpy as np

cache_dir = "/root/repo/.xla_cache"
os.makedirs(cache_dir, exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - T0:8.2f}s] {msg}", flush=True)


def synth50k():
    import scipy.sparse as sp
    rng = np.random.default_rng(42)
    m = n = 50000
    per_col = 10
    rows = rng.integers(0, m, size=(n, per_col))
    cols = np.repeat(np.arange(n), per_col)
    vals = rng.standard_normal(n * per_col)
    A = sp.csc_matrix((vals, (rows.ravel(), cols)), shape=(m, n))
    A.sum_duplicates()
    xstar = rng.uniform(0, 1, n)
    b = A @ xstar - np.abs(rng.standard_normal(m)) * 0.1
    c = rng.uniform(0.1, 1.0, n)
    return A, b, c


def main():
    A, b, c = synth50k()
    n, m = A.shape
    log(f"problem ready, devices={jax.devices()}")

    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.pdlp.preprocess import preprocess_lp
    from highs_tpu.solvers.pdlp.scaling import scale_problem
    from highs_tpu.solvers.pdlp.wrapper import _bucket
    from highs_tpu.solvers.pdlp.pdhg import (
        PdhgProblem, PdhgSettings, solve_pdhg, power_method)
    from highs_tpu.ops import linops
    import scipy.sparse as _sp

    lp = HighsLp(
        num_col=n, num_row=m, col_cost=c,
        col_lower=np.zeros(n), col_upper=np.full(n, 10.0),
        row_lower=b, row_upper=np.full(m, np.inf),
        a_matrix=HighsSparseMatrix.from_scipy(A), sense=1)
    std = preprocess_lp(lp)
    scaled_a, scales = scale_problem(std.a, mode=2, ruiz_iterations=10)
    dr, dc = scales.row_scale, scales.col_scale
    dtype = jnp.float32
    n_pad, m_pad = _bucket(std.num_col), _bucket(std.num_row)
    scaled_pad = _sp.csr_matrix(
        (scaled_a.data, scaled_a.indices,
         np.concatenate([scaled_a.indptr,
                         np.full(m_pad - std.num_row,
                                 scaled_a.indptr[-1],
                                 dtype=scaled_a.indptr.dtype)])),
        shape=(m_pad, n_pad))
    k_op = linops.from_scipy(scaled_pad, fmt="choose", dtype=dtype)
    log(f"linop built {type(k_op).__name__}")

    b_s = dr * std.b
    c_s = dc * std.c
    lo_s = np.where(np.isfinite(std.col_lower), std.col_lower / dc,
                    std.col_lower)
    up_s = np.where(np.isfinite(std.col_upper), std.col_upper / dc,
                    std.col_upper)
    is_eq = (np.arange(std.num_row) < std.num_eq).astype(np.float64)
    lo_fin = np.isfinite(std.col_lower).astype(np.float64)
    up_fin = np.isfinite(std.col_upper).astype(np.float64)
    big = np.float32(np.finfo(np.float32).max / 4)
    lo_dev = np.where(np.isfinite(lo_s), lo_s, -big)
    up_dev = np.where(np.isfinite(up_s), up_s, big)

    def padc(v, fill):
        return np.concatenate(
            [v, np.full(n_pad - std.num_col, fill, dtype=v.dtype)])

    def padr(v, fill):
        return np.concatenate(
            [v, np.full(m_pad - std.num_row, fill, dtype=v.dtype)])

    problem = PdhgProblem(
        k_op=k_op,
        b=jnp.asarray(padr(b_s, 0.0), dtype=dtype),
        c=jnp.asarray(padc(c_s, 0.0), dtype=dtype),
        lo=jnp.asarray(padc(lo_dev, 0.0), dtype=dtype),
        up=jnp.asarray(padc(up_dev, 0.0), dtype=dtype),
        is_eq=jnp.asarray(padr(is_eq, 1.0), dtype=dtype),
        lo_fin=jnp.asarray(padc(lo_fin, 1.0), dtype=dtype),
        up_fin=jnp.asarray(padc(up_fin, 1.0), dtype=dtype),
        inv_row_scale=jnp.asarray(padr(1.0 / dr, 1.0), dtype=dtype),
        inv_col_scale=jnp.asarray(padc(1.0 / dc, 1.0), dtype=dtype),
        norm_b=jnp.asarray(np.linalg.norm(std.b), dtype=dtype),
        norm_c=jnp.asarray(np.linalg.norm(std.c), dtype=dtype))
    log("problem on device")

    t = time.perf_counter()
    nk = power_method(problem.k_op, n_pad, 30, dtype)
    jax.block_until_ready(nk)
    log(f"power_method f32: {time.perf_counter()-t:.2f}s ||K||={float(nk):.4f}")

    settings = PdhgSettings(eps_optimal=2e-6, time_limit=300.0,
                            dtype="float32")
    t = time.perf_counter()
    res = solve_pdhg(problem, n_pad, m_pad, settings, offset=std.offset)
    dt = time.perf_counter() - t
    log(f"f32 solve: status={res.status} iters={res.iterations} "
        f"dt={dt:.2f}s iters/s={res.iterations/dt:.0f} "
        f"obj={res.primal_obj:.4f} relgap={res.rel_gap:.2e} "
        f"pres={res.primal_res:.2e} dres={res.dual_res:.2e} "
        f"restarts={res.restarts}")


if __name__ == "__main__":
    main()
