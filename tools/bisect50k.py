"""Bisect the flagship 50k PDHG wrapper path on real hardware.

Times every stage of the wrapper pipeline separately so we can see
where the ~150s went (BENCH_r02: 40 iters / 153 s, judge measured the
raw kernel at ~50k iters/s)."""
import sys
import time

import numpy as np

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
    log("generating problem")
    A, b, c = synth50k()
    n, m = A.shape[1], A.shape[0]
    log(f"problem ready nnz={A.nnz}")

    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix
    from highs_tpu.options import HighsOptions
    log("imports done")

    lp = HighsLp(
        num_col=n, num_row=m, col_cost=c,
        col_lower=np.zeros(n), col_upper=np.full(n, 10.0),
        row_lower=b, row_upper=np.full(m, np.inf),
        a_matrix=HighsSparseMatrix.from_scipy(A), sense=1)
    opts = HighsOptions()
    opts.solver = "hipdlp"
    opts.time_limit = 600.0
    opts.output_flag = False
    log("lp built")

    # --- replicate wrapper stages with timing ---
    import jax
    import jax.numpy as jnp
    from highs_tpu.solvers.pdlp.preprocess import preprocess_lp
    from highs_tpu.solvers.pdlp.scaling import scale_problem
    from highs_tpu.ops import linops
    log(f"jax devices: {jax.devices()}")

    std = preprocess_lp(lp)
    log(f"preprocess done: m={std.num_row} n={std.num_col}")
    scaled_a, scales = scale_problem(
        std.a, mode=opts.pdlp_scaling_mode,
        ruiz_iterations=opts.pdlp_ruiz_iterations)
    log("scaling done")

    dtype = jnp.float64 if opts.tpu_dtype == "float64" else jnp.float32
    from highs_tpu.solvers.pdlp.wrapper import _bucket
    n_pad, m_pad = _bucket(std.num_col), _bucket(std.num_row)
    log(f"pad: {std.num_row}x{std.num_col} -> {m_pad}x{n_pad}")
    import scipy.sparse as _sp
    scaled_pad = _sp.csr_matrix(
        (scaled_a.data, scaled_a.indices,
         np.concatenate([scaled_a.indptr,
                         np.full(m_pad - std.num_row,
                                 scaled_a.indptr[-1],
                                 dtype=scaled_a.indptr.dtype)])),
        shape=(m_pad, n_pad))
    log("pad matrix done")
    k_op = linops.from_scipy(scaled_pad, fmt=opts.tpu_matrix_format,
                             dtype=dtype)
    log(f"linop built: {type(k_op).__name__}")
    if hasattr(k_op, "idx"):
        log(f"  ell width={k_op.idx.shape} wt={k_op.idx_t.shape} "
            f"tail={k_op.tail_seg.shape} tail_t={k_op.tail_seg_t.shape}")
    jax.block_until_ready(jax.tree.leaves(k_op))
    log("linop on device")

    from highs_tpu.solvers.pdlp.pdhg import power_method
    nk = power_method(k_op, n_pad, 30, dtype)
    jax.block_until_ready(nk)
    log(f"power_method done ||K||={float(nk):.4f}")

    # now run the full wrapper
    from highs_tpu.solvers.pdlp.wrapper import solve_lp_pdlp
    opts.time_limit = 120.0
    t0 = time.perf_counter()
    st, sol, info = solve_lp_pdlp(lp, opts)
    dt = time.perf_counter() - t0
    log(f"wrapper solve done: status={st} iters={info.iterations} "
        f"dt={dt:.2f}s iters/s={info.iterations/dt:.1f} "
        f"obj={info.primal_obj:.4f}")


if __name__ == "__main__":
    main()
