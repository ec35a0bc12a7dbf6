"""Measure per-block dispatch/steady-state cost of pdhg_block on TPU."""
import os
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


def main():
    import scipy.sparse as sp
    rng = np.random.default_rng(42)
    m = n = 50176
    per_col = 10
    rows = rng.integers(0, m, size=(n, per_col))
    cols = np.repeat(np.arange(n), per_col)
    vals = rng.standard_normal(n * per_col)
    A = sp.csr_matrix((vals, (rows.ravel(), cols)), shape=(m, n))

    from highs_tpu.ops import linops
    from highs_tpu.solvers.pdlp.pdhg import (
        PdhgProblem, PdhgState, pdhg_block, power_method)

    dtype = jnp.float32
    k_op = linops.from_scipy_ell(A, dtype=dtype)
    ones_n = jnp.ones((n,), dtype)
    ones_m = jnp.ones((m,), dtype)
    problem = PdhgProblem(
        k_op=k_op, b=ones_m, c=ones_n,
        lo=jnp.zeros((n,), dtype), up=ones_n * 10,
        is_eq=jnp.zeros((m,), dtype), lo_fin=ones_n, up_fin=ones_n,
        inv_row_scale=ones_m, inv_col_scale=ones_n,
        norm_b=jnp.asarray(1.0, dtype), norm_c=jnp.asarray(1.0, dtype))
    state = PdhgState(
        x=jnp.zeros((n,), dtype), y=jnp.zeros((m,), dtype),
        x_pd=jnp.zeros((n,), dtype), y_pd=jnp.zeros((m,), dtype),
        x_anchor=jnp.zeros((n,), dtype), y_anchor=jnp.zeros((m,), dtype),
        aty=jnp.zeros((n,), dtype),
        k=jnp.zeros((), jnp.int32),
        eta=jnp.asarray(0.5, dtype), omega=jnp.asarray(1.0, dtype))
    jax.block_until_ready(jax.tree.leaves(problem))
    log("problem on device")

    # measure trivial round-trip latency
    f = jax.jit(lambda x: x + 1.0)
    z = jnp.asarray(1.0, dtype)
    z = f(z); jax.block_until_ready(z)
    t = time.perf_counter()
    for _ in range(10):
        z = f(z)
        _ = float(z)
    log(f"tiny jit roundtrip: {(time.perf_counter()-t)/10*1000:.1f} ms")

    # single matvec timing
    mv = jax.jit(lambda op, x: op.mv(x))
    r = mv(k_op, ones_n); jax.block_until_ready(r)
    t = time.perf_counter()
    for _ in range(20):
        r = mv(k_op, r[:n] * 0 + 1)
    jax.block_until_ready(r)
    log(f"mv: {(time.perf_counter()-t)/20*1000:.2f} ms")

    rmvf = jax.jit(lambda op, y: op.rmv(y))
    r2 = rmvf(k_op, ones_m); jax.block_until_ready(r2)
    t = time.perf_counter()
    for _ in range(20):
        r2 = rmvf(k_op, ones_m)
    jax.block_until_ready(r2)
    log(f"rmv: {(time.perf_counter()-t)/20*1000:.2f} ms")

    # first block (compile)
    t = time.perf_counter()
    state, metrics = pdhg_block(problem, state, 40, 1.0, None)
    jax.block_until_ready(metrics.primal_res)
    log(f"block(40) first: {time.perf_counter()-t:.2f}s")

    for steps in (40, 40, 320, 320, 2560, 2560):
        t = time.perf_counter()
        state, metrics = pdhg_block(problem, state, steps, 1.0, None)
        m_host = jax.device_get(metrics)
        dt = time.perf_counter() - t
        log(f"block({steps}): {dt*1000:.1f} ms -> {steps/dt:.0f} iters/s "
            f"(pres={float(m_host.primal_res):.3e})")


if __name__ == "__main__":
    main()
