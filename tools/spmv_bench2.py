"""Trustworthy SpMV timing: dependent chains inside ONE jit call."""
import os
import time

import numpy as np

cache_dir = "/root/repo/.xla_cache"
os.makedirs(cache_dir, exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
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
    A.sum_duplicates()
    x_np = rng.standard_normal(n)
    log(f"nnz={A.nnz}")
    x = jnp.asarray(x_np, jnp.float32)

    from highs_tpu.ops import linops
    ell = linops.from_scipy_ell(A, dtype=jnp.float32)
    jax.block_until_ready(jax.tree.leaves(ell))

    K = 50  # chain length

    @jax.jit
    def chain_elem(op, x):
        def body(_, v):
            w = op.mv(v)
            return w[:n] * (1.0 / (1.0 + jnp.max(jnp.abs(w))))
        return jax.lax.fori_loop(0, K, body, x)

    r = chain_elem(ell, x); jax.block_until_ready(r)
    t = time.perf_counter()
    for _ in range(3):
        r = chain_elem(ell, r)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t) / (3 * K)
    log(f"elem-ELL chained mv: {dt*1000:.3f} ms/mv")

    # panel-ELL
    cnt = np.diff(A.indptr)
    w = int(cnt.max())
    idx_panel = np.zeros((m, w), np.int32)
    idx_lane = np.zeros((m, w), np.int32)
    val = np.zeros((m, w), np.float32)
    for k in range(w):
        sel = cnt > k
        pos = A.indptr[:-1][sel] + k
        idx_panel[sel, k] = A.indices[pos] // 128
        idx_lane[sel, k] = A.indices[pos] % 128
        val[sel, k] = A.data[pos]
    ip = jnp.asarray(idx_panel)
    il = jnp.asarray(idx_lane)
    vv = jnp.asarray(val)

    @jax.jit
    def chain_panel(ip, il, vv, x):
        lane = jnp.arange(128, dtype=jnp.int32)

        def one(v):
            xp = v.reshape(n // 128, 128)
            out = jnp.zeros((m,), v.dtype)
            for k in range(w):
                rowsx = xp[ip[:, k]]
                sel = (lane[None, :] == il[:, k, None])
                out = out + vv[:, k] * jnp.sum(
                    jnp.where(sel, rowsx, 0), axis=1)
            return out

        def body(_, v):
            o = one(v)
            return o * (1.0 / (1.0 + jnp.max(jnp.abs(o))))
        return jax.lax.fori_loop(0, K, body, x)

    r = chain_panel(ip, il, vv, x); jax.block_until_ready(r)
    t = time.perf_counter()
    for _ in range(3):
        r = chain_panel(ip, il, vv, r)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t) / (3 * K)
    log(f"panel-ELL chained mv: {dt*1000:.3f} ms/mv")


if __name__ == "__main__":
    main()
