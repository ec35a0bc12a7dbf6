"""SpMV timing with forced value transfer (device_get) every call —
the only reliable sync on the tunneled axon backend."""
import os, sys
sys.path.insert(0, "/root/repo")
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

    # pure transfer latency
    tiny = jnp.zeros((4,), jnp.float32)
    _ = jax.device_get(tiny)
    for i in range(3):
        t = time.perf_counter()
        _ = jax.device_get(tiny)
        log(f"tiny device_get: {(time.perf_counter()-t)*1000:.1f} ms")

    from highs_tpu.ops import linops
    ell = linops.from_scipy_ell(A, dtype=jnp.float32)
    _ = jax.device_get(ell.idx[0, 0])

    def chain_factory(op_mv, name):
        def make(K):
            @jax.jit
            def chain(x):
                def body(_, v):
                    w = op_mv(v)
                    return w * (1.0 / (1.0 + jnp.max(jnp.abs(w))))
                v = jax.lax.fori_loop(0, K, body, x)
                return jnp.sum(v)
            return chain
        # warm both lengths
        c8, c64 = make(8), make(64)
        _ = jax.device_get(c8(x)); _ = jax.device_get(c64(x))
        for _ in range(2):
            t = time.perf_counter()
            _ = jax.device_get(c8(x))
            dt8 = time.perf_counter() - t
            t = time.perf_counter()
            _ = jax.device_get(c64(x))
            dt64 = time.perf_counter() - t
            per = (dt64 - dt8) / 56
            log(f"{name}: 8-chain {dt8*1000:.0f}ms 64-chain "
                f"{dt64*1000:.0f}ms -> {per*1000:.2f} ms/mv")

    def elem_mv(v):
        return ell.mv(v)[:n]
    chain_factory(elem_mv, "elem-ELL")

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
    _ = jax.device_get(ip[0, 0])

    def panel_mv(v):
        xp = v.reshape(n // 128, 128)
        lane = jnp.arange(128, dtype=jnp.int32)
        out = jnp.zeros((m,), v.dtype)
        for k in range(w):
            rowsx = xp[ip[:, k]]
            sel = (lane[None, :] == il[:, k, None])
            out = out + vv[:, k] * jnp.sum(jnp.where(sel, rowsx, 0), axis=1)
        return out
    chain_factory(panel_mv, "panel-ELL")


if __name__ == "__main__":
    main()
