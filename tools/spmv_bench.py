"""Benchmark SpMV formulations for unstructured sparsity on TPU.

Candidates:
  A) element-gather ELL (current EllMatrix.mv)
  B) panel-ELL: gather 128-wide x panels by row, select lane via onehot
  C) flat COO row-gather + sorted segment_sum
  D) panel-ELL bf16
"""
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


def timeit(f, *args, n=20, name=""):
    r = f(*args)
    jax.block_until_ready(r)
    t = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t) / n
    log(f"{name}: {dt*1000:.3f} ms")
    return r, dt


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
    y_ref = A @ x_np
    log(f"nnz={A.nnz}")

    x = jnp.asarray(x_np, jnp.float32)

    # --- A: current element-gather ELL ---
    from highs_tpu.ops import linops
    ell = linops.from_scipy_ell(A, dtype=jnp.float32)
    mv = jax.jit(lambda op, x: op.mv(x))
    r, dt = timeit(mv, ell, x, name="A element-ELL mv")
    err = np.abs(np.asarray(r) - y_ref).max() / np.abs(y_ref).max()
    log(f"   err={err:.2e}")

    # --- B: panel-ELL ---
    # per row: entries grouped by column panel p=c//128; for each
    # (row, panel) pair store panel id + a 128-dense value vector?  No:
    # store panel id, lane, value per ENTRY but pad per-row ENTRY count
    # to w (same as ELL), gather the 128-wide panel per entry and select
    # the lane with an iota==lane compare.
    cnt = np.diff(A.indptr)
    w = int(cnt.max())
    log(f"ELL width={w}")
    idx_panel = np.zeros((m, w), np.int32)
    idx_lane = np.zeros((m, w), np.int32)
    val = np.zeros((m, w), np.float32)
    for k in range(w):
        sel = cnt > k
        pos = A.indptr[:-1][sel] + k
        idx_panel[sel, k] = A.indices[pos] // 128
        idx_lane[sel, k] = A.indices[pos] % 128
        val[sel, k] = A.data[pos]
    xp_shape = (n // 128, 128)

    ip = jnp.asarray(idx_panel)
    il = jnp.asarray(idx_lane)
    vv = jnp.asarray(val)

    @jax.jit
    def panel_mv(ip, il, vv, x):
        xp = x.reshape(xp_shape)
        lane_iota = jnp.arange(128, dtype=jnp.int32)
        out = jnp.zeros((m,), x.dtype)
        for k in range(w):
            rowsx = xp[ip[:, k]]                      # (m, 128) row gather
            sel = (lane_iota[None, :] == il[:, k, None])
            out = out + vv[:, k] * jnp.sum(jnp.where(sel, rowsx, 0), axis=1)
        return out

    r, dt = timeit(panel_mv, ip, il, vv, x, name="B panel-ELL mv")
    err = np.abs(np.asarray(r) - y_ref).max() / np.abs(y_ref).max()
    log(f"   err={err:.2e}")

    # --- B2: panel-ELL via take along axis on flattened idx ---
    @jax.jit
    def panel_mv2(ip, il, vv, x):
        xp = x.reshape(xp_shape)
        rowsx = xp[ip]                                # (m, w, 128)
        sel = (jnp.arange(128, dtype=jnp.int32)[None, None, :]
               == il[:, :, None])
        picked = jnp.sum(jnp.where(sel, rowsx, 0), axis=2)   # (m, w)
        return jnp.sum(vv * picked, axis=1)

    r, dt = timeit(panel_mv2, ip, il, vv, x, name="B2 panel-ELL-3d mv")
    err = np.abs(np.asarray(r) - y_ref).max() / np.abs(y_ref).max()
    log(f"   err={err:.2e}")

    # --- C: flat sorted-COO row-gather + segment_sum ---
    coo = A.tocoo()
    order = np.argsort(coo.row, kind="stable")
    seg = jnp.asarray(coo.row[order].astype(np.int32))
    fp = jnp.asarray((coo.col[order] // 128).astype(np.int32))
    fl = jnp.asarray((coo.col[order] % 128).astype(np.int32))
    fv = jnp.asarray(coo.data[order].astype(np.float32))

    @jax.jit
    def flat_mv(seg, fp, fl, fv, x):
        xp = x.reshape(xp_shape)
        rowsx = xp[fp]                                # (nnz, 128)
        sel = (jnp.arange(128, dtype=jnp.int32)[None, :] == fl[:, None])
        picked = jnp.sum(jnp.where(sel, rowsx, 0), axis=1)
        return jax.ops.segment_sum(fv * picked, seg, num_segments=m,
                                   indices_are_sorted=True)

    r, dt = timeit(flat_mv, seg, fp, fl, fv, x, name="C flat-COO mv")
    err = np.abs(np.asarray(r) - y_ref).max() / np.abs(y_ref).max()
    log(f"   err={err:.2e}")

    # --- D: B2 in bf16 ---
    vb = vv.astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)

    @jax.jit
    def panel_mv_bf16(ip, il, vb, xb):
        xp = xb.reshape(xp_shape)
        rowsx = xp[ip]
        sel = (jnp.arange(128, dtype=jnp.int32)[None, None, :]
               == il[:, :, None])
        picked = jnp.sum(jnp.where(sel, rowsx, 0).astype(jnp.float32),
                         axis=2)
        return jnp.sum(vb.astype(jnp.float32) * picked, axis=1)

    r, dt = timeit(panel_mv_bf16, ip, il, vb, xb, name="D panel-ELL bf16 mv")
    err = np.abs(np.asarray(r) - y_ref).max() / np.abs(y_ref).max()
    log(f"   err={err:.2e}")

    # --- E: one-hot matmul by column panel (MXU) ---
    # sort nnz by column panel; for each panel, onehot(lane) @ x_panel
    orderc = np.argsort(coo.col // 128, kind="stable")
    log("done")


if __name__ == "__main__":
    main()
