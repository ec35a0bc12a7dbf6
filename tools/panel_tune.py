"""Tune the panel-ELL SpMV: width, panel size, dtype, sortedness."""
import os
import time

import numpy as np

os.makedirs('/root/repo/.xla_cache', exist_ok=True)
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - T0:8.2f}s] {msg}", flush=True)


def chain_bench(fn, x, name, K=24, reps=2):
    @jax.jit
    def chained(x):
        def body(_, v):
            w = fn(v)
            return w * (1.0 / (1.0 + jnp.max(jnp.abs(w))))
        v = jax.lax.fori_loop(0, K, body, x)
        return jnp.sum(v)
    _ = jax.device_get(chained(x))
    best = 1e9
    for _ in range(reps):
        t = time.perf_counter()
        _ = jax.device_get(chained(x))
        best = min(best, (time.perf_counter() - t) / K)
    log(f"{name}: {best*1000:.3f} ms/mv")
    return best


def build_panel_ell(A, w_cap_pct, panel, dtype):
    """ELL with width at percentile cap + COO tail; panel/lane split."""
    m, n = A.shape
    cnt = np.diff(A.indptr)
    w = max(1, int(np.percentile(cnt, w_cap_pct)))
    idx_panel = np.zeros((m, w), np.int32)
    idx_lane = np.zeros((m, w), np.int32)
    val = np.zeros((m, w), np.float64)
    take = np.minimum(cnt, w)
    for k in range(w):
        sel = take > k
        pos = A.indptr[:-1][sel] + k
        idx_panel[sel, k] = A.indices[pos] // panel
        idx_lane[sel, k] = A.indices[pos] % panel
        val[sel, k] = A.data[pos]
    spill_rows = np.nonzero(cnt > w)[0]
    segs, colss, valss = [], [], []
    for r in spill_rows:
        s, e = A.indptr[r] + w, A.indptr[r + 1]
        segs.append(np.full(e - s, r, np.int32))
        colss.append(A.indices[s:e])
        valss.append(A.data[s:e])
    if segs:
        seg = np.concatenate(segs)
        col = np.concatenate(colss).astype(np.int32)
        tv = np.concatenate(valss)
    else:
        seg = np.zeros(0, np.int32)
        col = np.zeros(0, np.int32)
        tv = np.zeros(0)
    return (w, jnp.asarray(idx_panel), jnp.asarray(idx_lane),
            jnp.asarray(val, dtype), jnp.asarray(seg), jnp.asarray(col),
            jnp.asarray(tv, dtype), len(seg) and len(seg) or 0)


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
    x_np = rng.standard_normal(n).astype(np.float32)
    y_ref = (A @ x_np.astype(np.float64))
    x = jnp.asarray(x_np)

    for (pct, panel, dt, sort_flag) in [
            (100, 128, jnp.float32, False),
            (97, 128, jnp.float32, False),
            (97, 32, jnp.float32, False),
            (97, 64, jnp.float32, False),
            (97, 128, jnp.bfloat16, False),
            (90, 128, jnp.float32, False),
    ]:
        w, ip, il, vv, seg, col, tv, tn = build_panel_ell(
            A, pct, panel, dt)

        def mv(v, ip=ip, il=il, vv=vv, seg=seg, col=col, tv=tv,
               panel=panel, w=w, dt=dt):
            xp = v.astype(dt).reshape(n // panel, panel)
            lane = jnp.arange(panel, dtype=jnp.int32)
            out = jnp.zeros((m,), jnp.float32)
            for k in range(w):
                rowsx = xp[ip[:, k]]
                pick = jnp.sum(jnp.where(lane[None, :] == il[:, k, None],
                                         rowsx, 0).astype(jnp.float32),
                               axis=1)
                out = out + vv[:, k].astype(jnp.float32) * pick
            if seg.shape[0]:
                out = out + jax.ops.segment_sum(
                    tv.astype(jnp.float32) * v[col].astype(jnp.float32),
                    seg, num_segments=m, indices_are_sorted=True)
            return out

        r = jax.device_get(jax.jit(mv)(x))
        err = np.abs(r - y_ref).max() / np.abs(y_ref).max()
        name = f"pct={pct} panel={panel} {np.dtype(dt).name} w={w} tail={tn}"
        chain_bench(mv, x, name)
        log(f"   err={err:.2e}")


if __name__ == "__main__":
    main()
