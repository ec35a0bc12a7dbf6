"""Pallas same-shape take_along_axis: semantics + speed."""
import os
import time

import numpy as np

os.makedirs('/root/repo/.xla_cache', exist_ok=True)
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - T0:8.2f}s] {msg}", flush=True)


def run_case(shape, idx_max, name):
    rng = np.random.default_rng(0)
    src_np = rng.standard_normal(shape).astype(np.float32)
    idx_np = rng.integers(0, idx_max, shape).astype(np.int32)
    src = jnp.asarray(src_np)
    idx = jnp.asarray(idx_np)

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:, :], i_ref[:, :], axis=1)

    try:
        f = jax.jit(lambda s, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, i))
        r = jax.device_get(f(src, idx))
        expect = np.take_along_axis(src_np, idx_np, axis=1)
        ok = np.allclose(r, expect)
        if not ok:
            # check within-128-group hypothesis
            g = (np.arange(shape[1]) // 128)[None, :]
            idx_mod = (idx_np % 128) + g * 128
            idx_mod = np.minimum(idx_mod, shape[1] - 1)
            alt = np.take_along_axis(src_np, idx_mod, axis=1)
            ok_mod = np.allclose(r, alt)
            log(f"{name}: ran, full-range correct=False, "
                f"within-group-semantics={ok_mod}")
        else:
            log(f"{name}: correct=True")
        # timing via chained fori_loop
        @jax.jit
        def chained(s, i):
            def body(_, acc):
                r = f(s, i)
                return acc + r[0, 0]
            return jax.lax.fori_loop(0, 32, body, jnp.zeros((), jnp.float32))
        _ = jax.device_get(chained(src, idx))
        t = time.perf_counter()
        _ = jax.device_get(chained(src, idx))
        dt = (time.perf_counter() - t) / 32
        n_el = shape[0] * shape[1]
        log(f"{name}: {dt*1e6:.1f} us/gather of {n_el} elems "
            f"({n_el/dt/1e9:.2f} Gelem/s)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}")


run_case((128, 128), 128, "(128,128) idx<128")
run_case((128, 256), 128, "(128,256) idx<128")
run_case((128, 256), 256, "(128,256) idx<256")
run_case((128, 4352), 128, "(128,4352) idx<128")
run_case((128, 4352), 4352, "(128,4352) idx<4352")
run_case((256, 4352), 128, "(256,4352) idx<128")
