"""Probe lane-wise gather primitives on TPU (XLA and Pallas).

The SpMV-speed question reduces to: how fast can we do
  out[s, j] = table[s, idx[s, j]]
for a (128, W) index array and a (128, K) table (per-sublane lane gather).
"""
import functools
import os
import time

import numpy as np

cache_dir = "/root/repo/.xla_cache"
os.makedirs(cache_dir, exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - T0:8.2f}s] {msg}", flush=True)


def bench(fn, args, iters_inner, name, reps=2):
    # chain inside one jit to avoid dispatch questions; forced device_get
    @jax.jit
    def chained(*a):
        def body(_, acc):
            r = fn(*a)
            return acc + jnp.sum(r.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters_inner, body,
                                 jnp.zeros((), jnp.float32))
    r1 = jax.device_get(chained(*args))
    t = time.perf_counter()
    for _ in range(reps):
        _ = jax.device_get(chained(*args))
    dt = (time.perf_counter() - t) / (reps * iters_inner)
    log(f"{name}: {dt*1e6:.1f} us/op")
    return dt


def main():
    rng = np.random.default_rng(0)
    W = 4352  # ~ nnz/128 for the 50k problem
    table = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (128, W)), jnp.int32)
    big_table = jnp.asarray(rng.standard_normal((128, 512)), jnp.float32)
    big_idx = jnp.asarray(rng.integers(0, 512, (128, W)), jnp.int32)

    # XLA take_along_axis, 128-wide table
    bench(lambda t_, i_: jnp.take_along_axis(
        t_[:, :], i_, axis=1), (table, idx), 8,
        "XLA take_along_axis (128,W) from (128,128)")

    # XLA take_along_axis, 512-wide table
    bench(lambda t_, i_: jnp.take_along_axis(t_, big_idx, axis=1),
          (big_table, big_idx), 8,
          "XLA take_along_axis (128,W) from (128,512)")

    # XLA onehot-sum equivalent for comparison (the panel trick baseline)
    def onehot_pick(t_, i_):
        # picks via broadcast compare; W*128 work
        lanes = jnp.arange(128, dtype=jnp.int32)
        sel = (i_[..., None] == lanes)  # (128, W, 128)
        return jnp.sum(jnp.where(sel, t_[:, None, :], 0), axis=-1)
    bench(onehot_pick, (table, idx), 2, "XLA onehot compare-sum")

    # Pallas kernel with take_along_axis inside
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            t_ref[:, :], i_ref[:, :], axis=1)

    @jax.jit
    def pallas_gather(t_, i_):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t_, i_)

    try:
        r = jax.device_get(pallas_gather(table, idx))
        ok = np.allclose(r, np.take_along_axis(
            np.asarray(table), np.asarray(idx), axis=1))
        log(f"pallas take_along_axis works, correct={ok}")
        bench(pallas_gather, (table, idx), 8, "Pallas take_along_axis")
    except Exception as e:
        log(f"pallas take_along_axis FAILED: {str(e)[:300]}")

    # Pallas with lax.gather form? try dynamic_gather via jnp.take
    def kernel2(t_ref, i_ref, o_ref):
        # per-sublane gather via take_along_axis on a (8,128) tile loop
        o_ref[:] = jnp.take_along_axis(
            t_ref[:, :], i_ref[:, :] & 127, axis=1)

    # correctness of XLA take_along_axis big
    r = jax.device_get(jnp.take_along_axis(big_table, big_idx, axis=1))
    ok = np.allclose(r, np.take_along_axis(
        np.asarray(big_table), np.asarray(big_idx), axis=1))
    log(f"XLA big take_along_axis correct={ok}")


if __name__ == "__main__":
    main()
