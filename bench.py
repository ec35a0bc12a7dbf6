"""Benchmark: PDHG device-step throughput on the flagship compute path.

Prints ONE JSON line:
  {"metric": "pdhg_iters_per_s", "value": N, "unit": "iter/s",
   "vs_baseline": R}

The measured quantity is sustained PDHG iterations/second of the jitted
device block (2 matvecs + elementwise per iteration) on a dense
4096x4096 standard-form LP — the core loop whose CPU analogue is the
reference HiPDLP iteration (highs/pdlp/hipdlp/pdhg.cc:961).  The block
runs the production mixed-precision stepping mode
(tpu_step_dtype=bfloat16): bf16 step matvecs (half the HBM traffic),
float32 iterates and metrics — exactly what solve_pdhg executes.
`vs_baseline` is measured against a 1000 iter/s anchor, a generous
estimate of the reference's CPU PDLP iteration rate at this size
(the reference publishes no absolute numbers — BASELINE.md).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    m = n = 4096
    steps_per_block = 200
    dtype = jnp.float32

    import __graft_entry__ as g
    from highs_tpu.solvers.pdlp.pdhg import pdhg_block

    problem, state = g._synthetic_problem(m=m, n=n, dtype=dtype, seed=7)
    from highs_tpu.ops.linops import cast_linop
    step_op = cast_linop(problem.k_op, jnp.bfloat16)

    def block(problem, state):
        return pdhg_block(problem, state, steps_per_block, 1.0, step_op)

    # warm up / compile (scalar readback is the only reliable sync on
    # tunneled backends — block_until_ready can return early there)
    state, metrics = block(problem, state)
    float(metrics.primal_res)

    n_blocks = 10
    rates = []
    for _trial in range(4):
        t0 = time.perf_counter()
        s = state
        for _ in range(n_blocks):
            s, m = block(problem, s)
        float(m.primal_res)  # force execution of the whole chain
        dt = time.perf_counter() - t0
        rates.append(n_blocks * steps_per_block / dt)
    iters_per_s = float(np.median(rates))
    baseline_iters_per_s = 1000.0
    result = {
        "metric": "pdhg_iters_per_s",
        "value": round(iters_per_s, 1),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / baseline_iters_per_s, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
