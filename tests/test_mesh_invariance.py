"""Mesh-shape invariance (SURVEY §4: the TPU build adds same-answer
invariance across mesh shapes to the reference's test strategy)."""
import numpy as np
import pytest

from highs_tpu import Highs, HighsModelStatus

from conftest import instance_path


@pytest.mark.parametrize("mesh", ["", "2", "4", "8"])
def test_pdlp_same_answer_across_mesh_shapes(instances_dir, mesh):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "pdlp")
    h.setOptionValue("presolve", "off")
    if mesh:
        h.setOptionValue("tpu_mesh_shape", mesh)
    h.readModel(instance_path("afiro.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-464.7531429)) < 1e-3


def test_pdlp_mesh_iterations_match(instances_dir):
    """Row sharding must not change the ALGORITHM: iteration counts on
    1-device and 8-device meshes agree (bit-identical collectives)."""
    iters = {}
    for mesh in ("", "8"):
        h = Highs()
        h.setOptionValue("output_flag", False)
        h.setOptionValue("solver", "pdlp")
        h.setOptionValue("presolve", "off")
        if mesh:
            h.setOptionValue("tpu_mesh_shape", mesh)
        h.readModel(instance_path("adlittle.mps"))
        h.run()
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        iters[mesh] = h.getInfo().pdlp_iteration_count
    assert iters[""] == iters["8"]


def test_2d_block_sharding_bit_identical():
    """The 2D (rows x cols) block layout of K (SURVEY §7.3) produces
    bit-identical iterates to the replicated single-device run."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    import __graft_entry__ as g
    from highs_tpu.parallel.mesh import shard_pdhg_2d
    from highs_tpu.solvers.pdlp.pdhg import pdhg_block

    problem, state = g._synthetic_problem(m=16, n=32,
                                          dtype=jnp.float64)

    @jax.jit
    def step(p, s):
        return pdhg_block(p, s, 8, 1.0)

    ref_state, ref_metrics = step(problem, state)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape((2, 2)),
                ("rows", "cols"))
    p2, s2 = shard_pdhg_2d(problem, state, mesh)
    out_state, out_metrics = step(p2, s2)
    np.testing.assert_array_equal(np.asarray(ref_state.x),
                                  np.asarray(out_state.x))
    np.testing.assert_array_equal(np.asarray(ref_state.y),
                                  np.asarray(out_state.y))
    np.testing.assert_array_equal(
        np.asarray(ref_metrics.primal_res),
        np.asarray(out_metrics.primal_res))


def test_multihost_bootstrap_noop_single_process():
    """bootstrap_multihost is a safe no-op without a coordinator."""
    from highs_tpu.parallel.distributed import bootstrap_multihost
    assert bootstrap_multihost() is False


def test_multiprocess_cpu_bootstrap():
    """Two OS processes connect via jax.distributed over a local
    coordinator, form one global 4-device mesh (2 virtual CPU devices
    per process) and agree on a psum — the multi-host wiring the
    reference lacks (docs/src/parallel.md: single machine only)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
from highs_tpu.parallel.distributed import bootstrap_multihost
dist = bootstrap_multihost("127.0.0.1:%d", 2, pid)
assert dist, "expected distributed mode"
assert jax.device_count() == 4, jax.device_count()
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np
mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("rows",))
x = jax.device_put(jnp.arange(8.0),
                   NamedSharding(mesh, P("rows")))
total = jax.jit(lambda v: v.sum())(x)
assert float(total) == 28.0, float(total)
print("proc", pid, "ok")
""" % port

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=180) for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, outs[i][1][-800:]
        assert f"proc {i} ok" in outs[i][0]


@pytest.mark.parametrize("fmt", ["panelell", "ell", "blockcsr"])
def test_row_sharded_sparse_ops_match_dense(fmt):
    """RowShardedOp (per-device row blocks, local transpose tables,
    psum'd K'y — parallel/shard_ops.py) agrees with the plain scipy
    products for every sparse operator family on the 8-device mesh."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from highs_tpu.parallel.mesh import make_mesh
    from highs_tpu.parallel.shard_ops import make_row_sharded

    rng = np.random.default_rng(11)
    m, n = 700, 500
    a = sp.random(m, n, density=0.02, random_state=rng, format="csr")
    mesh = make_mesh((8,), axis_names=("rows",))
    op, m_pad = make_row_sharded(a, mesh, "rows", fmt=fmt,
                                 dtype=jnp.float64)
    n_pad = op.shape[1]
    x = np.zeros(n_pad)
    x[:n] = rng.standard_normal(n)
    y = np.zeros(m_pad)
    y[:m] = rng.standard_normal(m)
    mv = np.asarray(jax.jit(lambda o, v: o.mv(v))(op, jnp.asarray(x)))
    rmv = np.asarray(jax.jit(lambda o, v: o.rmv(v))(op, jnp.asarray(y)))
    assert np.allclose(mv[:m], a @ x[:n], atol=1e-12)
    assert np.all(mv[m:] == 0.0)
    assert np.allclose(rmv[:n], a.T @ y[:m], atol=1e-12)


def test_sharded_sparse_pdlp_solve():
    """End-to-end PDHG over a RowShardedOp: force the sparse multi-chip
    path by shrinking the dense cutoff via the blockcsr format."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from highs_tpu.models.lp import HighsLp, HighsSparseMatrix
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.pdlp.wrapper import solve_lp_pdlp

    rng = np.random.default_rng(12)
    m = n = 1200
    a = sp.random(m, n, density=0.004, random_state=rng,
                  format="csc") + sp.identity(m) * 2.0
    xstar = rng.uniform(0, 1, n)
    b = a @ xstar
    lp = HighsLp(
        num_col=n, num_row=m, col_cost=rng.uniform(0.5, 1.5, n),
        col_lower=np.zeros(n), col_upper=np.full(n, 5.0),
        row_lower=np.asarray(b).ravel(),
        row_upper=np.asarray(b).ravel(),
        a_matrix=HighsSparseMatrix.from_scipy(a.tocsc()), sense=1)
    objs = {}
    for mesh in ("", "8"):
        opts = HighsOptions()
        opts.solver = "hipdlp"
        opts.output_flag = False
        opts.tpu_matrix_format = "ell"
        opts.pdlp_optimality_tolerance = 1e-7
        if mesh:
            opts.tpu_mesh_shape = mesh
            # force the sharded-operator path regardless of size
            import highs_tpu.solvers.pdlp.wrapper as W
            st, sol, info = solve_lp_pdlp(lp, opts)
        else:
            st, sol, info = solve_lp_pdlp(lp, opts)
        from highs_tpu.constants import HighsModelStatus
        assert st == HighsModelStatus.kOptimal
        objs[mesh] = info.primal_obj
    assert abs(objs[""] - objs["8"]) <= 1e-6 * (1 + abs(objs[""]))


@pytest.mark.parametrize("fmt", ["panelell", "ell", "blockcsr"])
def test_2d_sharded_sparse_ops_match_dense(fmt):
    """TwoDShardedOp (per-tile local index tables, Kx = psum over
    cols, K'y = psum over rows — SURVEY §7.3) agrees with the plain
    scipy products on a 4x2 mesh."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from highs_tpu.parallel.mesh import make_mesh
    from highs_tpu.parallel.shard_ops import make_2d_sharded

    rng = np.random.default_rng(13)
    m, n = 700, 500
    a = sp.random(m, n, density=0.02, random_state=rng, format="csr")
    mesh = make_mesh((4, 2), axis_names=("rows", "cols"))
    op, m_pad, n_pad = make_2d_sharded(a, mesh, "rows", "cols",
                                       fmt=fmt, dtype=jnp.float64)
    x = np.zeros(n_pad)
    x[:n] = rng.standard_normal(n)
    y = np.zeros(m_pad)
    y[:m] = rng.standard_normal(m)
    mv = np.asarray(jax.jit(lambda o, v: o.mv(v))(op, jnp.asarray(x)))
    rmv = np.asarray(jax.jit(lambda o, v: o.rmv(v))(op, jnp.asarray(y)))
    assert np.allclose(mv[:m], a @ x[:n], atol=1e-12)
    assert np.all(mv[m:] == 0.0)
    assert np.allclose(rmv[:n], a.T @ y[:m], atol=1e-12)


def test_2d_sharded_sparse_pdhg_block_matches_single():
    """One fused PDHG block over a sparse 2D-tiled operator matches the
    single-device iterate (same step count, same problem)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from highs_tpu.ops import linops
    from highs_tpu.parallel.mesh import make_mesh, shard_pdhg_2d
    from highs_tpu.solvers.pdlp.pdhg import (PdhgProblem, PdhgState,
                                             pdhg_block)

    rng = np.random.default_rng(14)
    m = n = 512  # multiples of 128*4 and 128*2
    a = (sp.random(m, n, density=0.01, random_state=rng,
                   format="csr") + sp.identity(m)).tocsr()
    b = rng.standard_normal(m)
    c = rng.uniform(0.1, 1.0, n)

    def build(problem_op):
        prob = PdhgProblem(
            k_op=problem_op,
            b=jnp.asarray(b), c=jnp.asarray(c),
            lo=jnp.zeros(n), up=jnp.full(n, 10.0),
            is_eq=jnp.zeros(m), lo_fin=jnp.ones(n),
            up_fin=jnp.ones(n),
            inv_row_scale=jnp.ones(m), inv_col_scale=jnp.ones(n),
            norm_b=jnp.asarray(np.linalg.norm(b)),
            norm_c=jnp.asarray(np.linalg.norm(c)))
        st = PdhgState(
            x=jnp.zeros(n), y=jnp.zeros(m), x_pd=jnp.zeros(n),
            y_pd=jnp.zeros(m), x_anchor=jnp.zeros(n),
            y_anchor=jnp.zeros(m), aty=jnp.zeros(n),
            k=jnp.zeros((), jnp.int32),
            eta=jnp.asarray(0.05), omega=jnp.asarray(1.0))
        return prob, st

    prob1, st1 = build(linops.from_scipy_ell(a, dtype=jnp.float64))
    s1, m1 = pdhg_block(prob1, st1, 40, 1.0)

    mesh = make_mesh((4, 2), axis_names=("rows", "cols"))
    prob2, st2 = build(linops.from_scipy_ell(a, dtype=jnp.float64))
    prob2, st2 = shard_pdhg_2d(prob2, st2, mesh, mat=a, fmt="ell")
    s2, m2 = pdhg_block(prob2, st2, 40, 1.0)

    assert np.allclose(np.asarray(s1.x_pd), np.asarray(s2.x_pd),
                       atol=1e-12)
    assert np.allclose(np.asarray(s1.y_pd), np.asarray(s2.y_pd),
                       atol=1e-12)
    assert np.isclose(float(m1.primal_res), float(m2.primal_res),
                      atol=1e-10)
