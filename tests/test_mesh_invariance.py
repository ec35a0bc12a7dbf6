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
