"""ICrash warm start and PDHG checkpoint/resume tests (reference:
presolve/ICrash.cpp; checkpointing is a TPU-build addition, SURVEY §5)."""
import numpy as np
import pytest

from highs_tpu import Highs, HighsModelStatus
from highs_tpu.io.mps import read_mps
from highs_tpu.options import HighsOptions

from conftest import instance_path


def test_icrash_reduces_residual(instances_dir):
    from highs_tpu.solvers.icrash import run_icrash
    lp = read_mps(instance_path("afiro.mps")).lp
    opts = HighsOptions()
    opts.icrash_iterations = 30
    opts.icrash_approx_iter = 80
    info = run_icrash(lp, opts)
    assert info.num_iterations > 0
    assert info.x is not None and len(info.x) == lp.num_col
    # x within bounds
    assert np.all(info.x >= lp.col_lower - 1e-9)
    assert np.all(info.x <= lp.col_upper + 1e-9)
    # row residual small relative to rhs scale
    a = lp.a_matrix.to_scipy()
    ax = a @ info.x
    viol = np.maximum(ax - np.where(np.isfinite(lp.row_upper),
                                    lp.row_upper, np.inf), 0.0) + \
        np.maximum(np.where(np.isfinite(lp.row_lower), lp.row_lower,
                            -np.inf) - ax, 0.0)
    assert float(np.linalg.norm(viol)) < 1.0


def test_icrash_warm_start_end_to_end(instances_dir):
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("icrash", True)
    h.setOptionValue("solver", "pdlp")
    h.readModel(instance_path("afiro.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-464.7531429)) < 1e-3


def test_pdlp_checkpoint_resume(instances_dir, tmp_path):
    ckpt = str(tmp_path / "pdhg.npz")
    # first run: tight iteration cap, checkpoint every block
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "pdlp")
    h.setOptionValue("presolve", "off")
    h.setOptionValue("pdlp_checkpoint_file", ckpt)
    h.setOptionValue("pdlp_checkpoint_interval", 1)
    h.setOptionValue("pdlp_iteration_limit", 120)
    h.readModel(instance_path("afiro.mps"))
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kIterationLimit
    import os
    assert os.path.exists(ckpt)
    data = np.load(ckpt)
    assert int(data["total_iters"]) >= 80

    # resume: must pick up the iterate and converge
    h2 = Highs()
    h2.setOptionValue("output_flag", False)
    h2.setOptionValue("solver", "pdlp")
    h2.setOptionValue("presolve", "off")
    h2.setOptionValue("pdlp_checkpoint_file", ckpt)
    h2.readModel(instance_path("afiro.mps"))
    h2.run()
    assert h2.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h2.getObjectiveValue() - (-464.7531429)) < 1e-3
    # total iterations in the resumed run include the checkpointed ones
    assert h2.getInfo().pdlp_iteration_count >= int(data["total_iters"])
