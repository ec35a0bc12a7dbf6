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
