"""LP-format reader tests (reference: filereaderlp behavior +
regression instances)."""
import numpy as np
import pytest

from highs_tpu import Highs, HighsModelStatus, ObjSense, kHighsInf
from highs_tpu.io.lp_format import LpParseError, read_lp, write_lp

from conftest import instance_path


def test_single_line_keywords(instances_dir):
    # "Minimize a subject to a >= 1 bounds a <= 0" (issue 1449)
    model = read_lp(instance_path("1449a.lp"))
    lp = model.lp
    assert lp.num_col == 1
    assert lp.num_row == 1
    assert lp.row_lower[0] == 1.0
    assert lp.col_upper[0] == 0.0


def test_garbage_loads_as_empty(instances_dir):
    # reference (vendored filereaderlp): unstructured content yields an
    # empty model, not a read error
    model = read_lp(instance_path("garbage.lp"))
    assert model.lp.num_col == 0 and model.lp.num_row == 0


def test_quadratic_objective(instances_dir):
    model = read_lp(instance_path("qptestnw.lp"))
    assert model.is_qp()
    q = model.hessian.to_scipy_full().toarray()
    np.testing.assert_allclose(q, [[2.0, 0.0], [0.0, 2.0]])


def test_qcqp_rejected(instances_dir):
    with pytest.raises(LpParseError):
        read_lp(instance_path("qcqp.lp"))


def test_semi_continuous(instances_dir):
    model = read_lp(instance_path("semi-continuous.lp"))
    assert model.lp.has_semi_variables()


def test_roundtrip(tmp_path, instances_dir):
    m1 = read_lp(instance_path("qptestnw.lp"))
    out = str(tmp_path / "rt.lp")
    write_lp(m1, out)
    m2 = read_lp(out)
    assert m2.lp.num_col == m1.lp.num_col
    assert m2.lp.num_row == m1.lp.num_row
    np.testing.assert_allclose(m2.lp.col_cost, m1.lp.col_cost)
    np.testing.assert_allclose(
        m2.hessian.to_scipy_full().toarray(),
        m1.hessian.to_scipy_full().toarray())
    np.testing.assert_allclose(
        m2.lp.a_matrix.to_scipy().toarray(),
        m1.lp.a_matrix.to_scipy().toarray())


def test_maximize_with_offset(tmp_path):
    (tmp_path / "t.lp").write_text(
        "maximize\n obj: 3 x + 2 y + 10\nst\n"
        " c1: x + y <= 4\n c2: x <= 2\nbounds\n x >= 0\n y >= 0\nend\n")
    model = read_lp(str(tmp_path / "t.lp"))
    assert model.lp.sense == ObjSense.kMaximize
    assert model.lp.offset == 10.0
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.passModel(model)
    h.run()
    # max 3x+2y+10: x=2, y=2 -> 20
    assert abs(h.getObjectiveValue() - 20.0) < 1e-6
