"""MPS reader tests against reference instance ground truth
(check/CMakeLists.txt objective anchors are exercised in solver tests;
here we check parse-level invariants)."""
import numpy as np
import pytest

from highs_tpu.constants import HighsVarType, ObjSense, kHighsInf
from highs_tpu.io.mps import read_mps, write_mps

from conftest import instance_path


def test_afiro_dimensions(instances_dir):
    model = read_mps(instance_path("afiro.mps"))
    lp = model.lp
    # afiro: 32 columns, 27 rows (netlib)
    assert lp.num_col == 32
    assert lp.num_row == 27
    assert lp.num_nz == 83
    assert lp.sense == ObjSense.kMinimize
    assert not lp.is_mip()
    assert not model.is_qp()


def test_adlittle_dimensions(instances_dir):
    lp = read_mps(instance_path("adlittle.mps")).lp
    assert lp.num_col == 97
    assert lp.num_row == 56


def test_mip_instance_integrality(instances_dir):
    lp = read_mps(instance_path("flugpl.mps")).lp
    assert lp.is_mip()
    assert len(lp.integrality) == lp.num_col
    assert np.any(lp.integrality == int(HighsVarType.kInteger))


def test_qp_instance(instances_dir):
    model_q = read_mps(instance_path("2821-qmatrix.mps"))
    assert model_q.is_qp()
    assert model_q.hessian.dim == model_q.lp.num_col
    # QMATRIX (full) and QUADOBJ (triangular) encodings of the same model
    # must give the same Hessian
    model_o = read_mps(instance_path("2821-quadobj.mps"))
    assert model_o.is_qp()
    q1 = model_q.hessian.to_scipy_full().toarray()
    q2 = model_o.hessian.to_scipy_full().toarray()
    np.testing.assert_allclose(q1, q2)


def test_bounds_parsing(tmp_path):
    mps = """NAME test
ROWS
 N obj
 L r1
 G r2
 E r3
COLUMNS
    x obj 1.0 r1 2.0
    x r2 1.0
    y obj -1.0 r1 1.0 r3 1.0
    z r3 2.0 r2 -1.0
RHS
    rhs r1 10.0 r2 -5.0
    rhs r3 3.0 obj 2.5
RANGES
    rng r1 4.0
BOUNDS
 UP bnd x 8.0
 MI bnd y
 FX bnd z 1.5
ENDATA
"""
    p = tmp_path / "t.mps"
    p.write_text(mps)
    lp = read_mps(str(p)).lp
    assert lp.num_col == 3
    assert lp.num_row == 3
    # offset: RHS on objective row = 2.5 -> offset = -2.5
    assert lp.offset == -2.5
    names = {n: i for i, n in enumerate(lp.col_names)}
    x, y, z = names["x"], names["y"], names["z"]
    assert lp.col_upper[x] == 8.0 and lp.col_lower[x] == 0.0
    assert lp.col_lower[y] == -kHighsInf and lp.col_upper[y] == kHighsInf
    assert lp.col_lower[z] == 1.5 and lp.col_upper[z] == 1.5
    rnames = {n: i for i, n in enumerate(lp.row_names)}
    r1, r2, r3 = rnames["r1"], rnames["r2"], rnames["r3"]
    # r1: L row rhs 10 with range 4 -> [6, 10]
    assert lp.row_upper[r1] == 10.0 and lp.row_lower[r1] == 6.0
    assert lp.row_lower[r2] == -5.0 and lp.row_upper[r2] == kHighsInf
    assert lp.row_lower[r3] == 3.0 and lp.row_upper[r3] == 3.0


def test_negative_up_bound_quirk(tmp_path):
    mps = """NAME neg
ROWS
 N obj
 G r1
COLUMNS
    x obj 1.0 r1 1.0
RHS
    rhs r1 -10.0
BOUNDS
 UP bnd x -2.0
ENDATA
"""
    p = tmp_path / "neg.mps"
    p.write_text(mps)
    lp = read_mps(str(p)).lp
    # negative UP bound with default zero lower frees the lower bound
    assert lp.col_upper[0] == -2.0
    assert lp.col_lower[0] == -kHighsInf


def test_marker_integers_default_binary(tmp_path):
    mps = """NAME mark
ROWS
 N obj
 L r1
COLUMNS
    MARKER0 'MARKER' 'INTORG'
    a obj 1.0 r1 1.0
    b obj 1.0 r1 1.0
    MARKER1 'MARKER' 'INTEND'
    c obj 1.0 r1 1.0
RHS
    rhs r1 5.0
BOUNDS
 UP bnd b 10.0
ENDATA
"""
    p = tmp_path / "mark.mps"
    p.write_text(mps)
    lp = read_mps(str(p)).lp
    names = {n: i for i, n in enumerate(lp.col_names)}
    # a: marker integer with no bound entry -> binary [0, 1]
    assert lp.integrality[names["a"]] == int(HighsVarType.kInteger)
    assert lp.col_upper[names["a"]] == 1.0
    # b: marker integer with UP bound -> [0, 10]
    assert lp.col_upper[names["b"]] == 10.0
    # c: continuous
    assert lp.integrality[names["c"]] == int(HighsVarType.kContinuous)


def test_roundtrip(instances_dir, tmp_path):
    m1 = read_mps(instance_path("afiro.mps"))
    out = tmp_path / "afiro_out.mps"
    write_mps(m1, str(out))
    m2 = read_mps(str(out))
    assert m2.lp.num_col == m1.lp.num_col
    assert m2.lp.num_row == m1.lp.num_row
    np.testing.assert_allclose(
        m2.lp.col_cost, m1.lp.col_cost, rtol=0, atol=0)
    np.testing.assert_allclose(
        m2.lp.a_matrix.to_scipy().toarray(),
        m1.lp.a_matrix.to_scipy().toarray())
    np.testing.assert_allclose(m2.lp.row_lower, m1.lp.row_lower)
    np.testing.assert_allclose(m2.lp.row_upper, m1.lp.row_upper)


def test_gzip_read(instances_dir, tmp_path):
    import gzip
    import shutil
    src = instance_path("afiro.mps")
    dst = tmp_path / "afiro.mps.gz"
    with open(src, "rb") as fin, gzip.open(dst, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    lp = read_mps(str(dst)).lp
    assert lp.num_col == 32


def test_mps_sos_roundtrip(tmp_path):
    """SOS sections round-trip through the MPS writer/reader."""
    import scipy.sparse as sp
    from highs_tpu import Highs, HighsLp
    from highs_tpu.models.lp import HighsSparseMatrix
    lp = HighsLp(
        num_col=3, num_row=1,
        col_cost=np.array([-1.0, -1.0, -1.0]),
        col_lower=np.zeros(3), col_upper=np.ones(3),
        row_lower=np.array([-np.inf]), row_upper=np.array([10.0]),
        a_matrix=HighsSparseMatrix.from_scipy(
            sp.csc_matrix(np.ones((1, 3)))),
        integrality=np.array([0, 1, 2], dtype=np.uint8),
        sos=[("S1", 0, [0, 1, 2], [1.0, 2.0, 3.0])],
        model_name="t")
    h = Highs()
    h.passModel(lp)
    path = str(tmp_path / "sos.mps")
    h.writeModel(path)
    h2 = Highs()
    assert h2.readModel(path) == 0
    lp2 = h2.getLp()
    assert len(lp2.sos) == 1
    typ, _pri, cols, weights = lp2.sos[0]
    assert typ == "S1" and list(cols) == [0, 1, 2]
    assert list(lp2.integrality) == [0, 1, 2]


def test_mps_inline_comments(instances_dir):
    """Inline '$'/'*' comments (reference comment.mps: optimal -4)."""
    from highs_tpu import Highs, HighsModelStatus
    h = Highs()
    h.setOptionValue("output_flag", False)
    assert h.readModel(instance_path("comment.mps")) == 0
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getObjectiveValue() - (-4.0)) < 1e-9


@pytest.mark.parametrize("name", ["nan2.mps", "garbage.mps",
                                  "qcqp.lp"])
def test_bad_files_are_read_errors(instances_dir, name):
    """Reference behavior: NaN in RHS, garbage MPS and quadratic
    constraints are read errors (TestFilereader.cpp, TestLPFileFormat)."""
    from highs_tpu import Highs
    h = Highs()
    h.setOptionValue("output_flag", False)
    assert h.readModel(instance_path(name)) != 0


@pytest.mark.parametrize("name,expect", [
    ("nan0.mps", "nan-objective"),   # NaN cost: loads, objective NaN
    ("nan1.mps", -1000.0),           # NaN matrix coeff neutralizes row
    ("garbage.lp", "empty"),         # unstructured .lp -> empty model
])
def test_nan_and_garbage_reference_behavior(instances_dir, name, expect):
    """Reference observable behavior for NaN/garbage inputs (the
    reference's getValue never flags NaN; atof('nan') flows through)."""
    import math
    from highs_tpu import Highs, HighsModelStatus
    h = Highs()
    h.setOptionValue("output_flag", False)
    assert h.readModel(instance_path(name)) == 0
    h.run()
    if expect == "nan-objective":
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        assert math.isnan(h.getObjectiveValue())
    elif expect == "empty":
        assert h.getModelStatus() == HighsModelStatus.kModelEmpty
    else:
        assert h.getModelStatus() == HighsModelStatus.kOptimal
        assert abs(h.getObjectiveValue() - expect) < 1e-6 * abs(expect)


def test_fixed_format_mps_space_names(tmp_path):
    """True fixed-column MPS mode (reference HMPSIO.cpp): names with
    embedded spaces parse from the classic field positions; the
    free-format reader falls back to it automatically on parse
    errors."""
    def fld(f2="", f3="", f4="", f5="", f6="", f1=""):
        line = list(" " * 61)

        def put(s, start):
            for i, ch in enumerate(s):
                line[start - 1 + i] = ch
        put(f1, 2)
        put(f2, 5)
        put(f3, 15)
        put(f4, 25)
        put(f5, 40)
        put(f6, 50)
        return "".join(line).rstrip()

    rows = [
        "NAME          FIXTEST",
        "ROWS",
        fld(f1="N", f2="COST"),
        fld(f1="L", f2="LIM ONE"),
        "COLUMNS",
        fld(f2="X ONE", f3="COST", f4="1.0", f5="LIM ONE", f6="1.0"),
        fld(f2="Y", f3="COST", f4="2.0", f5="LIM ONE", f6="1.0"),
        "RHS",
        fld(f2="RHS", f3="LIM ONE", f4="4.0"),
        "ENDATA",
    ]
    p = tmp_path / "fixtest.mps"
    p.write_text("\n".join(rows) + "\n")
    from highs_tpu.io.mps import read_mps
    lp = read_mps(str(p), fixed=True).lp
    assert "X ONE" in lp.col_names
    assert "LIM ONE" in lp.row_names
    assert lp.num_col == 2 and lp.num_row == 1
    # automatic fallback: default call also succeeds (free parser
    # errors on the spaced value field, fixed mode absorbs it)
    lp2 = read_mps(str(p)).lp
    assert lp2.num_col == 2


def test_free_reader_still_handles_reference_instances(instances_dir):
    from highs_tpu.io.mps import read_mps
    lp = read_mps(str(instances_dir / "afiro.mps")).lp
    assert lp.num_col == 32 and lp.num_row == 27
