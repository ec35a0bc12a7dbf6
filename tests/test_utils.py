"""Utility parity tests (reference: HighsCDouble, HighsIntegers,
HighsMatrixPic)."""
import math

import numpy as np
import scipy.sparse as sp

from highs_tpu.utils.cdouble import CDouble, comp_dot, comp_sum
from highs_tpu.utils.integers import (gcd, integral_scale,
                                      nearest_rational)
from highs_tpu.utils.matrix_pic import write_matrix_pbm


def test_cdouble_exact_sum():
    # 1e16 + 1 - 1e16 loses the 1 in double, not in CDouble
    c = CDouble.from_float(1e16) + 1.0 - 1e16
    assert float(c) == 1.0
    assert (1e16 + 1.0) - 1e16 == 0.0  # plain double fails


def test_cdouble_mul_div():
    c = CDouble.from_float(1.0) / 3.0
    assert abs(float(c * 3.0) - 1.0) < 1e-30
    d = CDouble.from_float(0.1) * 10.0
    assert abs(float(d) - 1.0) < 1e-16


def test_cdouble_floor():
    assert float((CDouble.from_float(2.0) - 1e-20).floor()) == 1.0
    assert float(CDouble.from_float(3.7).floor()) == 3.0


def test_comp_sum_and_dot():
    vals = np.array([1e16, 1.0, -1e16, 1.0])
    assert comp_sum(vals) == 2.0
    a = np.array([1e8, 1.0, -1e8])
    b = np.array([1e8, 1.0, 1e8])
    # a.b = 1e16 + 1 - 1e16 = 1
    assert comp_dot(a, b) == 1.0


def test_gcd_and_rational():
    assert gcd(12, 18) == 6
    p, q = nearest_rational(0.5)
    assert (p, q) == (1, 2)
    p, q = nearest_rational(2.0 / 3.0)
    assert (p, q) == (2, 3)


def test_integral_scale():
    s = integral_scale(np.array([0.5, 1.5, 2.5]))
    assert s is not None
    scaled = np.array([0.5, 1.5, 2.5]) * s
    assert np.allclose(scaled, np.round(scaled))
    assert np.allclose(scaled, [1, 3, 5])
    # irrational-ish coefficients: no scale
    assert integral_scale(np.array([math.pi, 1.0])) is None


def test_matrix_pbm(tmp_path):
    a = sp.random(50, 80, density=0.1, format="csr", random_state=0)
    path = str(tmp_path / "pat.pbm")
    write_matrix_pbm(a, path)
    lines = open(path).read().splitlines()
    assert lines[0] == "P1"
    w, h = map(int, lines[1].split())
    assert (w, h) == (80, 50)
    body = " ".join(lines[2:]).split()
    assert len(body) == w * h
    assert set(body) <= {"0", "1"}


def test_matrix_image_option(tmp_path, monkeypatch):
    import os
    monkeypatch.chdir(tmp_path)
    from highs_tpu import Highs, HighsLp
    from highs_tpu.models.lp import HighsSparseMatrix
    lp = HighsLp(
        num_col=2, num_row=1, col_cost=np.array([1.0, 1.0]),
        col_lower=np.zeros(2), col_upper=np.ones(2),
        row_lower=np.array([-np.inf]), row_upper=np.array([1.0]),
        a_matrix=HighsSparseMatrix.from_scipy(
            sp.csc_matrix(np.array([[1.0, 1.0]]))),
        model_name="pic")
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("write_matrix_image", True)
    h.passModel(lp)
    h.run()
    assert os.path.exists("pic_matrix.pbm")


def test_ell_matrix_matvec_and_spill():
    """EllMatrix: padded-gather matvec with COO spill tail equals the
    scipy products; cast_linop produces a bf16 stepping copy."""
    import scipy.sparse as sp
    import jax.numpy as jnp
    from highs_tpu.ops import linops as L

    rng = np.random.default_rng(7)
    A = sp.random(180, 140, density=0.06, random_state=3).tolil()
    A[11, :120] = 2.0   # skewed row -> exercises the spill tail
    A = A.tocsr()
    op = L.from_scipy_ell(A)
    assert op.tail_seg.shape[0] > 0
    x = rng.standard_normal(140)
    y = rng.standard_normal(180)
    np.testing.assert_allclose(np.asarray(op.mv(jnp.asarray(x))),
                               A @ x, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.rmv(jnp.asarray(y))),
                               A.T @ y, rtol=1e-12, atol=1e-12)
    lo = L.cast_linop(op, jnp.bfloat16)
    assert lo is not None and lo.val.dtype == jnp.bfloat16
    assert op.shape == (180, 140)


def test_linop_choose_ell_for_scattered():
    """from_scipy('choose') picks ELL for large scattered matrices
    (block-CSR tiles would blow up ~5000x on random sparsity)."""
    import scipy.sparse as sp
    from highs_tpu.ops import linops as L

    big = sp.random(9000, 9000, density=0.0008, random_state=2)
    assert isinstance(L.from_scipy(big, fmt="choose"), L.EllMatrix)
    small = sp.random(300, 200, density=0.05, random_state=1)
    assert isinstance(L.from_scipy(small, fmt="choose"), L.DenseMatrix)
