"""Pallas block-CSR SpMV kernel tests (interpret mode on CPU)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from highs_tpu.ops.block_csr import BLOCK, from_scipy_block_csr


@pytest.mark.parametrize("shape", [(300, 1500), (100, 90), (1024, 513),
                                   (128, 128)])
def test_spmv_matches_dense(shape):
    m, n = shape
    rng = np.random.default_rng(42)
    a = sp.random(m, n, density=0.05, random_state=rng, format="csr")
    op = from_scipy_block_csr(a, dtype=jnp.float64)
    mp, np_ = op.shape
    assert mp % BLOCK == 0 and np_ % BLOCK == 0
    a_pad = np.zeros((mp, np_))
    a_pad[:m, :n] = a.toarray()
    x = rng.standard_normal(np_)
    y = np.asarray(op.mv(jnp.asarray(x)))
    np.testing.assert_allclose(y, a_pad @ x, atol=1e-12)
    yy = rng.standard_normal(mp)
    z = np.asarray(op.rmv(jnp.asarray(yy)))
    np.testing.assert_allclose(z, a_pad.T @ yy, atol=1e-12)


def test_empty_block_rows():
    # matrix with entirely empty block-rows
    a = sp.csr_matrix(([3.0, -2.0], ([0, 400], [0, 100])),
                      shape=(512, 512))
    op = from_scipy_block_csr(a, dtype=jnp.float64)
    x = np.ones(op.shape[1])
    y = np.asarray(op.mv(jnp.asarray(x)))
    assert y[0] == 3.0
    assert y[400] == -2.0
    assert np.abs(y).sum() == 5.0


def test_pdhg_with_block_csr(tmp_path):
    from highs_tpu.io.mps import read_mps
    from highs_tpu.options import HighsOptions
    from highs_tpu.solvers.pdlp.wrapper import solve_lp_pdlp
    from conftest import instance_path
    lp = read_mps(instance_path("afiro.mps")).lp
    opts = HighsOptions()
    opts.tpu_matrix_format = "blockcsr"
    st, sol, info = solve_lp_pdlp(lp, opts)
    assert int(st) == 7
    assert abs(info.primal_obj - (-4.6475314286e2)) / 465 < 1e-6
