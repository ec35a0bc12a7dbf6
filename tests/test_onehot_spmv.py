"""One-hot padded-cell SpMV (ops/onehot_spmv.py): the gather-free
scattered-sparsity kernel (reference analogue: cuSPARSE SpMV in
pdlp/cupdlp/cuda — the only PDLP compute kernel)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from highs_tpu.ops.onehot_spmv import (choose_p, from_scipy_onehot)


@pytest.mark.parametrize("m,n,dens,seed", [
    (300, 500, 0.01, 1),
    (1024, 1024, 0.002, 2),
    (257, 130, 0.05, 3),
    (128, 128, 0.3, 4),
    (1000, 200, 0.02, 5),
])
def test_onehot_matches_scipy(m, n, dens, seed):
    A = sp.random(m, n, density=dens, random_state=seed, format="csr")
    op = from_scipy_onehot(A, jnp.float32)
    rng = np.random.default_rng(seed)
    x = np.zeros(op.shape[1], np.float32)
    x[:n] = rng.standard_normal(n)
    y = np.asarray(op.mv(jnp.asarray(x)))
    assert np.abs(y[:m] - A @ x[:n]).max() < 1e-4
    assert not len(y[m:]) or np.abs(y[m:]).max() == 0.0
    yy = np.zeros(op.shape[0], np.float32)
    yy[:m] = rng.standard_normal(m)
    z = np.asarray(op.rmv(jnp.asarray(yy)))
    assert np.abs(z[:n] - A.T @ yy[:m]).max() < 1e-4


def test_onehot_spill_tail():
    # a dense column block forces cell overflow -> COO spill path
    A = sp.random(256, 256, density=0.001, random_state=7,
                  format="lil")
    A[:64, 0] = 1.5  # 64 entries in one 128x128 cell
    A = A.tocsr()
    op = from_scipy_onehot(A, jnp.float32, p_slots=4)
    assert op.fwd.pad_cnt > 0
    x = np.zeros(op.shape[1], np.float32)
    x[:256] = np.random.default_rng(0).standard_normal(256)
    y = np.asarray(op.mv(jnp.asarray(x)))
    assert np.abs(y[:256] - A @ x[:256]).max() < 1e-4


def test_choose_p_bounds():
    A = sp.random(512, 512, density=0.01, random_state=1)
    p = choose_p(A.tocsr())
    assert 1 <= p <= 12


def test_linops_onehot_format():
    from highs_tpu.ops import linops
    A = sp.random(256, 256, density=0.01, random_state=2,
                  format="csr")
    op = linops.from_scipy(A, fmt="onehot", dtype=jnp.float32)
    x = np.zeros(op.shape[1], np.float32)
    x[:256] = 1.0
    y = np.asarray(op.mv(jnp.asarray(x)))
    ref = np.asarray(A.sum(axis=1)).ravel()
    assert np.abs(y[:256] - ref).max() < 1e-4


def test_bucketperm_format_end_to_end():
    # bucket-permuted ELL: permutation baked into the problem, inverse
    # applied at recovery (solvers/pdlp/wrapper.py perm_maps)
    from highs_tpu import Highs, HighsModelStatus
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "pdlp")
    h.setOptionValue("tpu_matrix_format", "bucketperm")
    h.readModel("/root/reference/check/instances/afiro.mps")
    h.run()
    assert h.getModelStatus() == HighsModelStatus.kOptimal
    assert abs(h.getInfo().objective_function_value -
               (-464.7531429)) < 1e-3
