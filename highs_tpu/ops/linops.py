"""Device-side constraint-matrix operators.

The PDHG/IPM hot loops need exactly two products: `A @ x` and `A' @ y`
(the reference's only PDLP kernel too, highs/pdlp/hipdlp/pdhg.cc).  On TPU
the right representation depends on size and sparsity:

- `DenseMatrix`: the matrix padded into one dense (m, n) array.  For
  Netlib-scale problems this keeps both products on the MXU, which beats
  any gather-based sparse format on TPU by a wide margin.
- `BcooMatrix`: jax.experimental.sparse BCOO for very sparse, very large
  instances where dense does not fit HBM.
- `BlockCsrMatrix` (ops/block_csr.py): Pallas block-sparse kernel, dense
  128x128 tiles in a CSR-of-blocks layout — the scaling format.

All operators are pytrees so they can be closed over or passed through
jit/vmap/shard_map.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import sparse as jsparse


class DenseMatrix(NamedTuple):
    a: jax.Array  # (m, n)

    @property
    def shape(self):
        return self.a.shape

    def mv(self, x):
        """A @ x."""
        return self.a @ x

    def rmv(self, y):
        """A' @ y."""
        return y @ self.a


class BcooMatrix(NamedTuple):
    a: jsparse.BCOO
    at: jsparse.BCOO  # transpose, materialized for fast A'y

    @property
    def shape(self):
        return self.a.shape

    def mv(self, x):
        return self.a @ x

    def rmv(self, y):
        return self.at @ y


LinOp = Union[DenseMatrix, BcooMatrix]


def linop_dtype(op) -> jnp.dtype:
    if isinstance(op, DenseMatrix):
        return op.a.dtype
    if isinstance(op, BcooMatrix):
        return op.a.data.dtype
    return jnp.float32


def cast_linop(op, dtype):
    """Low-precision copy of an operator (float leaves only).

    Used for mixed-precision PDHG stepping: the step matvecs run on a
    bfloat16 copy of K (half the HBM bytes => ~1.6x step rate on TPU),
    while residuals/metrics keep the full-precision operator.  Returns
    None when the operator type has no low-precision path."""
    if isinstance(op, DenseMatrix):
        return DenseMatrix(op.a.astype(dtype))
    return None


def from_scipy(mat: sp.spmatrix, fmt: str = "choose",
               dtype=jnp.float64) -> LinOp:
    """Build a device operator from a scipy sparse matrix.

    fmt: "dense" / "bcoo" / "blockcsr" / "choose".  "choose" uses dense
    whenever the dense array is below ~256 MB (MXU-friendly); beyond
    that the Pallas block-CSR kernel when the tile structure is compact,
    else BCOO.
    """
    m, n = mat.shape
    if fmt == "choose":
        itemsize = jnp.dtype(dtype).itemsize
        dense_bytes = m * n * itemsize
        if dense_bytes <= (256 << 20):
            fmt = "dense"
        else:
            # estimate nonzero 128x128 tiles
            coo = mat.tocoo()
            tiles = len(set(zip((coo.row // 128).tolist(),
                                (coo.col // 128).tolist())))
            tile_bytes = tiles * 128 * 128 * itemsize
            fmt = "blockcsr" if tile_bytes <= (512 << 20) else "bcoo"
    if fmt == "blockcsr":
        from .block_csr import from_scipy_block_csr
        return from_scipy_block_csr(mat, dtype=dtype)
    if fmt == "dense":
        return DenseMatrix(jnp.asarray(mat.toarray(), dtype=dtype))
    if fmt == "bcoo":
        coo = mat.tocoo()
        a = jsparse.BCOO(
            (jnp.asarray(coo.data, dtype=dtype),
             jnp.asarray(np.stack([coo.row, coo.col], axis=1))),
            shape=(m, n))
        coo_t = mat.T.tocoo()
        at = jsparse.BCOO(
            (jnp.asarray(coo_t.data, dtype=dtype),
             jnp.asarray(np.stack([coo_t.row, coo_t.col], axis=1))),
            shape=(n, m))
        return BcooMatrix(a, at)
    raise ValueError(f"unknown matrix format {fmt!r}")
