"""Row-sharded sparse operators for multi-chip PDHG.

The 1D layout (SURVEY §7.3; mesh.py): K is partitioned into d
block-rows, one per device.  Each device holds BOTH sides of ITS row
block — the row-oriented tables for `K x` and the transpose tables of
the SAME rows for the partial `K_d' y_d` — so nothing is replicated
(VERDICT r02: the old layout replicated the entire transpose gather
table on every device).  Under shard_map:

    K x   ->  local block spmv                      (no communication)
    K' y  ->  local partial transpose spmv + psum   (one ICI all-reduce)

which is the minimal communication for the PDHG iteration, and the
direct TPU analogue of the reference's device-resident cuSPARSE SpMV
pair (highs/pdlp/cupdlp/cuda/, hipdlp GPU path).

Works for every local operator family (PanelEllMatrix / EllMatrix /
BlockCsrMatrix): the per-device operators are built independently on
their row blocks, their leaves padded to a common shape, stacked on a
leading device axis, and sharded over the mesh.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import linops


@jax.tree_util.register_pytree_node_class
class RowShardedOp:
    """Device-stacked row-block operator.

    `stacked` is a pytree with every leaf carrying a leading device
    axis (d, ...), placed with NamedSharding(mesh, P(axis, ...)).
    `mesh`/`axis`/shape metadata are static aux data."""

    def __init__(self, stacked, treedef, mesh: Mesh, axis: str,
                 shape: Tuple[int, int], m_local: int):
        self.stacked = stacked  # list of stacked leaves
        self.treedef = treedef
        self.mesh = mesh
        self.axis = axis
        self._shape = tuple(shape)
        self.m_local = m_local

    @property
    def shape(self):
        return self._shape

    def tree_flatten(self):
        return (tuple(self.stacked),
                (self.treedef, self.mesh, self.axis, self._shape,
                 self.m_local))

    @classmethod
    def tree_unflatten(cls, aux, children):
        treedef, mesh, axis, shape, m_local = aux
        return cls(list(children), treedef, mesh, axis, shape, m_local)

    def _local(self, leaves):
        return jax.tree.unflatten(self.treedef,
                                  [a[0] for a in leaves])

    def mv(self, x):
        """K @ x: x replicated, result row-sharded (m_pad,)."""
        def f(leaves, xx):
            return self._local(leaves).mv(xx)

        return shard_map(
            f, mesh=self.mesh,
            in_specs=(P(self.axis), P()),
            out_specs=P(self.axis),
            check_vma=False)(tuple(self.stacked), x)

    def rmv(self, y):
        """K' @ y: y row-sharded, result replicated (n,)."""
        def f(leaves, yy):
            part = self._local(leaves).rmv(yy)
            return jax.lax.psum(part, self.axis)

        return shard_map(
            f, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis)),
            out_specs=P(),
            check_vma=False)(tuple(self.stacked), y)

    def astype_values(self, dtype):
        """Low-precision copy of the VALUE leaves (mixed-precision
        stepping); index leaves keep their integer dtypes."""
        new = [a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
               else a for a in self.stacked]
        return RowShardedOp(new, self.treedef, self.mesh, self.axis,
                            self._shape, self.m_local)

    def value_dtype(self):
        for a in self.stacked:
            if jnp.issubdtype(a.dtype, jnp.floating):
                return a.dtype
        return jnp.float32


def _pad_leaf(a: np.ndarray, target_shape, kind: str, m_local: int):
    """Pad one local-operator leaf up to `target_shape`.

    ELL index/value padding (zeros) is a no-op by construction; COO
    tail padding repeats segment id m_local-1 with value 0 so the
    sorted-segment invariant survives; block-CSR tile padding appends
    zero tiles targeting block-row 0."""
    pads = [(0, t - s) for s, t in zip(a.shape, target_shape)]
    if not any(p[1] for p in pads):
        return a
    if kind == "tail_seg":
        return np.pad(a, pads, constant_values=max(0, m_local - 1))
    return np.pad(a, pads, constant_values=0)


def _leaf_kinds(op) -> list:
    """Per-leaf padding semantics for each operator family."""
    if isinstance(op, (linops.PanelEllMatrix, linops.EllMatrix)):
        names = op._fields
        return ["tail_seg" if n.startswith("tail_seg") else "plain"
                for n in names]
    # BlockCsrMatrix: (a: BlockCsr, at: BlockCsr); BlockCsr leaves are
    # (blocks, block_row, block_col, first_in_row) — plain zero pads
    leaves, _ = jax.tree.flatten(op)
    return ["plain"] * len(leaves)


def make_row_sharded(mat: sp.spmatrix, mesh: Mesh, axis: str,
                     fmt: str = "choose",
                     dtype=jnp.float32) -> Tuple["RowShardedOp", int]:
    """Build a RowShardedOp from a scipy matrix.

    Rows are padded to a multiple of 128*d and split into d equal
    blocks; each block's operator is built independently (its
    transpose tables cover only ITS rows).  Returns (op, m_pad)."""
    d = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                     if a == axis]) or 1)
    m, n = mat.shape
    unit = 128 * d
    m_pad = ((m + unit - 1) // unit) * unit
    n_pad = ((n + 127) // 128) * 128
    csr = mat.tocsr().copy()
    csr.resize((m_pad, n_pad))
    m_local = m_pad // d

    locals_ = []
    for k in range(d):
        block = csr[k * m_local:(k + 1) * m_local, :]
        if fmt == "blockcsr":
            from ..ops.block_csr import from_scipy_block_csr
            locals_.append(from_scipy_block_csr(block, dtype=dtype))
        elif fmt == "ell":
            locals_.append(linops.from_scipy_ell(block, dtype=dtype))
        else:
            locals_.append(linops.from_scipy_panel_ell(block,
                                                       dtype=dtype))

    leaves_list = []
    treedef = None
    for op in locals_:
        leaves, treedef = jax.tree.flatten(op)
        leaves_list.append([np.asarray(v) for v in leaves])
    kinds = _leaf_kinds(locals_[0])
    n_leaves = len(leaves_list[0])
    stacked = []
    for li in range(n_leaves):
        shapes = [leaves_list[k][li].shape for k in range(d)]
        target = tuple(max(s[i] for s in shapes)
                       for i in range(len(shapes[0])))
        arrs = [_pad_leaf(leaves_list[k][li], target, kinds[li],
                          m_local) for k in range(d)]
        stk = jnp.asarray(np.stack(arrs))
        stacked.append(jax.device_put(
            stk, NamedSharding(mesh, P(axis))))
    return RowShardedOp(stacked, treedef, mesh, axis,
                        (m_pad, n_pad), m_local), m_pad
