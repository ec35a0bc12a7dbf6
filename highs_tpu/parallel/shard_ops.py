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


@jax.tree_util.register_pytree_node_class
class TwoDShardedOp:
    """2D block-tiled sparse operator (SURVEY §7.3 "the core kernel").

    K is partitioned into an (R x C) grid of tiles; device (i, j)
    holds tile (i, j)'s LOCAL tables (row-oriented for K x, transpose
    of the same tile for K' y).  Every leaf carries two leading mesh
    axes (R, C, ...) sharded P(row_axis, col_axis, ...).  Under
    shard_map:

        K x   ->  local tile spmv + psum over `col_axis`
                  (x col-sharded, result row-sharded)
        K' y  ->  local transpose tile spmv + psum over `row_axis`
                  (y row-sharded, result col-sharded)

    — one partial-vector all-reduce per matvec, nothing replicated:
    the sparse analogue of the dense 2D GSPMD layout in
    mesh.shard_pdhg_2d, and the layout for ONE large LP spanning a
    multi-chip slice."""

    def __init__(self, stacked, treedef, mesh: Mesh, row_axis: str,
                 col_axis: str, shape: Tuple[int, int], m_local: int,
                 n_local: int):
        self.stacked = stacked
        self.treedef = treedef
        self.mesh = mesh
        self.row_axis = row_axis
        self.col_axis = col_axis
        self._shape = tuple(shape)
        self.m_local = m_local
        self.n_local = n_local

    @property
    def shape(self):
        return self._shape

    def tree_flatten(self):
        return (tuple(self.stacked),
                (self.treedef, self.mesh, self.row_axis, self.col_axis,
                 self._shape, self.m_local, self.n_local))

    @classmethod
    def tree_unflatten(cls, aux, children):
        (treedef, mesh, row_axis, col_axis, shape, m_local,
         n_local) = aux
        return cls(list(children), treedef, mesh, row_axis, col_axis,
                   shape, m_local, n_local)

    def _local(self, leaves):
        return jax.tree.unflatten(self.treedef,
                                  [a[0, 0] for a in leaves])

    def mv(self, x):
        """K @ x: x col-sharded (n,), result row-sharded (m,)."""
        def f(leaves, xx):
            part = self._local(leaves).mv(xx)
            return jax.lax.psum(part, self.col_axis)

        return shard_map(
            f, mesh=self.mesh,
            in_specs=(P(self.row_axis, self.col_axis),
                      P(self.col_axis)),
            out_specs=P(self.row_axis),
            check_vma=False)(tuple(self.stacked), x)

    def rmv(self, y):
        """K' @ y: y row-sharded (m,), result col-sharded (n,)."""
        def f(leaves, yy):
            part = self._local(leaves).rmv(yy)
            return jax.lax.psum(part, self.row_axis)

        return shard_map(
            f, mesh=self.mesh,
            in_specs=(P(self.row_axis, self.col_axis),
                      P(self.row_axis)),
            out_specs=P(self.col_axis),
            check_vma=False)(tuple(self.stacked), y)

    def astype_values(self, dtype):
        new = [a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
               else a for a in self.stacked]
        return TwoDShardedOp(new, self.treedef, self.mesh,
                             self.row_axis, self.col_axis, self._shape,
                             self.m_local, self.n_local)

    def value_dtype(self):
        for a in self.stacked:
            if jnp.issubdtype(a.dtype, jnp.floating):
                return a.dtype
        return jnp.float32


def make_2d_sharded(mat: sp.spmatrix, mesh: Mesh, row_axis: str,
                    col_axis: str, fmt: str = "choose",
                    dtype=jnp.float32) -> Tuple["TwoDShardedOp", int,
                                                int]:
    """Build a TwoDShardedOp: pad to multiples of 128*R x 128*C, split
    into an R x C tile grid, build each tile's local operator (its
    index tables are tile-local by construction), pad leaves to common
    shapes and stack with two leading mesh axes.  Returns
    (op, m_pad, n_pad)."""
    r = int(mesh.shape[row_axis])
    c = int(mesh.shape[col_axis])
    m, n = mat.shape
    m_pad = ((m + 128 * r - 1) // (128 * r)) * (128 * r)
    n_pad = ((n + 128 * c - 1) // (128 * c)) * (128 * c)
    csr = mat.tocsr().copy()
    csr.resize((m_pad, n_pad))
    m_local = m_pad // r
    n_local = n_pad // c

    grid = []
    for i in range(r):
        row_tiles = []
        rows = csr[i * m_local:(i + 1) * m_local, :]
        for j in range(c):
            tile = rows[:, j * n_local:(j + 1) * n_local]
            if fmt == "blockcsr":
                from ..ops.block_csr import from_scipy_block_csr
                row_tiles.append(from_scipy_block_csr(tile,
                                                      dtype=dtype))
            elif fmt == "ell":
                row_tiles.append(linops.from_scipy_ell(tile,
                                                       dtype=dtype))
            else:
                row_tiles.append(linops.from_scipy_panel_ell(
                    tile, dtype=dtype))
        grid.append(row_tiles)

    treedef = None
    leaves_grid = []
    for i in range(r):
        row_leaves = []
        for j in range(c):
            leaves, treedef = jax.tree.flatten(grid[i][j])
            row_leaves.append([np.asarray(v) for v in leaves])
        leaves_grid.append(row_leaves)
    kinds = _leaf_kinds(grid[0][0])
    n_leaves = len(leaves_grid[0][0])
    stacked = []
    for li in range(n_leaves):
        shapes = [leaves_grid[i][j][li].shape
                  for i in range(r) for j in range(c)]
        target = tuple(max(s[k] for s in shapes)
                       for k in range(len(shapes[0])))
        arrs = [[_pad_leaf(leaves_grid[i][j][li], target, kinds[li],
                           m_local) for j in range(c)]
                for i in range(r)]
        stk = jnp.asarray(np.stack(
            [np.stack(row) for row in arrs]))
        stacked.append(jax.device_put(
            stk, NamedSharding(mesh, P(row_axis, col_axis))))
    return (TwoDShardedOp(stacked, treedef, mesh, row_axis, col_axis,
                          (m_pad, n_pad), m_local, n_local),
            m_pad, n_pad)
