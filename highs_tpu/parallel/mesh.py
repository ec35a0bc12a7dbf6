"""Device mesh and sharding layout for the PDHG solver.

The TPU-native replacement for the reference's shared-memory scheduler
(highs/parallel/, SURVEY §2.11): data parallelism over the constraint
matrix instead of task parallelism over threads.

Layout (1D mesh, axis "rows"): K is sharded by block-rows, all row-space
vectors (y, b, is_eq, inv_row_scale) are sharded the same way and all
column-space vectors (x, c, bounds) are replicated.  Under jit/GSPMD:

- K x          -> local matmul, result row-sharded (no communication)
- K' y         -> local matmul + all-reduce (psum) over "rows" (ICI)
- row-space norms/dots -> local + psum

so each PDHG step costs exactly one all-reduce of an n-vector plus one
scalar-tree reduce — the minimal communication for this iteration.  A
second mesh axis "batch" shards instance batches (vmapped solves).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "rows"
BATCH_AXIS = "batch"


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = (ROW_AXIS,),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    n_needed = int(np.prod(shape))
    dev_array = np.asarray(devices[:n_needed]).reshape(shape)
    return Mesh(dev_array, axis_names)


def parse_mesh_shape(spec: str) -> Optional[Tuple[int, ...]]:
    """Parse an option string like '4x2' or '8'."""
    spec = spec.strip()
    if not spec:
        return None
    return tuple(int(p) for p in spec.split("x"))


def shard_pdhg(problem, state, mesh: Mesh, row_axis: str = ROW_AXIS):
    """Place a PdhgProblem/PdhgState on the mesh with the row layout.

    Row-space arrays go to P(row_axis); column-space and scalars are
    replicated.  Returns (problem, state) device_put with NamedShardings;
    jit then propagates the layout through the whole PDHG block.
    """
    row = NamedSharding(mesh, P(row_axis))
    rep = NamedSharding(mesh, P())
    row_mat = NamedSharding(mesh, P(row_axis, None))

    def put(x, sh):
        return jax.device_put(x, sh)

    k_op = problem.k_op
    # DenseMatrix: shard the (m, n) array by rows
    if hasattr(k_op, "a") and hasattr(k_op.a, "ndim") and k_op.a.ndim == 2:
        k_op = type(k_op)(put(k_op.a, row_mat))
    elif hasattr(k_op, "idx"):
        # EllMatrix: the row-oriented gather tables shard by rows; the
        # transpose tables live in column space (replicated), and the
        # spill tails are tiny
        rep_mat = NamedSharding(mesh, P())
        k_op = k_op._replace(
            idx=put(k_op.idx, row_mat), val=put(k_op.val, row_mat),
            idx_t=put(k_op.idx_t, rep_mat),
            val_t=put(k_op.val_t, rep_mat),
            tail_seg=put(k_op.tail_seg, rep),
            tail_col=put(k_op.tail_col, rep),
            tail_val=put(k_op.tail_val, rep),
            tail_seg_t=put(k_op.tail_seg_t, rep),
            tail_col_t=put(k_op.tail_col_t, rep),
        )
    problem = problem._replace(
        k_op=k_op,
        b=put(problem.b, row),
        c=put(problem.c, rep),
        lo=put(problem.lo, rep),
        up=put(problem.up, rep),
        is_eq=put(problem.is_eq, row),
        lo_fin=put(problem.lo_fin, rep),
        up_fin=put(problem.up_fin, rep),
        inv_row_scale=put(problem.inv_row_scale, row),
        inv_col_scale=put(problem.inv_col_scale, rep),
        norm_b=put(problem.norm_b, rep),
        norm_c=put(problem.norm_c, rep),
        y_lo=(None if problem.y_lo is None else put(problem.y_lo, row)))
    state = state._replace(
        x=put(state.x, rep), y=put(state.y, row),
        x_pd=put(state.x_pd, rep), y_pd=put(state.y_pd, row),
        x_anchor=put(state.x_anchor, rep), y_anchor=put(state.y_anchor, row),
        aty=put(state.aty, rep),
        k=put(state.k, rep), eta=put(state.eta, rep),
        omega=put(state.omega, rep))
    return problem, state


COL_AXIS = "cols"


def shard_pdhg_2d(problem, state, mesh: Mesh, row_axis: str = ROW_AXIS,
                  col_axis: str = COL_AXIS, mat=None, fmt: str = "ell"):
    """2D block layout (SURVEY §7.3): K is partitioned into
    (rows x cols) blocks; row-space vectors shard over `row_axis`,
    column-space vectors over `col_axis`.

    Under jit/GSPMD each product is halo-free:
    - K x   -> local block matmuls + psum over `col_axis`
               (result row-sharded)
    - K' y  -> local block matmuls + psum over `row_axis`
               (result col-sharded)
    so both PDHG matvecs cost one partial-vector all-reduce each and
    every elementwise update stays fully local.  This is the layout
    for a single large LP spanning a pod slice; the 1D `shard_pdhg`
    row layout is preferred while K fits a replicated column space.
    DenseMatrix shards in place via GSPMD; sparse operators tile into
    per-device local-index operators (pass the scipy matrix as `mat`).
    """
    row = NamedSharding(mesh, P(row_axis))
    col = NamedSharding(mesh, P(col_axis))
    rep = NamedSharding(mesh, P())
    blk = NamedSharding(mesh, P(row_axis, col_axis))

    def put(x, sh):
        return jax.device_put(x, sh)

    k_op = problem.k_op
    if hasattr(k_op, "a") and hasattr(k_op.a, "ndim") and \
            k_op.a.ndim == 2:
        # dense: GSPMD partitions the matmul from the blk sharding
        k_op = type(k_op)(put(k_op.a, blk))
    elif mat is not None:
        # SPARSE 2D block tiling (SURVEY §7.3): per-tile local index
        # tables, Kx = psum over cols, K'y = psum over rows
        # (shard_ops.TwoDShardedOp); `mat` is the scipy matrix the
        # operator was built from, padded to the problem's shape
        from .shard_ops import make_2d_sharded
        k_op, m2, n2 = make_2d_sharded(mat, mesh, row_axis, col_axis,
                                       fmt=fmt,
                                       dtype=problem.b.dtype)
        if (m2, n2) != (len(problem.b), len(problem.c)):
            raise ValueError(
                f"2D tiling changed the padded shape: {(m2, n2)} vs "
                f"{(len(problem.b), len(problem.c))}; pad the input "
                f"to multiples of 128*mesh dims first")
    else:
        raise ValueError(
            "2D block sharding of a sparse operator needs the scipy "
            "matrix via mat=; only DenseMatrix shards in place")
    problem = problem._replace(
        k_op=k_op,
        b=put(problem.b, row),
        c=put(problem.c, col),
        lo=put(problem.lo, col),
        up=put(problem.up, col),
        is_eq=put(problem.is_eq, row),
        lo_fin=put(problem.lo_fin, col),
        up_fin=put(problem.up_fin, col),
        inv_row_scale=put(problem.inv_row_scale, row),
        inv_col_scale=put(problem.inv_col_scale, col),
        norm_b=put(problem.norm_b, rep),
        norm_c=put(problem.norm_c, rep),
        y_lo=(None if problem.y_lo is None else put(problem.y_lo, row)))
    state = state._replace(
        x=put(state.x, col), y=put(state.y, row),
        x_pd=put(state.x_pd, col), y_pd=put(state.y_pd, row),
        x_anchor=put(state.x_anchor, col),
        y_anchor=put(state.y_anchor, row),
        aty=put(state.aty, col),
        k=put(state.k, rep), eta=put(state.eta, rep),
        omega=put(state.omega, rep))
    return problem, state
