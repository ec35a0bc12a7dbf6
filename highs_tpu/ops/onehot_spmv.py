"""Gather-free SpMV for SCATTERED sparsity (the flagship PDLP shape).

The reference PDLP's only kernels are SpMV y = Kx / K'y (cuSPARSE in
pdlp/cupdlp/cuda; hipdlp GPU path pdhg.cc:610-632).  On TPU, per-element
XLA gathers cost ~2-4ns EACH regardless of payload, so a 500k-nnz
scattered matrix runs at ~0.6 GFLOP/s (measured r4: the ELL gather wall,
docs/tpu.md).  This module removes every per-element gather/scatter
from the hot path:

1. PREPROCESS (host, once): nonzeros land in a dense padded cell tensor
   over 128x128 tile coordinates — cell (j, i) holds up to P nonzeros
   with column block j and row block i (local col, local row, value);
   the tail past P spills to a tiny COO remainder.
2. GATHER kernel (Pallas, grid over column blocks j): the "lookup"
   x_j[col] is computed as a lane-iota compare + masked reduction over
   the 128 lanes — a dense VPU sweep, no addressable gather at all:
       U[j, i, p] = val * sum_l [col == l] * x_j[l].
3. TRANSPOSE U (j-major) -> V (i-major): a dense XLA transpose — the
   radix pass of the permutation a sparse transpose would need.
4. SCATTER kernel (Pallas, grid over row blocks i): the scatter-add
   into 128 rows is the same trick transposed:
       y_i[l] = sum_{slots} [row == l] * V[i, slot].

Per SpMV the HBM traffic is the padded cell tensor (nb*mb*P values +
indices, ~2.4x nnz for Poisson-scattered instances) and the expansion
runs at VPU speed in VMEM.  Every index-map constant is np.int32:
under jax_enable_x64 Python ints trace as i64 and Mosaic refuses the
mixed transform (the r4 "failed to legalize func.func").
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

BLOCK = 128
_Z = np.int32(0)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@jax.tree_util.register_pytree_node_class
class OneHotCells:
    """One direction (K or K') in padded-cell layout.

    gcol/gval: (nb, Rg, 128) — gather-side slots, j-major (slot s of
    column block j encodes cell (j, i=s//P, p=s%P), padded with val 0).
    srow: (mb, Rs, 128) — scatter-side local-row indices, i-major.
    spill_*: COO remainder past the per-cell slot cap.
    """

    def __init__(self, gcol, gval, srow, spill_val, spill_row,
                 spill_col, shape, p_slots, pad_cnt):
        self.gcol = gcol
        self.gval = gval
        self.srow = srow
        self.spill_val = spill_val
        self.spill_row = spill_row
        self.spill_col = spill_col
        self.shape = tuple(shape)  # padded (m, n)
        self.p_slots = int(p_slots)
        self.pad_cnt = int(pad_cnt)

    def tree_flatten(self):
        return ((self.gcol, self.gval, self.srow, self.spill_val,
                 self.spill_row, self.spill_col),
                (self.shape, self.p_slots, self.pad_cnt))

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, p_slots, pad_cnt = aux
        return cls(*children, shape=shape, p_slots=p_slots,
                   pad_cnt=pad_cnt)


def _ceil_to(v: int, q: int) -> int:
    return -(-v // q) * q


def _build_cells(mat: sp.spmatrix, p_slots: int, dtype) -> OneHotCells:
    coo = mat.tocoo()
    m, n = mat.shape
    mb = -(-m // BLOCK)
    nb = -(-n // BLOCK)
    jb = coo.col // BLOCK
    ib = coo.row // BLOCK
    cell = jb.astype(np.int64) * mb + ib
    order = np.argsort(cell, kind="stable")
    cell_s = cell[order]
    slot = np.arange(len(cell_s), dtype=np.int64)
    starts = np.searchsorted(cell_s, np.arange(nb * mb), side="left")
    slot = slot - starts[cell_s]
    keep = slot < p_slots
    ks = order[keep]
    cv = np.zeros((nb, mb, p_slots), dtype=np.float32)
    cc = np.zeros((nb, mb, p_slots), dtype=np.int32)
    cr = np.zeros((nb, mb, p_slots), dtype=np.int32)
    cv[jb[ks], ib[ks], slot[keep]] = coo.data[ks]
    cc[jb[ks], ib[ks], slot[keep]] = coo.col[ks] % BLOCK
    cr[jb[ks], ib[ks], slot[keep]] = coo.row[ks] % BLOCK
    # gather side: j-major slots padded to (8, 128) grid tiles
    sg = _ceil_to(mb * p_slots, 8 * BLOCK)
    rg = sg // BLOCK
    gcol = np.zeros((nb, sg), dtype=np.int32)
    gval = np.zeros((nb, sg), dtype=np.float32)
    gcol[:, :mb * p_slots] = cc.reshape(nb, -1)
    gval[:, :mb * p_slots] = cv.reshape(nb, -1)
    # scatter side: i-major local rows padded to lane tiles (pad rows
    # map to row 0 — their V value is 0 by construction)
    ss = _ceil_to(nb * p_slots, 8 * BLOCK)
    rs = ss // BLOCK
    srow = np.zeros((mb, ss), dtype=np.int32)
    srow[:, :nb * p_slots] = np.transpose(cr, (1, 0, 2)).reshape(mb, -1)
    sp_ix = order[~keep]
    return OneHotCells(
        gcol=jnp.asarray(gcol.reshape(nb, rg, BLOCK)),
        gval=jnp.asarray(gval.reshape(nb, rg, BLOCK), dtype=dtype),
        srow=jnp.asarray(srow.reshape(mb, rs, BLOCK)),
        spill_val=jnp.asarray(coo.data[sp_ix], dtype=dtype),
        spill_row=jnp.asarray(coo.row[sp_ix].astype(np.int32)),
        spill_col=jnp.asarray(coo.col[sp_ix].astype(np.int32)),
        shape=(mb * BLOCK, nb * BLOCK),
        p_slots=p_slots, pad_cnt=int((~keep).sum()))


def _gather_kernel(col_ref, val_ref, x_ref, u_ref):
    """Grid step (j, t): one 8-slot-row tile of column block j —
    U = val * x_j[col] by lane-iota one-hot expansion.  The (8, 128,
    128) intermediate stays at 512 KB in VMEM (a full-Rg expansion
    blew past VMEM and serialized ~100x)."""
    x = x_ref[0][0:1, :]                  # (1, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, BLOCK, BLOCK), 2)
    xb = jnp.reshape(x, (1, 1, BLOCK))
    c8 = col_ref[0]                       # (8, 128)
    v8 = val_ref[0]
    g8 = jnp.sum(jnp.where(c8[:, :, None] == lane, xb, 0.0), axis=2)
    u_ref[0] = v8 * g8


def _scatter_kernel(row_ref, v_ref, y_ref):
    """Grid step (i, t): accumulate the 128-lane histogram of one
    8-slot-row tile into y_i (t iterates innermost; the same output
    block stays resident and accumulates)."""
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, BLOCK, BLOCK), 2)
    r8 = row_ref[0]
    v8 = v_ref[0]
    contrib = jnp.where(r8[:, :, None] == lane, v8[:, :, None], 0.0)
    s = jnp.sum(contrib, axis=(0, 1))[None, :]
    y_ref[0] += jnp.broadcast_to(s, (8, BLOCK))


@functools.partial(jax.jit, static_argnames=("mb", "nb", "p"))
def _spmv_cells(oc: OneHotCells, x: jax.Array, mb: int, nb: int,
                p: int) -> jax.Array:
    from jax.experimental import pallas as pl

    dtype = oc.gval.dtype
    rg = oc.gcol.shape[1]
    rs = oc.srow.shape[1]
    xb = jnp.broadcast_to(
        x.reshape(nb, 1, BLOCK).astype(dtype), (nb, 8, BLOCK))
    u = pl.pallas_call(
        _gather_kernel,
        grid=(nb, rg // 8),
        in_specs=[
            pl.BlockSpec((1, 8, BLOCK), lambda j, t: (j, t, _Z)),
            pl.BlockSpec((1, 8, BLOCK), lambda j, t: (j, t, _Z)),
            pl.BlockSpec((1, 8, BLOCK), lambda j, t: (j, _Z, _Z)),
        ],
        out_specs=pl.BlockSpec((1, 8, BLOCK), lambda j, t: (j, t, _Z)),
        out_shape=jax.ShapeDtypeStruct((nb, rg, BLOCK), dtype),
        interpret=_interpret(),
    )(oc.gcol, oc.gval, xb)
    # radix pass: strip lane padding, j-major -> i-major, re-pad
    u3 = u.reshape(nb, rg * BLOCK)[:, :mb * p].reshape(nb, mb, p)
    v3 = jnp.transpose(u3, (1, 0, 2)).reshape(mb, nb * p)
    v = jnp.zeros((mb, rs * BLOCK), dtype).at[:, :nb * p].set(
        v3).reshape(mb, rs, BLOCK)
    y = pl.pallas_call(
        _scatter_kernel,
        grid=(mb, rs // 8),
        in_specs=[
            pl.BlockSpec((1, 8, BLOCK), lambda i, t: (i, t, _Z)),
            pl.BlockSpec((1, 8, BLOCK), lambda i, t: (i, t, _Z)),
        ],
        out_specs=pl.BlockSpec((1, 8, BLOCK), lambda i, t: (i, _Z, _Z)),
        out_shape=jax.ShapeDtypeStruct((mb, 8, BLOCK), dtype),
        interpret=_interpret(),
    )(oc.srow, v)[:, 0, :].reshape(mb * BLOCK)
    if oc.spill_val.shape[0]:
        y = y.at[oc.spill_row].add(oc.spill_val * x[oc.spill_col])
    return y


class OneHotSpmv(NamedTuple):
    """Bidirectional operator: K and K' in padded-cell layout (the
    PDHG mv/rmv hot kernels)."""

    fwd: OneHotCells
    bwd: OneHotCells

    @property
    def shape(self):
        return (self.fwd.shape[0], self.fwd.shape[1])

    def mv(self, x):
        mb = self.fwd.shape[0] // BLOCK
        nb = self.fwd.shape[1] // BLOCK
        return _spmv_cells(self.fwd, x, mb, nb, self.fwd.p_slots)

    def rmv(self, y):
        mb = self.bwd.shape[0] // BLOCK
        nb = self.bwd.shape[1] // BLOCK
        return _spmv_cells(self.bwd, y, mb, nb, self.bwd.p_slots)


def choose_p(mat: sp.spmatrix) -> int:
    """Slot cap covering ~98% of cells; the tail spills to COO."""
    coo = mat.tocoo()
    mb = -(-mat.shape[0] // BLOCK)
    jb = (coo.col // BLOCK).astype(np.int64)
    ib = (coo.row // BLOCK).astype(np.int64)
    counts = np.bincount(jb * mb + ib)
    counts = counts[counts > 0]
    if not len(counts):
        return 1
    q = int(np.quantile(counts, 0.98))
    return int(max(1, min(12, q)))


def from_scipy_onehot(mat: sp.spmatrix, dtype=jnp.float32,
                      p_slots: Optional[int] = None) -> OneHotSpmv:
    if p_slots is None:
        p_slots = choose_p(mat)
    fwd = _build_cells(mat, p_slots, dtype)
    bwd = _build_cells(mat.T.tocsr(), p_slots, dtype)
    return OneHotSpmv(fwd=fwd, bwd=bwd)
