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


class EllMatrix(NamedTuple):
    """Padded-ELL operator with a COO spill tail — the TPU format for
    UNSTRUCTURED sparsity at scale.

    Each matvec is `sum(val * x[idx], axis=1)`: a handful of dense
    vectorized gathers, no scatter.  On a 50k x 50k LP with 5e5
    scattered nonzeros this runs ~300x faster on TPU than BCOO (whose
    generic scatter lowering crawls) and ~5000x less memory than
    block-CSR tiles (scattered nonzeros touch every 128x128 tile).
    Rows longer than the ELL width spill to a tiny COO tail handled
    with one sorted segment_sum.  Cf. the cuSPARSE CSR role in the
    reference's GPU PDLP (highs/pdlp/cupdlp/cuda/)."""
    idx: jax.Array       # (m, w)  int32 column indices, 0-padded
    val: jax.Array       # (m, w)  values, 0-padded
    idx_t: jax.Array     # (n, wt) transpose ELL
    val_t: jax.Array
    tail_seg: jax.Array    # (t,) row ids (sorted) of spilled entries
    tail_col: jax.Array    # (t,)
    tail_val: jax.Array    # (t,)
    tail_seg_t: jax.Array  # transpose spill
    tail_col_t: jax.Array
    tail_val_t: jax.Array

    @property
    def shape(self):
        return (self.idx.shape[0], self.idx_t.shape[0])

    def mv(self, x):
        out = jnp.sum(self.val * x[self.idx], axis=1)
        if self.tail_seg.shape[0]:
            out = out + jax.ops.segment_sum(
                self.tail_val * x[self.tail_col], self.tail_seg,
                num_segments=self.idx.shape[0],
                indices_are_sorted=True)
        return out

    def rmv(self, y):
        out = jnp.sum(self.val_t * y[self.idx_t], axis=1)
        if self.tail_seg_t.shape[0]:
            out = out + jax.ops.segment_sum(
                self.tail_val_t * y[self.tail_col_t], self.tail_seg_t,
                num_segments=self.idx_t.shape[0],
                indices_are_sorted=True)
        return out


class BucketPanelEllMatrix(NamedTuple):
    """Bucketed panel-gather ELL: rows grouped by nonzero count into a
    small width ladder, each bucket padded to its own width.

    The TPU XLA gather wall is per-GATHER-OP (~2-4ns each, payload
    width free — see PanelEllMatrix), so SpMV cost is proportional to
    the TOTAL padded slot count Sum_b m_b * w_b.  A single global p92
    width pays ~2x padding over the mean row count; the ladder brings
    slots to ~1.15x nnz.  Measured on the 50k x 50k / 5e5-nnz
    flagship: 1.91 ms/matvec vs 3.06 for single-width panel ELL.
    Rows beyond the top width spill to a sorted-COO segment_sum tail;
    bucket outputs are re-ordered with one (m,)-gather (~0.15 ms,
    included in the measurement).
    """
    fwd: tuple          # per-bucket (panel, lane, val) arrays, row side
    inv: jax.Array      # (m,) int32: concat(bucket outs)[inv] = out
    fwd_t: tuple        # transpose side buckets
    inv_t: jax.Array
    tail_seg: jax.Array
    tail_col: jax.Array
    tail_val: jax.Array
    tail_seg_t: jax.Array
    tail_col_t: jax.Array
    tail_val_t: jax.Array

    @property
    def shape(self):
        return (self.inv.shape[0], self.inv_t.shape[0])

    def _half(self, x, buckets, inv, tail_seg, tail_col, tail_val):
        m = inv.shape[0]
        xp = x.reshape(x.shape[0] // 128, 128)
        lanes = jnp.arange(128, dtype=jnp.int32)
        outs = []
        done = 0
        for (panel, lane, val) in buckets:
            mb, w = panel.shape
            out = jnp.zeros((mb,), x.dtype)
            for k in range(w):
                rows = xp[panel[:, k]]             # (mb, 128) gather
                pick = jnp.sum(
                    jnp.where(lanes[None, :] == lane[:, k, None],
                              rows, 0),
                    axis=1)
                out = out + val[:, k] * pick
            outs.append(out)
            done += mb
        if done < m:  # empty rows live in a compute-free bucket
            outs.append(jnp.zeros((m - done,), x.dtype))
        full = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        out = full[inv]
        if tail_seg.shape[0]:
            out = out + jax.ops.segment_sum(
                tail_val * x[tail_col], tail_seg, num_segments=m,
                indices_are_sorted=True)
        return out

    def mv(self, x):
        return self._half(x, self.fwd, self.inv, self.tail_seg,
                          self.tail_col, self.tail_val)

    def rmv(self, y):
        return self._half(y, self.fwd_t, self.inv_t, self.tail_seg_t,
                          self.tail_col_t, self.tail_val_t)


@jax.tree_util.register_pytree_node_class
class BucketPermEllMatrix:
    """Bucket-panel ELL over a PRE-PERMUTED matrix: the caller bakes
    the bucket row/column orders into the problem itself (rows sorted
    by nonzero-count bucket for `mv`, columns likewise for `rmv`), so
    the bucket outputs concatenate STRAIGHT into the result — no
    un-permute gather, nothing to break XLA's fusion of the PDHG
    elementwise chain (the cost that made plain bucket ELL slower
    in-loop despite the lower slot count, r4 note above)."""

    def __init__(self, fwd, fwd_t, tails, shape):
        self.fwd = fwd          # per-bucket (panel, lane, val)
        self.fwd_t = fwd_t
        self.tails = tails      # (seg, col, val, seg_t, col_t, val_t)
        self._shape = tuple(shape)

    def tree_flatten(self):
        return ((self.fwd, self.fwd_t, self.tails), (self._shape,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        fwd, fwd_t, tails = children
        return cls(fwd, fwd_t, tails, aux[0])

    @property
    def shape(self):
        return self._shape

    def _half(self, x, buckets, m, tail_seg, tail_col, tail_val):
        xp = x.reshape(x.shape[0] // 128, 128)
        lanes = jnp.arange(128, dtype=jnp.int32)
        outs = []
        done = 0
        for (panel, lane, val) in buckets:
            mb, w = panel.shape
            out = jnp.zeros((mb,), x.dtype)
            for k in range(w):
                rows = xp[panel[:, k]]
                pick = jnp.sum(
                    jnp.where(lanes[None, :] == lane[:, k, None],
                              rows, 0),
                    axis=1)
                out = out + val[:, k] * pick
            outs.append(out)
            done += mb
        if done < m:
            outs.append(jnp.zeros((m - done,), x.dtype))
        out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        if tail_seg.shape[0]:
            out = out + jax.ops.segment_sum(
                tail_val * x[tail_col], tail_seg, num_segments=m,
                indices_are_sorted=True)
        return out

    def mv(self, x):
        s, c, v, _, _, _ = self.tails
        return self._half(x, self.fwd, self._shape[0], s, c, v)

    def rmv(self, y):
        _, _, _, s, c, v = self.tails
        return self._half(y, self.fwd_t, self._shape[1], s, c, v)


def bucket_row_perm(csr: sp.csr_matrix) -> np.ndarray:
    """The row order `_bucket_panel_half` would assign: width buckets
    ascending, then long rows, then empty rows — pre-permuting a
    matrix by this makes its bucket outputs naturally ordered."""
    cnt = np.diff(csr.indptr)
    order = []
    prev = 0
    for w in _BUCKET_WIDTHS:
        sel = np.nonzero((cnt > prev) & (cnt <= w))[0]
        prev = w
        if sel.size:
            order.append(sel)
    long_rows = np.nonzero(cnt > _BUCKET_WIDTHS[-1])[0]
    if long_rows.size:
        order.append(long_rows)
    empty = np.nonzero(cnt == 0)[0]
    if empty.size:
        order.append(empty)
    return (np.concatenate(order) if order
            else np.zeros(0, dtype=np.int64))


def from_scipy_bucket_perm(mat: sp.spmatrix,
                           dtype=jnp.float64) -> BucketPermEllMatrix:
    """Build the presorted-bucket operator.  `mat` must ALREADY be
    permuted by (bucket_row_perm(mat), bucket_row_perm(mat.T)) — the
    constructor verifies the resulting internal order is trivial."""
    m, n = mat.shape
    if m % 128 or n % 128:
        raise ValueError(f"128-aligned shape required, got {(m, n)}")
    csr = mat.tocsr()
    csr.sum_duplicates()
    csr_t = csr.T.tocsr()
    b_a, i_a, s_a, c_a, t_a = _bucket_panel_half(csr, dtype)
    b_t, i_t, s_t, c_t, t_t = _bucket_panel_half(csr_t, dtype)
    if not np.array_equal(np.asarray(i_a), np.arange(m)) or \
            not np.array_equal(np.asarray(i_t), np.arange(n)):
        raise ValueError("matrix not in bucket order — permute with "
                         "bucket_row_perm first")
    return BucketPermEllMatrix(
        b_a, b_t, (s_a, c_a, t_a, s_t, c_t, t_t), (m, n))


_BUCKET_WIDTHS = (2, 4, 6, 8, 12, 16, 24, 32, 48, 64)


def _bucket_panel_half(csr: sp.csr_matrix, dtype):
    """(buckets, inv, tail_seg, tail_col, tail_val) for one side."""
    nr = csr.shape[0]
    cnt = np.diff(csr.indptr)
    wmax = _BUCKET_WIDTHS[-1]
    buckets = []
    order = []
    prev = 0
    for w in _BUCKET_WIDTHS:
        sel = np.nonzero((cnt > prev) & (cnt <= w))[0]
        prev = w
        if sel.size == 0:
            continue
        take = np.minimum(cnt[sel], w)
        panel = np.zeros((sel.size, w), np.int32)
        lane = np.zeros((sel.size, w), np.int32)
        val = np.zeros((sel.size, w), np.float64)
        for k in range(w):
            smask = take > k
            pos = csr.indptr[sel[smask]] + k
            panel[smask, k] = csr.indices[pos] // 128
            lane[smask, k] = csr.indices[pos] % 128
            val[smask, k] = csr.data[pos]
        buckets.append((jnp.asarray(panel), jnp.asarray(lane),
                        jnp.asarray(val, dtype=dtype)))
        order.append(sel)
    long_rows = np.nonzero(cnt > wmax)[0]
    if long_rows.size:
        # long rows: first wmax entries ride the top bucket, the rest
        # spill to the COO tail
        take = np.full(long_rows.size, wmax)
        panel = np.zeros((long_rows.size, wmax), np.int32)
        lane = np.zeros((long_rows.size, wmax), np.int32)
        val = np.zeros((long_rows.size, wmax), np.float64)
        for k in range(wmax):
            pos = csr.indptr[long_rows] + k
            panel[:, k] = csr.indices[pos] // 128
            lane[:, k] = csr.indices[pos] % 128
            val[:, k] = csr.data[pos]
        buckets.append((jnp.asarray(panel), jnp.asarray(lane),
                        jnp.asarray(val, dtype=dtype)))
        order.append(long_rows)
    empty = np.nonzero(cnt == 0)[0]
    if empty.size:
        order.append(empty)
    perm = (np.concatenate(order) if order
            else np.zeros(0, dtype=np.int64))
    inv_pos = np.empty(nr, dtype=np.int32)
    inv_pos[perm] = np.arange(nr, dtype=np.int32)
    segs, colss, valss = [], [], []
    for r in long_rows:
        s, e = csr.indptr[r] + wmax, csr.indptr[r + 1]
        segs.append(np.full(e - s, r, np.int32))
        colss.append(csr.indices[s:e])
        valss.append(csr.data[s:e])
    if segs:
        seg = np.concatenate(segs)
        col = np.concatenate(colss).astype(np.int32)
        vv = np.concatenate(valss)
    else:
        seg = np.zeros(0, np.int32)
        col = np.zeros(0, np.int32)
        vv = np.zeros(0, np.float64)
    return (tuple(buckets), jnp.asarray(inv_pos), jnp.asarray(seg),
            jnp.asarray(col), jnp.asarray(vv, dtype=dtype))


def from_scipy_bucket_panel_ell(mat: sp.spmatrix,
                                dtype=jnp.float64
                                ) -> BucketPanelEllMatrix:
    """Build a BucketPanelEllMatrix (128-aligned shape required)."""
    m, n = mat.shape
    if m % 128 or n % 128:
        raise ValueError(
            f"BucketPanelEllMatrix needs 128-aligned shape, got "
            f"{(m, n)}")
    csr = mat.tocsr()
    csr.sum_duplicates()
    csr_t = csr.T.tocsr()
    b_a, i_a, s_a, c_a, t_a = _bucket_panel_half(csr, dtype)
    b_t, i_t, s_t, c_t, t_t = _bucket_panel_half(csr_t, dtype)
    return BucketPanelEllMatrix(
        b_a, i_a, b_t, i_t, s_a, c_a, t_a, s_t, c_t, t_t)


class PanelEllMatrix(NamedTuple):
    """Panel-gather ELL operator — the fast TPU format for UNSTRUCTURED
    sparsity at scale.

    TPU XLA gathers run at a fixed per-GATHER-OP rate (~4ns each,
    measured on v5e) regardless of how many bytes each op moves, so the
    way to speed up an SpMV is to move MORE data per gather: instead of
    gathering scalar x[c] per nonzero (EllMatrix), gather the whole
    128-wide PANEL x[128*(c//128) : 128*(c//128)+128] the nonzero's
    column lives in, then select the lane c%128 with an on-the-fly
    iota==lane compare (pure VPU work that XLA fuses).  Measured on the
    50k x 50k / 5e5-nnz flagship: 3.0 ms/matvec vs 9.4 ms for the
    element-gather ELL (both f32).  The ELL width is capped at the p92
    row count (measured optimum on the 50k flagship: 2.98 vs 3.23
    ms/matvec at p97); longer rows spill to a sorted-COO tail folded in with one
    segment_sum.  Cf. the cuSPARSE CSR role in the reference GPU PDLP
    (highs/pdlp/cupdlp/cuda/); this layout is the TPU answer to the same
    SpMV contract."""
    panel: jax.Array     # (m, w)  int32 column-panel indices (col // 128)
    lane: jax.Array      # (m, w)  int32 lane indices (col % 128)
    val: jax.Array       # (m, w)  values, 0-padded
    panel_t: jax.Array   # transpose side
    lane_t: jax.Array
    val_t: jax.Array
    tail_seg: jax.Array  # COO spill (sorted by row)
    tail_col: jax.Array
    tail_val: jax.Array
    tail_seg_t: jax.Array
    tail_col_t: jax.Array
    tail_val_t: jax.Array

    @property
    def shape(self):
        return (self.panel.shape[0], self.panel_t.shape[0])

    def _half(self, x, panel, lane, val, tail_seg, tail_col, tail_val,
              x_len):
        m = panel.shape[0]
        w = panel.shape[1]
        xp = x.reshape(x_len // 128, 128)
        lanes = jnp.arange(128, dtype=jnp.int32)
        out = jnp.zeros((m,), x.dtype)
        for k in range(w):
            rows = xp[panel[:, k]]                     # (m, 128) row gather
            pick = jnp.sum(
                jnp.where(lanes[None, :] == lane[:, k, None], rows, 0),
                axis=1)
            out = out + val[:, k] * pick
        if tail_seg.shape[0]:
            out = out + jax.ops.segment_sum(
                tail_val * x[tail_col], tail_seg, num_segments=m,
                indices_are_sorted=True)
        return out

    def mv(self, x):
        return self._half(x, self.panel, self.lane, self.val,
                          self.tail_seg, self.tail_col, self.tail_val,
                          x.shape[0])

    def rmv(self, y):
        return self._half(y, self.panel_t, self.lane_t, self.val_t,
                          self.tail_seg_t, self.tail_col_t,
                          self.tail_val_t, y.shape[0])


def _panel_ell_half(csr: sp.csr_matrix, dtype, width_pct: float = 92.0):
    """(panel, lane, val, tail_seg, tail_col, tail_val) for one side.

    Requires csr.shape[1] % 128 == 0 (the caller pads)."""
    nr = csr.shape[0]
    cnt = np.diff(csr.indptr)
    if nr == 0 or cnt.max(initial=0) == 0:
        w = 1
    else:
        # percentile over REAL (nonempty) rows only: power-of-two
        # bucketing / 128-multiple mesh padding can make up to ~half
        # the rows all-zero padding, which would deflate the width and
        # spill real nonzeros into the slower COO tail
        real = cnt[cnt > 0]
        w = max(1, int(np.percentile(real, width_pct)))
    panel = np.zeros((nr, w), np.int32)
    lane = np.zeros((nr, w), np.int32)
    val = np.zeros((nr, w), np.float64)
    take = np.minimum(cnt, w)
    for k in range(w):
        sel = take > k
        pos = csr.indptr[:-1][sel] + k
        panel[sel, k] = csr.indices[pos] // 128
        lane[sel, k] = csr.indices[pos] % 128
        val[sel, k] = csr.data[pos]
    spill_rows = np.nonzero(cnt > w)[0]
    segs, colss, valss = [], [], []
    for r in spill_rows:
        s, e = csr.indptr[r] + w, csr.indptr[r + 1]
        segs.append(np.full(e - s, r, np.int32))
        colss.append(csr.indices[s:e])
        valss.append(csr.data[s:e])
    if segs:
        seg = np.concatenate(segs)
        col = np.concatenate(colss).astype(np.int32)
        vv = np.concatenate(valss)
    else:
        seg = np.zeros(0, np.int32)
        col = np.zeros(0, np.int32)
        vv = np.zeros(0, np.float64)
    return (jnp.asarray(panel), jnp.asarray(lane),
            jnp.asarray(val, dtype=dtype), jnp.asarray(seg),
            jnp.asarray(col), jnp.asarray(vv, dtype=dtype))


def from_scipy_panel_ell(mat: sp.spmatrix,
                         dtype=jnp.float64) -> PanelEllMatrix:
    """Build a PanelEllMatrix.  Both dimensions must be multiples of 128
    (the PDLP wrapper's bucket padding guarantees this); the reshape in
    mv/rmv views x as (n/128, 128) panels."""
    m, n = mat.shape
    if m % 128 or n % 128:
        raise ValueError(
            f"PanelEllMatrix needs 128-aligned shape, got {(m, n)}")
    csr = mat.tocsr()
    csr_t = csr.T.tocsr()
    p_a, l_a, v_a, s_a, c_a, t_a = _panel_ell_half(csr, dtype)
    p_t, l_t, v_t, s_t, c_t, t_t = _panel_ell_half(csr_t, dtype)
    return PanelEllMatrix(
        p_a, l_a, v_a, p_t, l_t, v_t, s_a, c_a, t_a, s_t, c_t, t_t)


def _ell_half(csr: sp.csr_matrix, dtype):
    """(idx, val, tail_seg, tail_col, tail_val) for one orientation."""
    nr = csr.shape[0]
    cnt = np.diff(csr.indptr)
    mean_w = max(1.0, float(cnt.mean()))
    w = int(min(cnt.max() if nr else 1, np.ceil(4.0 * mean_w) + 4))
    idx = np.zeros((nr, w), np.int32)
    val = np.zeros((nr, w), np.float64)
    take = np.minimum(cnt, w)
    for k in range(w):
        sel = take > k
        pos = csr.indptr[:-1][sel] + k
        idx[sel, k] = csr.indices[pos]
        val[sel, k] = csr.data[pos]
    # spill: entries beyond w per row, in row order (sorted segments)
    spill_rows = np.nonzero(cnt > w)[0]
    segs, colss, valss = [], [], []
    for r in spill_rows:
        s, e = csr.indptr[r] + w, csr.indptr[r + 1]
        segs.append(np.full(e - s, r, np.int32))
        colss.append(csr.indices[s:e])
        valss.append(csr.data[s:e])
    if segs:
        seg = np.concatenate(segs)
        col = np.concatenate(colss).astype(np.int32)
        vv = np.concatenate(valss)
    else:
        seg = np.zeros(0, np.int32)
        col = np.zeros(0, np.int32)
        vv = np.zeros(0, np.float64)
    return (jnp.asarray(idx), jnp.asarray(val, dtype=dtype),
            jnp.asarray(seg), jnp.asarray(col),
            jnp.asarray(vv, dtype=dtype))


def from_scipy_ell(mat: sp.spmatrix, dtype=jnp.float64) -> EllMatrix:
    csr = mat.tocsr()
    csr_t = mat.T.tocsr()
    i_a, v_a, s_a, c_a, t_a = _ell_half(csr, dtype)
    i_t, v_t, s_t, c_t, t_t = _ell_half(csr_t, dtype)
    return EllMatrix(i_a, v_a, i_t, v_t, s_a, c_a, t_a, s_t, c_t, t_t)


LinOp = Union[DenseMatrix, BcooMatrix, EllMatrix, PanelEllMatrix,
              "OneHotSpmv"]


def linop_dtype(op) -> jnp.dtype:
    if isinstance(op, DenseMatrix):
        return op.a.dtype
    if isinstance(op, BcooMatrix):
        return op.a.data.dtype
    if isinstance(op, (EllMatrix, PanelEllMatrix)):
        return op.val.dtype
    if hasattr(op, "value_dtype"):   # RowShardedOp (parallel/shard_ops)
        return op.value_dtype()
    return jnp.float32


def cast_linop(op, dtype):
    """Low-precision copy of an operator (float leaves only).

    Used for mixed-precision PDHG stepping: the step matvecs run on a
    bfloat16 copy of K (half the HBM bytes => ~1.6x step rate on TPU),
    while residuals/metrics keep the full-precision operator.  Returns
    None when the operator type has no low-precision path."""
    if isinstance(op, DenseMatrix):
        return DenseMatrix(op.a.astype(dtype))
    if isinstance(op, (EllMatrix, PanelEllMatrix)):
        return op._replace(
            val=op.val.astype(dtype), val_t=op.val_t.astype(dtype),
            tail_val=op.tail_val.astype(dtype),
            tail_val_t=op.tail_val_t.astype(dtype))
    if hasattr(op, "astype_values"):  # RowShardedOp
        return op.astype_values(dtype)
    return None


def from_scipy(mat: sp.spmatrix, fmt: str = "choose",
               dtype=jnp.float64) -> LinOp:
    """Build a device operator from a scipy sparse matrix.

    fmt: "dense" / "bcoo" / "blockcsr" / "ell" / "panelell" / "choose".
    "choose" uses dense whenever the dense array is below ~256 MB
    (MXU-friendly); beyond that the Pallas block-CSR kernel when the
    tile structure is compact, else a gather ELL: panel-gather on TPU
    (XLA TPU gathers are per-op-rate-limited, so amortize 128 lanes per
    gather), element-gather on CPU (CPU gathers are cheap and the panel
    trick's 128x compare work is pure overhead there).
    """
    m, n = mat.shape
    if fmt == "choose":
        itemsize = jnp.dtype(dtype).itemsize
        dense_bytes = m * n * itemsize
        if dense_bytes <= (256 << 20):
            fmt = "dense"
        else:
            # blocky structure -> Pallas block-CSR tiles on the MXU;
            # scattered structure -> gather ELL.  A tile is worth
            # materializing when its fill ratio is high enough that
            # the dense 128x128 tile beats the gather traffic.
            coo = mat.tocoo()
            tiles = len(set(zip((coo.row // 128).tolist(),
                                (coo.col // 128).tolist())))
            tile_bytes = max(1, tiles) * 128 * 128 * itemsize
            fill = mat.nnz * itemsize / tile_bytes
            if fill >= 0.2 and tile_bytes <= (2048 << 20):
                fmt = "blockcsr"
            else:
                import jax as _jax
                # scattered structure: panel-gather ELL by default.
                # The one-hot padded-cell layout (ops/onehot_spmv.py,
                # fmt="onehot") replaces every per-element gather with
                # lane-iota expansion in VMEM — on the tunneled
                # v5e-lite (150 GB/s HBM, ~1/5 VPU) it lands at ~2.7
                # ms/matvec vs panel-ELL's ~1.4 on the 50k flagship,
                # so it ships opt-in; on full-grade parts the
                # expansion is VPU-bound and the balance flips.
                fmt = ("panelell"
                       if _jax.default_backend() != "cpu"
                       and m % 128 == 0 and n % 128 == 0 else "ell")
    if fmt == "panelell":
        return from_scipy_panel_ell(mat, dtype=dtype)
    if fmt == "bucketell":
        # bucketed-width panel ELL: fastest isolated matvec (1.91 vs
        # 3.06 ms on the 50k flagship) but measured SLOWER inside the
        # fused PDHG window (248 vs 283 it/s warm): the un-permute
        # gather + concat break XLA's fusion of the step elementwise
        # chain.  Kept as an explicit option for workloads where the
        # matvec dominates a less fusion-friendly loop.
        return from_scipy_bucket_panel_ell(mat, dtype=dtype)
    if fmt == "ell":
        return from_scipy_ell(mat, dtype=dtype)
    if fmt == "onehot":
        from .onehot_spmv import from_scipy_onehot
        return from_scipy_onehot(mat, dtype=dtype)
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
