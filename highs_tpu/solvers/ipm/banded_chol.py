"""On-device blocked BANDED Cholesky for large SPD normal equations.

The reference factors AThetaA' with its own supernodal kernel
(highs/ipm/hipo/factorhighs/DenseFactHybrid.cpp); the r4 stack routed
>=20k-row SPD systems to host SuperLU — third-party host code in the
hot path.  This module is the TPU-first replacement for the structured
case that actually produces such systems at scale (grid/network flows,
staircase LPs): after a host RCM ordering the matrix is BANDED, and a
banded matrix factors as a sliding-window sequence of dense 128x128
block operations — Cholesky, triangular solves and syrk updates — all
MXU shapes, run as ONE `lax.scan` on device.

Layout: block rows of size NB=128; block-bandwidth W (number of
sub-diagonal block columns).  The factor row i holds blocks
L[i, i-W..i]; the left-looking scan carries the last W factor rows.
Device math is f32 — the caller wraps the solve in f64 iterative
refinement on the host (same protocol as the LDL'/SuperLU routes) and
falls back when the residual check fails.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import scipy.sparse as sp

NB = 128


def _as_module():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.lru_cache(maxsize=8)
def _factor_fn(nblk: int, w: int):
    jax, jnp = _as_module()

    def step(carry, ab_row):
        # carry: (w, w+1, NB, NB) last w factor rows (row r's blocks
        # r-w..r); ab_row: (w+1, NB, NB) band blocks A[i, i-w..i]
        prev = carry
        lrow = jnp.zeros((w + 1, NB, NB), ab_row.dtype)
        # off-diagonal blocks, nearest-first: d indexes column
        # k = i - w + d for d in [0, w)
        for d in range(w):
            acc = ab_row[d]
            # subtract sum_t L[i,t] @ L[k,t]^T for t in [i-w, k)
            for t in range(d):
                # L[k,t]: row k = i-w+d is carry row d (carry holds
                # rows i-w..i-1); its block for column t' = i-w+t is
                # at offset t' - (k - w) = t + w - d
                acc = acc - lrow[t] @ prev[d, t + w - d].T
            lkk = prev[d, w]  # diagonal block of row k
            # L[i,k] = acc @ L_kk^{-T}  (solve X L_kk^T = acc)
            lik = jax.scipy.linalg.solve_triangular(
                lkk, acc.T, lower=True).T
            lrow = lrow.at[d].set(lik)
        diag = ab_row[w]
        for t in range(w):
            diag = diag - lrow[t] @ lrow[t].T
        # dynamic RELATIVE regularization: flow-conservation normal
        # matrices are graph Laplacians (rank m-1) and late-IPM Theta
        # swings make trailing pivots vanish — in f32 an absolute
        # floor leaves NaN factors.  Scale the shift by the block's
        # own magnitude (the LDL' route's column-relative rule).
        scale = jnp.maximum(
            jnp.max(jnp.abs(jnp.diagonal(diag))), 1e-20)
        diag = diag + jnp.eye(NB, dtype=diag.dtype) * (3e-6 * scale)
        lii = jnp.linalg.cholesky(diag)
        # a still-failed block falls back to a scaled identity: its
        # rows solve to ~0 and the outer refinement absorbs the error
        bad = ~jnp.all(jnp.isfinite(lii))
        lii = jnp.where(bad,
                        jnp.eye(NB, dtype=diag.dtype) *
                        jnp.sqrt(scale), lii)
        lrow = lrow.at[w].set(lii)
        new_carry = jnp.concatenate([prev[1:], lrow[None]], axis=0)
        return new_carry, lrow

    @jax.jit
    def factor(ab):
        carry0 = jnp.zeros((w, w + 1, NB, NB), ab.dtype)
        # seed the carry diagonals with identity so the "solve" against
        # nonexistent rows (first w rows) is harmless: their A blocks
        # are zero, so L blocks come out zero regardless
        eye = jnp.eye(NB, dtype=ab.dtype)
        carry0 = carry0.at[:, w].set(eye)
        _, lblocks = jax.lax.scan(step, carry0, ab)
        return lblocks  # (nblk, w+1, NB, NB)

    return factor


@functools.lru_cache(maxsize=8)
def _solve_fn(nblk: int, w: int):
    jax, jnp = _as_module()

    def fwd_step(carry, inp):
        lrow, b_i = inp  # (w+1, NB, NB), (NB,)
        zprev = carry    # (w, NB) last w z blocks
        rhs = b_i
        for d in range(w):
            rhs = rhs - lrow[d] @ zprev[d]
        z_i = jax.scipy.linalg.solve_triangular(
            lrow[w], rhs, lower=True)
        return jnp.concatenate([zprev[1:], z_i[None]], axis=0), z_i

    def bwd_step(carry, inp):
        # reverse scan: carry holds the last w VISITED rows (i+1..i+w)
        # and their x blocks — no materialized future-window tensor
        # (a (nblk, w, w+1, 128, 128) stack was 640 MB on the 62.5k
        # flagship and made every solve HBM-bound)
        fut_rows, xnext = carry
        lrow_i, z_i = inp
        rhs = z_i
        for d in range(w):
            # row j = i+1+d holds block (j, i) at offset w-(j-i)
            rhs = rhs - fut_rows[d, w - 1 - d].T @ xnext[d]
        x_i = jax.scipy.linalg.solve_triangular(
            lrow_i[w], rhs, lower=True, trans=1)
        fut2 = jnp.concatenate([lrow_i[None], fut_rows[:-1]], axis=0)
        x2 = jnp.concatenate([x_i[None], xnext[:-1]], axis=0)
        return (fut2, x2), x_i

    @jax.jit
    def solve(lblocks, b):
        bb = b.reshape(nblk, NB)
        _, z = jax.lax.scan(
            fwd_step, jnp.zeros((w, NB), b.dtype), (lblocks, bb))
        carry0 = (jnp.zeros((w, w + 1, NB, NB), lblocks.dtype),
                  jnp.zeros((w, NB), b.dtype))
        _, xr = jax.lax.scan(bwd_step, carry0, (lblocks, z),
                             reverse=True)
        return xr.reshape(nblk * NB)

    return solve


@functools.lru_cache(maxsize=8)
def _build_band_fn(nblk: int, w: int):
    """Device-side band-tensor builder: scatter the nnz values into
    the flat band layout, mirror each diagonal block's strict lower
    triangle, and set the padding rows' unit diagonal."""
    jax, jnp = _as_module()

    @jax.jit
    def build(dst_ix, vals, pad_ix):
        flat = jnp.zeros(nblk * (w + 1) * NB * NB, jnp.float32)
        flat = flat.at[dst_ix].set(vals)
        flat = flat.at[pad_ix].set(1.0)
        ab = flat.reshape(nblk, w + 1, NB, NB)
        diag = ab[:, w]
        diag = diag + jnp.transpose(jnp.tril(diag, -1), (0, 2, 1))
        return ab.at[:, w].set(diag)

    return build


@functools.lru_cache(maxsize=8)
def _refined_solve_fn(nblk: int, w: int, refine: int):
    """Fully-device refined solve: banded matvec for the residual,
    factor solve for the correction — ONE device call per Newton rhs
    (the host-refined loop paid a tunnel round trip per pass)."""
    jax, jnp = _as_module()
    solve = _solve_fn(nblk, w)

    def bandmv(ab, x):
        xb = x.reshape(nblk, NB)
        padded = jnp.concatenate(
            [jnp.zeros((w, NB), x.dtype), xb], axis=0)
        xwin = jnp.stack([padded[d:d + nblk] for d in range(w + 1)],
                         axis=1)  # (nblk, w+1, NB): x_{i-w+d}
        y = jnp.einsum('idab,idb->ia', ab, xwin)
        # strict-upper mirror: block (i, i-w+d)^T feeds row i-w+d,
        # defined for i >= w-d (static shifted slices, no gathers)
        for d in range(w):
            s = w - d
            u = jnp.einsum('iab,ia->ib', ab[s:, d], xb[s:])
            y = y.at[:nblk - s].add(u)
        return y.reshape(nblk * NB)

    @jax.jit
    def refined(lblocks, ab, b):
        x = solve(lblocks, b)
        for _ in range(refine):
            x = x + solve(lblocks, b - bandmv(ab, x))
        return x

    return refined


class BandedCholesky:
    """Device banded Cholesky of an SPD matrix (f32 on device).

    `None` from the constructor probe (`from_spd`) means the matrix is
    not band-compressible — callers keep their fallback route."""

    def __init__(self, perm: np.ndarray, nblk: int, w: int):
        self.perm = perm
        self.iperm = np.argsort(perm)
        self.nblk = nblk
        self.w = w
        self.m = len(perm)
        self._l = None

    @staticmethod
    def from_spd(mmat: sp.spmatrix, max_block_bw: int = 8
                 ) -> Optional["BandedCholesky"]:
        m = mmat.shape[0]
        perm = sp.csgraph.reverse_cuthill_mckee(
            mmat.tocsr(), symmetric_mode=True)
        coo = mmat.tocoo()
        ip = np.argsort(perm)
        bw = int(np.max(np.abs(ip[coo.row] - ip[coo.col]))) \
            if coo.nnz else 0
        nblk = -(-m // NB)
        w = -(-bw // NB) if bw else 1
        w = max(1, w)
        if w > max_block_bw:
            return None  # not banded enough: caller falls back
        # storage check: (nblk, w+1, 128, 128) f32
        if nblk * (w + 1) * NB * NB * 4 > (1 << 31):
            return None
        return BandedCholesky(np.asarray(perm), nblk, w)

    def factor(self, mmat: sp.spmatrix):
        jax, jnp = _as_module()
        coo = mmat.tocoo()
        slots = getattr(self, "_slots", None)
        if slots is not None and getattr(self, "_slots_nnz", -1) != \
                coo.nnz:
            slots = None  # pattern changed: remap
        if slots is None:
            self._slots_nnz = coo.nnz
            # the IPM's normal-matrix pattern is fixed across
            # iterations: compute the COO->band-slot mapping once and
            # reuse it for every numeric refactor
            r = self.iperm[coo.row]
            c = self.iperm[coo.col]
            keep = c <= r  # lower triangle in permuted space
            br, lr = r // NB, r % NB
            bc, lc = c // NB, c % NB
            d = self.w - (br - bc)
            ok = keep & (d >= 0)
            flat = ((br * (self.w + 1) + d) * NB + lr) * NB + lc
            self._slots = (np.flatnonzero(ok),
                           flat[ok].astype(np.int64))
            slots = self._slots
        src_ix, dst_ix = slots
        if getattr(self, "_dst_dev", None) is None:
            self._dst_dev = jnp.asarray(dst_ix)
            # one-off padding mask: unit diagonal on padding rows so
            # the trailing block stays SPD
            padmask = np.zeros(
                (self.nblk, self.w + 1, NB, NB), np.float32)
            for q in range(self.m, self.nblk * NB):
                padmask[q // NB, self.w, q % NB, q % NB] = 1.0
            dst_pad = np.flatnonzero(padmask.reshape(-1))
            self._pad_ix = jnp.asarray(dst_pad)
        # upload ONLY the nonzero values (~nnz floats); the band tensor
        # materializes on device (a 160 MB host-built tensor per IPM
        # iteration saturated the tunnel and dominated the solve)
        vals = jnp.asarray(coo.data[src_ix].astype(np.float32))
        self._ab = _build_band_fn(self.nblk, self.w)(
            self._dst_dev, vals, self._pad_ix)
        self._l = _factor_fn(self.nblk, self.w)(self._ab)
        return self

    def solve_refined(self, rhs: np.ndarray,
                      refine: int = 3) -> np.ndarray:
        """Device-resident refined solve: factor solve + `refine`
        rounds of band-matvec residual correction in ONE device call
        (f32 device math; ~f32*1e-4-grade relative residual — the
        caller's f64 host refinement tops it up)."""
        jax, jnp = _as_module()
        b = np.zeros(self.nblk * NB, np.float32)
        b[:self.m] = rhs[self.perm]
        x = np.asarray(
            _refined_solve_fn(self.nblk, self.w, refine)(
                self._l, self._ab, jnp.asarray(b)), np.float64)
        out = np.empty(self.m, np.float64)
        out[self.perm] = x[:self.m]
        return out

    def solve(self, rhs: np.ndarray) -> np.ndarray:
        jax, jnp = _as_module()
        b = np.zeros(self.nblk * NB, np.float32)
        b[:self.m] = rhs[self.perm]
        x = np.asarray(
            _solve_fn(self.nblk, self.w)(self._l, jnp.asarray(b)),
            np.float64)
        out = np.empty(self.m, np.float64)
        out[self.perm] = x[:self.m]
        return out
