"""Symmetry detection for MIP.

Re-implements the purpose of the reference's custom graph-automorphism
search (highs/presolve/HighsSymmetry.cpp: partition refinement producing
generators, orbits used for orbital fixing) with a
individualization-refinement search over the column/row colored
bipartite graph of the LP:

- initial colors: columns by (cost, lower, upper, integrality), rows by
  (row_lower, row_upper);
- refinement: iterated Weisfeiler-Lehman hashing with coefficient-valued
  edges until the partition stabilizes;
- generator search: individualize a pair (u, v) from one cell, re-refine
  both, and greedily align the resulting partitions into a candidate
  column permutation;
- every candidate is VERIFIED to be a true automorphism of (A, c,
  bounds, integrality) — soundness never depends on the search
  heuristics.

The MIP solver uses verified generators for symmetry handling: for each
generator g with first moved index j*, the first-row lex constraint
x_{j*} >= x_{g(j*)} keeps the lex-greatest representative of every
<g>-orbit feasible, so adding it is optimum-preserving.  Orbits (via
union-find over generators) feed orbital fixing: a root-fixed variable
fixes its whole orbit.
"""
from __future__ import annotations

import time
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp


class _ColorTable:
    """Shared key->int relabeling.  Sharing ONE table across both
    branches of a u/v individualization keeps color ids aligned by
    CONTENT, so cells with the same color in both partitions correspond
    (order-dependent relabeling would break the alignment)."""

    def __init__(self):
        self.table = {}

    def __call__(self, keys):
        t = self.table
        out = np.empty(len(keys), dtype=np.int64)
        for i, k in enumerate(keys):
            out[i] = t.setdefault(k, len(t))
        return out


def _refine(a_csc, a_csr, col_color, row_color, table, max_rounds=30):
    """WL-style color refinement with coefficient-labeled edges."""
    m, n = a_csr.shape
    for _ in range(max_rounds):
        # rows take multiset of (col_color, coeff)
        new_row_keys = []
        for i in range(m):
            s, e = a_csr.indptr[i], a_csr.indptr[i + 1]
            sig = sorted(zip(col_color[a_csr.indices[s:e]].tolist(),
                             a_csr.data[s:e].tolist()))
            new_row_keys.append((int(row_color[i]), tuple(sig)))
        new_row = table(new_row_keys)
        new_col_keys = []
        for j in range(n):
            s, e = a_csc.indptr[j], a_csc.indptr[j + 1]
            sig = sorted(zip(new_row[a_csc.indices[s:e]].tolist(),
                             a_csc.data[s:e].tolist()))
            new_col_keys.append((int(col_color[j]), tuple(sig)))
        new_col = table(new_col_keys)
        if (len(set(new_col.tolist())) == len(set(col_color.tolist()))
                and len(set(new_row.tolist())) ==
                len(set(row_color.tolist()))):
            return new_col, new_row
        col_color, row_color = new_col, new_row
    return col_color, row_color


def _hash_rows(keys):
    return _ColorTable()(keys)


def _col_signature(lp):
    n = lp.num_col
    integ = (np.asarray(lp.integrality) if len(lp.integrality) == n
             else np.zeros(n, dtype=np.uint8))
    keys = [(round(float(lp.col_cost[j]), 12),
             round(float(lp.col_lower[j]), 12),
             round(float(lp.col_upper[j]), 12), int(integ[j]))
            for j in range(n)]
    return _hash_rows(keys)


def _row_signature(lp):
    keys = [(round(float(lp.row_lower[i]), 12),
             round(float(lp.row_upper[i]), 12))
            for i in range(lp.num_row)]
    return _hash_rows(keys)


def _verify_automorphism(lp, a_csr, perm) -> bool:
    """Check perm (columns) extends to a model automorphism."""
    n = lp.num_col
    if np.array_equal(perm, np.arange(n)):
        return False
    integ = (np.asarray(lp.integrality) if len(lp.integrality) == n
             else np.zeros(n, dtype=np.uint8))
    if not (np.allclose(lp.col_cost, lp.col_cost[perm]) and
            np.allclose(lp.col_lower, lp.col_lower[perm]) and
            np.allclose(lp.col_upper, lp.col_upper[perm]) and
            np.array_equal(integ, integ[perm])):
        return False
    # rows of A[:, perm] must be a permutation of rows of A with equal
    # row bounds
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    def row_key(i, use_perm):
        s, e = a_csr.indptr[i], a_csr.indptr[i + 1]
        cols = a_csr.indices[s:e]
        vals = a_csr.data[s:e]
        if use_perm:
            cols = inv[cols]
        order = np.argsort(cols)
        return (tuple(cols[order]), tuple(np.round(vals[order], 12)),
                round(float(lp.row_lower[i]), 12),
                round(float(lp.row_upper[i]), 12))

    orig = {}
    for i in range(lp.num_row):
        orig.setdefault(row_key(i, False), []).append(i)
    for i in range(lp.num_row):
        k = row_key(i, True)
        if k not in orig or not orig[k]:
            return False
        orig[k].pop()
    return True


def detect_symmetry(lp, max_generators: int = 16,
                    time_budget: float = 5.0) -> List[np.ndarray]:
    """Return a list of verified column-permutation generators."""
    t0 = time.perf_counter()
    n, m = lp.num_col, lp.num_row
    if n > 20000 or m > 20000:
        return []
    a_csc = lp.a_matrix.to_scipy().tocsc()
    a_csr = a_csc.tocsr()
    # quantize coefficients for stable hashing
    a_csc = a_csc.copy()
    a_csc.data = np.round(a_csc.data, 12)
    a_csr = a_csr.copy()
    a_csr.data = np.round(a_csr.data, 12)

    table = _ColorTable()
    col_color = table(
        [(round(float(lp.col_cost[j]), 12),
          round(float(lp.col_lower[j]), 12),
          round(float(lp.col_upper[j]), 12),
          int(lp.integrality[j]) if len(lp.integrality) == n else 0)
         for j in range(n)])
    row_color = table(
        [(round(float(lp.row_lower[i]), 12),
          round(float(lp.row_upper[i]), 12)) for i in range(lp.num_row)])
    col_color, row_color = _refine(a_csc, a_csr, col_color, row_color,
                                   table)

    generators: List[np.ndarray] = []
    cells = {}
    for j in range(n):
        cells.setdefault(int(col_color[j]), []).append(j)
    big_cells = [c for c in cells.values() if len(c) >= 2]

    def individualize(base_color, j, depth):
        # the marker key is shared via `table`, so individualizing at
        # the same depth in both branches yields the SAME color id —
        # keeping the two partitions content-aligned
        c = base_color.copy()
        c[j] = table([("individualized", depth)])[0]
        return c

    def candidate(u, v):
        """Parallel individualization-refinement: map u -> v, then keep
        splitting the first multi-cell in both branches in lockstep
        until discrete; returns an aligned permutation or None."""
        cu = individualize(col_color, u, 0)
        cv = individualize(col_color, v, 0)
        cu, _ = _refine(a_csc, a_csr, cu, row_color, table)
        cv, _ = _refine(a_csc, a_csr, cv, row_color, table)
        for depth in range(1, n + 1):
            if time.perf_counter() - t0 > time_budget:
                return None  # budget is a hard deadline, even mid-pair
            by_u = {}
            for j in range(n):
                by_u.setdefault(int(cu[j]), []).append(j)
            by_v = {}
            for j in range(n):
                by_v.setdefault(int(cv[j]), []).append(j)
            if set(by_u) != set(by_v):
                return None
            multi = sorted(c for c, js in by_u.items() if len(js) > 1)
            if not multi:
                perm = np.empty(n, dtype=np.int64)
                for color, js in by_u.items():
                    vs = by_v[color]
                    if len(vs) != 1:
                        return None
                    perm[js[0]] = vs[0]
                return perm
            c0 = multi[0]
            if len(by_u[c0]) != len(by_v[c0]):
                return None
            cu = individualize(cu, by_u[c0][0], depth)
            cv = individualize(cv, by_v[c0][0], depth)
            cu, _ = _refine(a_csc, a_csr, cu, row_color, table)
            cv, _ = _refine(a_csc, a_csr, cv, row_color, table)
        return None

    for cell in big_cells:
        if len(generators) >= max_generators or \
                time.perf_counter() - t0 > time_budget:
            break
        u = cell[0]
        for v in cell[1:]:
            if time.perf_counter() - t0 > time_budget or \
                    len(generators) >= max_generators:
                break
            perm = candidate(u, v)
            if perm is not None and _verify_automorphism(lp, a_csr,
                                                         perm):
                generators.append(perm)
    return generators


def orbits(generators: List[np.ndarray], n: int) -> np.ndarray:
    """Union-find orbit labels from the generator set."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for g in generators:
        for j in range(n):
            a, b = find(j), find(int(g[j]))
            if a != b:
                parent[a] = b
    return np.array([find(j) for j in range(n)])


def symmetry_breaking_rows(generators: List[np.ndarray], n: int
                           ) -> List[Tuple[int, int]]:
    """One first-row lex constraint per generator:  x_j - x_{g(j)} >= 0
    at the first moved index j (optimum-preserving for each <g>)."""
    rows = []
    seen = set()
    for g in generators:
        moved = np.nonzero(g != np.arange(n))[0]
        if not len(moved):
            continue
        j = int(moved[0])
        pair = (j, int(g[j]))
        if pair not in seen and pair[0] != pair[1]:
            seen.add(pair)
            rows.append(pair)
    return rows
