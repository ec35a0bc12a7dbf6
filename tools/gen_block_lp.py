"""Generate the large block-structured flagship LP and its MPS file.

Block-tridiagonal LP with dense 128x128 blocks — the structure of
time-staged / staircase models (multi-period production, control
horizons) at Mittelmann scale: m = n = 65,536 rows/cols, ~25.1M
nonzeros.  This is the class where the TPU design should win: the
SpMV rides the MXU as dense 128-blocks (ops/block_csr.py) instead of
hitting the XLA gather wall that caps unstructured sparsity.

Same feasible-by-construction recipe as bench.synth50k: pick x*,
b = A x* - |noise|*0.1 (so Ax >= b is strictly feasible), c > 0.

The MPS file (~900MB) is written once to /tmp/hx_block64k.mps for
anchoring the reference binary; the bench segment regenerates the
matrix in memory from the same seed.
"""
import sys

import numpy as np
import scipy.sparse as sp

BLOCK = 128
NBLOCKS = 512  # m = n = 65536
SEED = 2024


def gen_block_lp(nblocks: int = NBLOCKS, block: int = BLOCK,
                 seed: int = SEED):
    rng = np.random.default_rng(seed)
    mb = nb = nblocks
    m = n = nblocks * block
    # block-tridiagonal pattern: (i, i-1), (i, i), (i, i+1)
    rows_b = []
    cols_b = []
    for i in range(mb):
        for j in (i - 1, i, i + 1):
            if 0 <= j < nb:
                rows_b.append(i)
                cols_b.append(j)
    nnzb = len(rows_b)
    # dense blocks, scaled so row norms resemble the 50k flagship
    # (~10 unit-normal entries per row -> std 1/sqrt(3*128/10))
    scale = float(np.sqrt(10.0 / (3.0 * block)))
    blocks = rng.standard_normal((nnzb, block, block)) * scale
    indptr = np.zeros(mb + 1, dtype=np.int64)
    for i in rows_b:
        indptr[i + 1] += 1
    indptr = np.cumsum(indptr)
    a = sp.bsr_matrix((blocks, np.asarray(cols_b, dtype=np.int64),
                       indptr), shape=(m, n)).tocsc()
    xstar = rng.uniform(0, 1, n)
    b = a @ xstar - np.abs(rng.standard_normal(m)) * 0.1
    c = rng.uniform(0.1, 1.0, n)
    return a, b, c


def write_mps(path: str, a: sp.csc_matrix, b: np.ndarray,
              c: np.ndarray, up: float = 10.0):
    """Fast free-MPS writer: min c'x s.t. Ax >= b, 0 <= x <= up."""
    m, n = a.shape
    with open(path, "w", buffering=1 << 22) as f:
        f.write("NAME          HXBLOCK\nROWS\n N  COST\n")
        rows_hdr = "".join(f" G  R{i}\n" for i in range(m))
        f.write(rows_hdr)
        f.write("COLUMNS\n")
        indptr, indices, data = a.indptr, a.indices, a.data
        chunk = []
        for j in range(n):
            cj = c[j]
            chunk.append(f"    C{j}  COST  {cj:.17g}\n")
            s, e = indptr[j], indptr[j + 1]
            ri = indices[s:e]
            rv = data[s:e]
            chunk.append("".join(
                f"    C{j}  R{int(ri[k])}  {rv[k]:.17g}\n"
                for k in range(len(ri))))
            if len(chunk) > 4096:
                f.write("".join(chunk))
                chunk = []
        f.write("".join(chunk))
        f.write("RHS\n")
        f.write("".join(
            f"    RHS  R{i}  {b[i]:.17g}\n" for i in range(m)))
        f.write("BOUNDS\n")
        f.write("".join(
            f" UP BND  C{j}  {up:.17g}\n" for j in range(n)))
        f.write("ENDATA\n")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hx_block64k.mps"
    a, b, c = gen_block_lp()
    print(f"matrix {a.shape} nnz {a.nnz}")
    write_mps(out, a, b, c)
    print("wrote", out)
