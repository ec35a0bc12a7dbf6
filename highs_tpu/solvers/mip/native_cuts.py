"""ctypes binding + build for the native cut-generation library.

The reference generates cuts in C++ (highs/mip/HighsCutGeneration.cpp);
highs_tpu keeps the same split — array-parallel LP work on the
accelerator, scalar combinatorial cut search native.  ``hx_mir_on_leq``
is a semantics-exact port of ``cuts._mir_on_leq`` (the python version
stays as fallback and property-test oracle).
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

i64p = np.ctypeslib.ndpointer(np.int64)
f64p = np.ctypeslib.ndpointer(np.float64)
i8p = np.ctypeslib.ndpointer(np.int8)

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[3] / "native"
_SRC = _NATIVE_DIR / "hcuts.cpp"
_LIB = _NATIVE_DIR / "libhcuts.so"

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> pathlib.Path:
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17",
           str(_SRC), "-o", str(_LIB)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"native cuts build failed:\n{proc.stderr}")
    return _LIB


def get_lib():
    """Build (if stale) and load the library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("HIGHS_TPU_NO_NATIVE_CUTS"):
            _lib_failed = True
            return None
        try:
            if not _LIB.exists() or \
                    _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_LIB))
        except (OSError, RuntimeError):
            _lib_failed = True
            return None
        lib.hx_integral_scale.restype = ctypes.c_double
        lib.hx_mir_on_leq.restype = ctypes.c_int
        lib.hx_mir_on_leq.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.float64),
            ctypes.c_double,
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int8),
            ctypes.c_double, ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_void_p,  # vb_ptr (nullable)
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.float64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return lib


class VBounds(dict):
    """dict col -> [(ycol, c1, c0), ...] that can carry a cached
    flattened (native-call) representation."""
    __slots__ = ("_flat",)


def flatten_vbounds(vubs: dict, vlbs: dict):
    """Flatten (vubs, vlbs) into per-column arrays for the native call:
    per column, vlbs first then vubs, insertion order preserved (this
    order is the python candidate order and drives tie-breaks)."""
    n_vb = 1 + max(max(vubs, default=-1), max(vlbs, default=-1))
    if n_vb <= 0:
        return (0, np.zeros(1, np.int64), np.zeros(0, np.int32),
                np.zeros(0), np.zeros(0), np.zeros(0, np.uint8))
    counts = np.zeros(n_vb + 1, np.int64)
    for j, lst in vlbs.items():
        counts[j + 1] += len(lst)
    for j, lst in vubs.items():
        counts[j + 1] += len(lst)
    indptr = np.cumsum(counts)
    total = int(indptr[-1])
    y = np.zeros(total, np.int32)
    c1 = np.zeros(total)
    c0 = np.zeros(total)
    isub = np.zeros(total, np.uint8)
    pos = indptr[:-1].copy()
    for src, flag in ((vlbs, 0), (vubs, 1)):
        for j, lst in src.items():
            p = int(pos[j])
            for (yc, a1, a0) in lst:
                y[p] = yc
                c1[p] = a1
                c0[p] = a0
                isub[p] = flag
                p += 1
            pos[j] = p
    return n_vb, np.ascontiguousarray(indptr), y, c1, c0, isub


def _flat_for(vubs, vlbs):
    if vubs is None:
        vubs = {}
    if vlbs is None:
        vlbs = {}
    holder = vubs if isinstance(vubs, VBounds) else (
        vlbs if isinstance(vlbs, VBounds) else None)
    if holder is not None:
        flat = getattr(holder, "_flat", None)
        if flat is not None:
            return flat
    flat = flatten_vbounds(vubs, vlbs)
    if holder is not None:
        holder._flat = flat
    return flat


def mir_on_leq_native(cols, vals, rhs, x, lo, up, is_int, feastol,
                      vubs=None, vlbs=None, prefer_vbds=False
                      ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                          float, float]]:
    """Native `_mir_on_leq`.  Returns (cols, vals, rhs, efficacy) or
    None; raises RuntimeError if the library is unavailable (callers
    check get_lib() first)."""
    lib = get_lib()
    n_vb, indptr, vy, vc1, vc0, visub = _flat_for(vubs, vlbs)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    nnz = len(cols)
    cap = 3 * nnz + 16
    out_cols = np.empty(cap, np.int64)
    out_vals = np.empty(cap, np.float64)
    out_rhs = ctypes.c_double(0.0)
    out_eff = ctypes.c_double(0.0)
    if n_vb > 0:
        pp = indptr.ctypes.data_as(ctypes.c_void_p)
        py = vy.ctypes.data_as(ctypes.c_void_p)
        p1 = vc1.ctypes.data_as(ctypes.c_void_p)
        p0 = vc0.ctypes.data_as(ctypes.c_void_p)
        pi = visub.ctypes.data_as(ctypes.c_void_p)
    else:
        pp = py = p1 = p0 = pi = None
    while True:
        n_out = lib.hx_mir_on_leq(
            nnz, cols, vals, float(rhs), x, lo, up, is_int,
            float(feastol), int(prefer_vbds), n_vb, pp, py, p1, p0, pi,
            cap, out_cols, out_vals, ctypes.byref(out_rhs),
            ctypes.byref(out_eff))
        if n_out != -1:
            break
        cap *= 4
        out_cols = np.empty(cap, np.int64)
        out_vals = np.empty(cap, np.float64)
    if n_out <= 0:
        return None
    return (out_cols[:n_out].copy(), out_vals[:n_out].copy(),
            float(out_rhs.value), float(out_eff.value))


def mir_batch_native(trials, x, lo, up, is_int, feastol,
                     vubs=None, vlbs=None, prefer_vbds=False):
    """Batched `_mir_on_leq` over many (cols, vals, rhs) trials in ONE
    native call (hx_mir_batch).  Returns a list aligned with `trials`:
    (cols, vals, rhs, efficacy) or None per trial."""
    lib = get_lib()
    if not getattr(lib, "_mir_batch_bound", False):
        lib.hx_mir_batch.restype = None
        lib.hx_mir_batch.argtypes = [
            ctypes.c_int, i64p, i64p, f64p, f64p, f64p, f64p, f64p,
            i8p, ctypes.c_double, ctypes.c_int,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, i64p, f64p, f64p, f64p,
            np.ctypeslib.ndpointer(np.int32)]
        lib._mir_batch_bound = True
    n_vb, indptr, vy, vc1, vc0, visub = _flat_for(vubs, vlbs)
    if n_vb > 0:
        pp = indptr.ctypes.data_as(ctypes.c_void_p)
        py = vy.ctypes.data_as(ctypes.c_void_p)
        p1 = vc1.ctypes.data_as(ctypes.c_void_p)
        p0 = vc0.ctypes.data_as(ctypes.c_void_p)
        pi = visub.ctypes.data_as(ctypes.c_void_p)
    else:
        pp = py = p1 = p0 = pi = None
    nr = len(trials)
    if nr == 0:
        return []
    lens = np.fromiter((len(t[0]) for t in trials), np.int64, nr)
    row_ptr = np.concatenate([[0], np.cumsum(lens)])
    cols = np.ascontiguousarray(
        np.concatenate([np.asarray(t[0], np.int64) for t in trials]))
    vals = np.ascontiguousarray(
        np.concatenate([np.asarray(t[1], np.float64)
                        for t in trials]))
    rhs = np.fromiter((t[2] for t in trials), np.float64, nr)
    cap = int(3 * lens.max() + 16)
    out_cols = np.empty(nr * cap, np.int64)
    out_vals = np.empty(nr * cap, np.float64)
    out_rhs = np.empty(nr, np.float64)
    out_eff = np.empty(nr, np.float64)
    n_out = np.empty(nr, np.int32)
    xx = np.ascontiguousarray(x, np.float64)
    ll = np.ascontiguousarray(lo, np.float64)
    uu = np.ascontiguousarray(up, np.float64)
    ii = np.ascontiguousarray(is_int, np.int8)
    lib.hx_mir_batch(
        nr, np.ascontiguousarray(row_ptr), cols, vals, rhs, xx, ll,
        uu, ii, float(feastol), int(prefer_vbds), n_vb, pp, py, p1,
        p0, pi, cap, out_cols, out_vals, out_rhs, out_eff, n_out)
    results = []
    for t in range(nr):
        k = int(n_out[t])
        if k == -1:
            # capacity overflow: retry singly with growth
            results.append(mir_on_leq_native(
                trials[t][0], trials[t][1], trials[t][2], xx, ll, uu,
                ii, feastol, vubs=vubs, vlbs=vlbs,
                prefer_vbds=prefer_vbds))
        elif k <= 0:
            results.append(None)
        else:
            base = t * cap
            results.append((out_cols[base:base + k].copy(),
                            out_vals[base:base + k].copy(),
                            float(out_rhs[t]), float(out_eff[t])))
    return results


def _bind_path_mir(lib):
    if getattr(lib, "_path_mir_bound", False):
        return
    lib.hx_path_mir.restype = ctypes.c_int
    lib.hx_path_mir.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.int8),
        ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_double,
        ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
    ]
    lib._path_mir_bound = True


def path_mir_native(a_csr, row_lower, row_upper, lo, up, x, is_int,
                    feastol, max_path, max_starts, seed, time_budget,
                    vubs, vlbs, max_cuts=600):
    """Native path-aggregation c-MIR (hx_path_mir).  Returns a list of
    raw structural-space cuts [(cols, vals, rhs, eff)], pre-postprocess
    (the caller applies cut cleaning)."""
    lib = get_lib()
    _bind_path_mir(lib)
    m, n = a_csr.shape
    rp = np.ascontiguousarray(a_csr.indptr, dtype=np.int64)
    ri = np.ascontiguousarray(a_csr.indices, dtype=np.int32)
    rx = np.ascontiguousarray(a_csr.data, dtype=np.float64)
    rl = np.ascontiguousarray(row_lower, dtype=np.float64)
    ru = np.ascontiguousarray(row_upper, dtype=np.float64)
    ll = np.ascontiguousarray(lo, dtype=np.float64)
    uu = np.ascontiguousarray(up, dtype=np.float64)
    xx = np.ascontiguousarray(x, dtype=np.float64)
    if is_int.dtype == np.bool_ and is_int.flags["C_CONTIGUOUS"]:
        ii = is_int.view(np.int8)
    else:
        ii = np.ascontiguousarray(is_int, dtype=np.int8)
    n_vb, indptr, vy, vc1, vc0, visub = _flat_for(vubs, vlbs)
    if n_vb > 0:
        pp = indptr.ctypes.data_as(ctypes.c_void_p)
        py = vy.ctypes.data_as(ctypes.c_void_p)
        p1 = vc1.ctypes.data_as(ctypes.c_void_p)
        p0 = vc0.ctypes.data_as(ctypes.c_void_p)
        pi = visub.ctypes.data_as(ctypes.c_void_p)
    else:
        pp = py = p1 = p0 = pi = None
    nnz_cap = np.int64(max_cuts) * max(64, min(n, 4096))
    out_indptr = np.zeros(max_cuts + 1, np.int64)
    out_cols = np.empty(int(nnz_cap), np.int64)
    out_vals = np.empty(int(nnz_cap), np.float64)
    out_rhs = np.empty(max_cuts, np.float64)
    out_eff = np.empty(max_cuts, np.float64)
    n_cuts = lib.hx_path_mir(
        m, n, rp, ri, rx, rl, ru, ll, uu, xx, ii, float(feastol),
        int(max_path), int(max_starts), int(seed) & (2**64 - 1),
        float(time_budget), n_vb, pp, py, p1, p0, pi,
        int(max_cuts), int(nnz_cap), out_indptr, out_cols, out_vals,
        out_rhs, out_eff)
    cuts = []
    for i in range(n_cuts):
        s, e = int(out_indptr[i]), int(out_indptr[i + 1])
        cuts.append((out_cols[s:e].copy(), out_vals[s:e].copy(),
                     float(out_rhs[i]), float(out_eff[i])))
    return cuts
