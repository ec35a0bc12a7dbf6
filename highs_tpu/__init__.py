"""highs_tpu — a TPU-native linear/quadratic/mixed-integer optimization
framework with the capabilities of HiGHS.

Solves   min (1/2) x'Qx + c'x   s.t.  L <= Ax <= U,  l <= x <= u
with Q positive semidefinite (convex QP) and, when Q = 0, integrality /
semi-continuity on variables (MIP).

Compute path: JAX/XLA/Pallas, designed mesh-first for TPU — the workhorse
LP algorithm is a restarted reflected-Halpern PDHG (first-order) whose
inner block runs fully on device, with an interior-point polish stage and
CPU crossover/cleanup for vertex solutions.
"""

__version__ = "0.1.0"

# HiGHS is a double-precision solver: its printed objectives and KKT
# tolerances (kkt_tolerance 1e-4 .. 1e-9) are only reachable in f64, so
# enable x64 before any jax array is created (SURVEY.md §7: "float64
# everywhere"; solvers opt into f32/bf16 stepping explicitly via
# tpu_step_dtype where it is safe).
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: first-solve compiles on a (tunneled)
# TPU cost 10-20s per program; caching them on disk makes every LATER
# process pay nothing for an already-seen bucketed shape (VERDICT r02
# item 7).  Opt out with HIGHS_TPU_XLA_CACHE=off; relocate by setting it
# to a directory path.
_cache_dir = _os.environ.get("HIGHS_TPU_XLA_CACHE", "")
if _cache_dir != "off":
    if not _cache_dir:
        _cache_dir = _os.path.join(
            _os.path.expanduser("~"), ".cache", "highs_tpu_xla")
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.5)
    except Exception:
        pass  # cache is an optimization, never a requirement

from .constants import (HighsStatus, HighsModelStatus, ObjSense,
                        HighsVarType, HighsBasisStatus, MatrixFormat,
                        HessianFormat, SolutionStatus, BasisValidity,
                        SolutionStyle, HighsCallbackType, kHighsInf,
                        kHighsIInf)
from .options import HighsOptions
from .info import HighsInfo
from .models import (HighsLp, HighsModel, HighsHessian, HighsSparseMatrix,
                     HighsSolution, HighsBasis, HighsLinearObjective)

from .highs import Highs  # noqa: E402  (facade; imported last)

# Preload the hot solver modules and scipy.sparse at import time:
# lazy first-use imports otherwise add ~0.3s to the FIRST solve (the
# reference binary's whole gt2 solve is 0.06s).
def _preload():
    try:
        import scipy.sparse  # noqa: F401
        import scipy.sparse.linalg  # noqa: F401
        from .solvers.mip import (cuts, heuristics,  # noqa: F401
                                  propagate, solver)
        from .solvers.simplex import (dual_native,  # noqa: F401
                                      native, wrapper)
        from .presolve import rules  # noqa: F401
    except Exception:
        pass  # never block import on an optional preload


_preload()

__all__ = [
    "Highs", "HighsStatus", "HighsModelStatus", "ObjSense", "HighsVarType",
    "HighsBasisStatus", "MatrixFormat", "HessianFormat", "SolutionStatus",
    "BasisValidity", "SolutionStyle", "HighsCallbackType", "kHighsInf",
    "kHighsIInf", "HighsOptions", "HighsInfo", "HighsLp", "HighsModel",
    "HighsHessian", "HighsSparseMatrix", "HighsSolution", "HighsBasis",
    "HighsLinearObjective",
]
