"""Multi-host bootstrap (SURVEY §2.11 / §7.3).

The reference's parallelism is single-process shared memory
(highs/parallel/, docs/src/parallel.md:1-20); the TPU-native framework
scales across hosts instead: `jax.distributed` connects the processes
of a multi-host slice, after which `jax.devices()` spans every chip
and the standard mesh/GSPMD layouts (parallel/mesh.py) work unchanged
— collectives ride ICI within a slice and DCN across slices.

Environment autodetection covers the common launchers:
- TPU pods: `jax.distributed.initialize()` with no arguments
  (metadata-based discovery).
- Explicit: HIGHS_TPU_COORDINATOR / HIGHS_TPU_NUM_PROCESSES /
  HIGHS_TPU_PROCESS_ID (or the standard JAX_* equivalents).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

_initialized = False


def bootstrap_multihost(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> bool:
    """Connect this process to the multi-host job (idempotent).

    Returns True when running distributed (more than one process),
    False for the ordinary single-process case.  Safe to call
    unconditionally: with no coordinator configured it is a no-op.
    """
    global _initialized
    import jax

    coordinator = coordinator or \
        os.environ.get("HIGHS_TPU_COORDINATOR") or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("HIGHS_TPU_NUM_PROCESSES") or \
            os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("HIGHS_TPU_PROCESS_ID") or \
            os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if not _initialized and coordinator and num_processes and \
            num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id or 0)
        _initialized = True
    return jax.process_count() > 1


def global_mesh(shape: Optional[Tuple[int, ...]] = None,
                axis_names: Tuple[str, ...] = ("rows",)):
    """A mesh over EVERY device of the (possibly multi-host) job."""
    from .mesh import make_mesh
    import jax
    return make_mesh(shape=shape, axis_names=axis_names,
                     devices=jax.devices())
