"""Multi-host entry (SURVEY.md §5.8): jax.distributed bootstrap + global
mesh construction over ICI/DCN.

Single-host (including the 8-virtual-CPU-device test harness) is the
degenerate case: initialize() is a no-op and the global mesh equals the
local one.
"""
from __future__ import annotations

import jax

from .mesh import make_mesh

__all__ = ["initialize_multihost", "global_mesh", "is_coordinator"]

_initialized = False


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process.

    With no arguments, relies on the TPU environment's auto-detection
    (JAX_COORDINATOR_ADDRESS etc.); silently a no-op when single-process.
    """
    global _initialized
    if _initialized:
        return
    # Decide WITHOUT touching the jax backend: jax.distributed.initialize
    # must run before any backend call (e.g. jax.process_count() would
    # initialize the backend and make distributed init a no-op-too-late).
    import os
    env_multiproc = any(v in os.environ for v in
                        ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"))
    if coordinator_address is None and num_processes is None \
            and not env_multiproc:
        # single-process (CLI/dev) — nothing to do
        _initialized = True
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def global_mesh(num_expert: int = 1):
    """('data','expert') mesh over all global devices; 'data' spans hosts so
    its collectives ride ICI within a slice and DCN across slices."""
    return make_mesh(num_expert=num_expert, devices=jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0
