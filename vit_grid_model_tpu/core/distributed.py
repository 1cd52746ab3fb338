"""Multi-host (multi-slice) initialization.

The reference is single-process (SURVEY §2.3).  For pod / multi-slice runs
this wraps ``jax.distributed.initialize``: call once per host before any
device use; afterwards ``jax.devices()`` spans the pod and the same
``parallel.mesh`` code shards over ICI within a slice and DCN across slices
— nothing else in the framework changes.

Typical launch (one process per host):

    from vit_grid_model_tpu.core import distributed
    distributed.initialize()                      # env-driven (TPU pods)
    mesh = parallel.mesh.make_mesh(MeshConfig())  # all global devices
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime.  With no arguments the TPU
    pod environment variables drive discovery; explicit arguments support
    DCN-connected CPU/GPU fleets and tests."""
    if jax.process_count() > 1:
        return                       # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process environment (no coordinator): run locally
        pass


def is_primary() -> bool:
    """True on the host that should write logs/checkpoints."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """The per-host slice of a globally sharded batch (hosts feed disjoint
    shards; GSPMD stitches them through the 'data' axis)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
