"""Multi-host process bootstrap.

The reference relies on ``mpirun -n N`` + mpi4py for its process model
(``README.rst:107-111``).  On a real multi-host TPU slice the equivalent is
``jax.distributed.initialize`` (one process per host, all chips visible as
one device set), after which the same mesh/sharding code in this package
runs unchanged — collectives ride ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..config import ParallelConfig
from .mesh import make_mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Initialize the JAX distributed runtime (no-op if single-process or
    already initialized).  On TPU pods the arguments are auto-detected from
    the environment; pass them explicitly for CPU/GPU clusters."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        # Already initialized, or single-process context with no
        # coordinator (auto-detection only works on TPU pods).
        pass


def auto_mesh(object_axis: int = 1) -> tuple:
    """(mesh, ParallelConfig) over ALL visible devices: ``object_axis``
    devices shard the object's y extent; the rest are data-parallel."""
    n = len(jax.devices())
    assert n % object_axis == 0, (n, object_axis)
    pcfg = ParallelConfig(data_axis=n // object_axis,
                          object_axis=object_axis)
    return make_mesh(pcfg), pcfg
