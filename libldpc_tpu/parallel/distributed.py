"""Multi-host launch glue.

The reference has no cross-process story at all (single process, OpenMP
threads / one GPU).  Here, scaling past one host is:

1. every host process calls :func:`initialize` (a thin, idempotent wrapper
   over ``jax.distributed.initialize``);
2. :func:`global_mesh` builds a 1-D mesh over *all* devices of the job —
   frames shard across it, counters ``psum``-reduce over ICI within a slice
   and DCN across hosts (see :mod:`libldpc_tpu.parallel.mesh`);
3. every host runs the identical sweep driver; the stopping rule reads
   globally-reduced counters, so all hosts stop at the same batch without
   any explicit control messages — the multi-host replacement for the
   reference's shared stop flag (``src/sim/ldpcsim.cpp:255``).

Only host 0 should write the results file / console table
(:func:`is_primary`).

Testable without hardware: ``jax.distributed`` on CPU devices, or
single-process with ``jax_num_cpu_devices`` (how ``tests/`` and the
``dryrun_multichip`` driver hook exercise the sharded path).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from .mesh import FRAME_AXIS

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent ``jax.distributed.initialize``.

    With no arguments, relies on the cluster environment (TPU pod metadata /
    ``JAX_COORDINATOR_ADDRESS`` etc.), which is the normal TPU-pod path.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # single-process run (already initialised or no cluster env)
        pass
    _initialized = True


def global_mesh() -> Mesh:
    """1-D frame-parallel mesh over every device in the job (all hosts)."""
    return jax.make_mesh((len(jax.devices()),), (FRAME_AXIS,))


def is_primary() -> bool:
    """True on the process that should own console/file output."""
    return jax.process_index() == 0


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
