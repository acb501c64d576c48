"""Multi-host process-group initialization.

The reference is single-process (SURVEY.md §2.5); scale-out here follows the
JAX runtime: ``jax.distributed.initialize`` forms the process group (one
process per host of a pod slice), after which ``jax.devices()`` spans the
whole slice and the :mod:`tacotron_tpu.parallel.mesh` layer lays the global
``(data, model)`` mesh over it.  Gradients then reduce over ICI via the
collectives XLA inserts from sharding annotations — there is no hand-rolled
NCCL/MPI analog anywhere.

On TPU pods the coordinator/process env is auto-detected; explicit arguments
are for CPU/GPU clusters and tests.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host process group (no-op when single-process).

    Call once at entry, before any jax computation.  TPU pod runtimes
    auto-detect every argument; pass them explicitly only off-TPU.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError) as e:
        # Already initialized (e.g. by a launcher) is fine; surface others.
        if "already" not in str(e).lower():
            raise


def runtime_info() -> dict:
    """Process/device topology snapshot for logs."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform if jax.devices() else "none",
    }
