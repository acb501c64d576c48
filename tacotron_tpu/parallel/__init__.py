"""Device-mesh and sharding layer.

The reference is single-process/single-device (SURVEY.md §2.5) — this package
is the new, first-class scale-out component: a ``jax.sharding.Mesh`` with a
``data`` axis (DP over ICI) and an optional ``model`` axis, NamedShardings for
batches and replicated state, and helpers for multi-host initialization.

XLA inserts the gradient all-reduce (ring reduce-scatter + all-gather over
ICI) automatically from the sharding annotations on the jitted train step —
there is no hand-written collective here, by design.
"""

from .distributed import initialize as distributed_initialize
from .distributed import runtime_info
from .mesh import (MeshPlan, batch_sharding, make_mesh,
                   replicated_sharding, shard_batch, shard_params)
from .prefetch import DevicePrefetcher

__all__ = [
    "DevicePrefetcher", "MeshPlan", "batch_sharding",
    "distributed_initialize", "make_mesh", "replicated_sharding",
    "runtime_info", "shard_batch", "shard_params",
]
