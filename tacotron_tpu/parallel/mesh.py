"""Mesh construction and sharding rules.

Layout: a 2-D logical mesh ``(data, model)``.  At Tacotron scale (~10 M
params) the model always fits one chip, so ``model=1`` by default and every
chip holds a full replica; the batch is sharded over ``data``.  The ``model``
axis exists so wide projections (e.g. the 1025-bin linear head) *can* be
tensor-sharded on narrow-HBM parts without touching call sites.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the partition rules derived from it."""

    mesh: Mesh
    data_axis: str
    model_axis: str

    @property
    def data_size(self) -> int:
        return self.mesh.shape[self.data_axis]

    def batch(self) -> NamedSharding:
        """Leading-axis (batch) sharding over the data axis."""
        return NamedSharding(self.mesh, P(self.data_axis))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def make_mesh(config: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> MeshPlan:
    """Build the (data, model) mesh from the available devices.

    ``data_parallelism == -1`` consumes all devices not used by the model
    axis.  Device order follows ``jax.devices()`` so that the data axis maps
    to contiguous ICI neighbors on a pod slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    model = max(1, config.model_parallelism)
    if len(devices) % model:
        raise ValueError(
            f"{len(devices)} devices not divisible by model_parallelism "
            f"{model}")
    data = (len(devices) // model if config.data_parallelism == -1
            else config.data_parallelism)
    if data * model != len(devices):
        devices = devices[:data * model]
    grid = np.asarray(devices).reshape(data, model)
    mesh = Mesh(grid, (config.data_axis, config.model_axis))
    return MeshPlan(mesh=mesh, data_axis=config.data_axis,
                    model_axis=config.model_axis)


def batch_sharding(plan: MeshPlan) -> NamedSharding:
    return plan.batch()


def replicated_sharding(plan: MeshPlan) -> NamedSharding:
    return plan.replicated()


def shard_params(plan: MeshPlan, params: Any) -> Any:
    """Place a parameter pytree onto the mesh with the ``model``-axis rule.

    Tacotron's one genuinely wide projection is the 1025-bin linear head
    (``linear_projection``); with ``model_parallelism > 1`` its kernel is
    tensor-sharded column-wise (``P(None, model)``) and its bias over
    ``P(model)`` — XLA partitions the matmul and all-gathers the output.
    Everything else (all <=256-wide) replicates.  With ``model == 1`` this
    is plain replication, the default at Tacotron scale (~10 M params fit
    any chip); the rule exists — and is equality-tested in
    ``tests/test_model.py::test_model_axis_shards_linear_head`` — so
    narrow-HBM parts can shard the head without touching call sites.
    """
    repl = plan.replicated()
    if plan.mesh.shape[plan.model_axis] == 1:
        return jax.tree.map(lambda x: jax.device_put(x, repl), params)

    def place(path, leaf):
        keys = {getattr(p, "key", "") for p in path}
        if "linear_projection" in keys and getattr(leaf, "ndim", 0) == 2:
            sh = NamedSharding(plan.mesh, P(None, plan.model_axis))
        elif "linear_projection" in keys and getattr(leaf, "ndim", 0) == 1:
            sh = NamedSharding(plan.mesh, P(plan.model_axis))
        else:
            sh = repl
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(plan: MeshPlan, batch: Any) -> Any:
    """Place a host-resident batch pytree onto the mesh, sharded on the
    leading axis (the DataFeeder's successor to ``sess.run(enqueue)``).

    Single process: a plain sharded ``device_put``.  Multi-host: each
    process's feeder already reads a disjoint stripe of the corpus
    (``data/feeder.py`` ``process_index``/``process_count``), so the rows
    this host built ARE its local shard of the global batch — they are
    stitched into one global array with
    ``jax.make_array_from_process_local_data``, and the *global* batch size
    is ``local_batch * process_count`` (per-host work is constant; nothing
    each host prepares is discarded).
    """
    sharding = plan.batch()
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), batch)

    procs = jax.process_count()

    def _stitch(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * procs,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=global_shape)

    return jax.tree.map(_stitch, batch)
