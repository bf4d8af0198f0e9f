"""Device mesh construction and data-parallel sharding.

The reference is strictly single-GPU (SURVEY.md §2.10); here data
parallelism over rays is a first-class feature: a 1-D ``data`` mesh,
field/camera parameters replicated, per-ray batch arrays sharded along the
batch axis. Gradients all-reduce over ICI automatically via GSPMD — the
train step itself (train/step.py) is unchanged; parallelism is purely a
placement concern.

For reference-scale models (≤ a few hundred MB of plane/line grids at 300³),
replication is optimal — gradient all-reduce of the full param pytree per
step rides ICI. FSDP-style sharding of the grids is a stretch goal for the
640³ no-poses schedule.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_train_inputs(mesh: Mesh, params, opt_state, aabb, data):
    """Place params/optimizer replicated; dataset replicated (it is indexed
    by sharded ray ids; XLA partitions the gather)."""
    rep = replicated(mesh)
    put = lambda tree: jax.device_put(tree, rep)
    return put(params), put(opt_state), put(aabb), put(data)


def shard_batch_indices(mesh: Mesh, ray_idx):
    return jax.device_put(ray_idx, batch_sharded(mesh))
