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


def grid_sharded(mesh: Mesh, shape, axis: str = "data") -> NamedSharding:
    """FSDP-lite spec for a [C, H, W] plane grid: shard the first axis the
    mesh size divides (H, then W, then C — grid dims are arbitrary odd
    numbers, so the channel axis is often the one that divides); replicate
    when nothing divides (device_put rejects uneven shards)."""
    n = mesh.shape[axis]
    for dim in (1, 2, 0):
        if shape[dim] % n == 0:
            spec = [None, None, None]
            spec[dim] = axis
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def _is_plane(path) -> bool:
    return any("plane" in str(getattr(p, "key", getattr(p, "name", ""))) for p in path)


def shard_train_inputs(mesh: Mesh, params, opt_state, aabb, data,
                       shard_grids: bool = False):
    """Place params/optimizer replicated; dataset replicated (it is indexed
    by sharded ray ids; XLA partitions the gather).

    shard_grids=True additionally shards every [C, H, W] plane grid — and its
    Adam moments — along H over the mesh (ZeRO-style: grids live sharded at
    rest, GSPMD gathers working copies per step). At 640³ the plane params +
    two Adam moments are ~3 GB replicated; sharding frees (n-1)/n of that
    HBM per chip for the activation budget (SURVEY §5.8 stretch goal)."""
    rep = replicated(mesh)
    if not shard_grids:
        put = lambda tree: jax.device_put(tree, rep)
        return put(params), put(opt_state), put(aabb), put(data)

    def put_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, x: jax.device_put(
                x,
                grid_sharded(mesh, x.shape)
                if (_is_plane(path) and getattr(x, "ndim", 0) == 3)
                else rep,
            ),
            tree,
        )

    return (
        put_tree(params),
        put_tree(opt_state),
        jax.device_put(aabb, rep),
        jax.device_put(data, rep),
    )


def shard_batch_indices(mesh: Mesh, ray_idx):
    return jax.device_put(ray_idx, batch_sharded(mesh))
