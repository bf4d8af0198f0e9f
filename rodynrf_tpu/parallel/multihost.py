"""Multi-host input pipeline for data-parallel training.

The reference is single-process/single-GPU (SURVEY.md §2.10). On a multi-host
TPU pod slice, one jitted SPMD program spans all hosts; each host may only
provide the shards of a global array that live on its addressable devices.
This module feeds the per-step ray-index batch that way:

- every process loads the full (small) pixel/flow/mask dataset and runs the
  SAME deterministic permutation sampler (same seed), so the global batch is
  agreed upon without communication;
- `global_batch_from_local` slices out this process's contiguous span of the
  global batch and assembles the global jax.Array via
  ``jax.make_array_from_process_local_data`` — host-to-device transfers stay
  local, gradient all-reduce rides ICI/DCN via GSPMD as usual.

Single-process degenerates to a plain sharded device_put (tested equal in
tests/test_sharding.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over ALL devices of the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_span(n_global: int, sharding: NamedSharding | None = None) -> tuple[int, int]:
    """This process's contiguous [start, end) span of a length-n_global batch
    under ``sharding`` (default: 1-D "data" mesh over jax.devices()).

    Derived from the sharding's own device->index map — not from raw device
    ids — so any mesh/device-order divergence surfaces as a hard error here
    instead of silently feeding wrong rows downstream."""
    if sharding is None:
        sharding = NamedSharding(global_mesh(), P("data"))
    index_map = sharding.devices_indices_map((n_global,))
    spans = []
    for dev in sharding.addressable_devices:
        (sl,) = index_map[dev]
        spans.append((0 if sl.start is None else sl.start,
                      n_global if sl.stop is None else sl.stop))
    spans.sort()
    start, end = spans[0][0], spans[-1][1]
    covered = sum(e - s for s, e in spans)
    if covered != end - start:
        raise ValueError(
            f"process's addressable shards are not contiguous in the global "
            f"batch: {spans}; multihost feeding requires a contiguous span"
        )
    return start, end


def global_batch_from_local(mesh: Mesh, global_idx: np.ndarray, axis: str = "data"):
    """Assemble the global [B] ray-index batch, providing only this
    process's rows. ``global_idx`` is the full batch every process computed
    identically (deterministic sampler)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(global_idx), sharding)
    start, end = process_span(len(global_idx), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(global_idx[start:end]), global_shape=(len(global_idx),)
    )
