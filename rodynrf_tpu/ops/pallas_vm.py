"""Round-1 Pallas kernel study for the VM sampling primitive (superseded).

Historical module: round 1 concluded from its measurements that XLA's
gather "runs at VMEM-resident speed" and kept a thin XLA routing layer
here. Round 2's value-forced timing (PERF.md §0) showed those measurements
were dispatch-rate artifacts of the tunneled TPU attachment: XLA's gather
is actually index-rate-bound at ~90-370 M rows/s and the train step was
gather-bound end to end. The finding that Mosaic cannot express scattered
table-lookup row-gathers ("Cannot do int indexing on TPU"; DynamicGatherOp
is a within-shape permutation along lanes) remains true and shaped the
production design.

The production sampler now lives in `ops/fused_vm.py` (corner/channel/
stride-packed mega-table gather + MXU line matmuls; 12x fewer gathered
rows), with `ops/pallas_segsum.py` as the measured Pallas baseline for the
scatter-shaped backward. This module keeps its small API for compatibility;
both functions route to the reference-semantics XLA sampler.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from .grid_sample import MAT_MODE, VEC_MODE, sample_line, sample_plane


def vm_axis_sum(plane, line, xy, z, strides: Sequence[int] = (1,)) -> jnp.ndarray:
    """Σ_strides Σ_c bilerp(plane)⊙lerp(line) for one VM axis -> [N]."""
    total = 0.0
    for s in strides:
        p = sample_plane(plane, xy, stride=s)
        l = sample_line(line, z, stride=s)
        total = total + jnp.sum(p * l, axis=-1)
    return total


def sample_vm_sum_fused(planes, lines, xyz: jnp.ndarray, strides=(1,)) -> jnp.ndarray:
    """Multiscale Σ-product over all 3 VM axes -> [N]."""
    total = jnp.zeros(xyz.shape[0], xyz.dtype)
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        total = total + vm_axis_sum(planes[i], lines[i], xyz[:, (m0, m1)], xyz[:, v], strides)
    return total
