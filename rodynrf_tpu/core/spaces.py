"""Scene parameterizations: NDC <-> world, mip-NeRF-360 contraction <-> world.

Functional equivalents of the reference's coordinate maps
(reference: renderer.py:1266-1296 NDC2world/world2NDC/contract2world and
models/tensorBase.py:550-556 the forward contraction).
"""

from __future__ import annotations

import jax.numpy as jnp


def ndc2world(pts: jnp.ndarray, H: float, W: float, f) -> jnp.ndarray:
    """NDC -> world (reference: renderer.py:1266-1273)."""
    pts_z = 2.0 / (jnp.clip(pts[..., 2:], -1.0, 1.0 - 1e-6) - 1.0)
    pts_x = -pts[..., 0:1] * pts_z * W / 2.0 / f
    pts_y = -pts[..., 1:2] * pts_z * H / 2.0 / f
    return jnp.concatenate([pts_x, pts_y, pts_z], axis=-1)


def world2ndc(pts_world: jnp.ndarray, H: float, W: float, f) -> jnp.ndarray:
    """World -> NDC (reference: renderer.py:1276-1282)."""
    o0 = -1.0 / (W / (2.0 * f)) * pts_world[..., 0:1] / pts_world[..., 2:]
    o1 = -1.0 / (H / (2.0 * f)) * pts_world[..., 1:2] / pts_world[..., 2:]
    o2 = 1.0 + 2.0 / pts_world[..., 2:]
    return jnp.concatenate([o0, o1, o2], axis=-1)


def contract(pts: jnp.ndarray) -> jnp.ndarray:
    """L-inf mip-NeRF-360 contraction: identity inside the unit cube, maps
    everything into the [-2, 2] cube (reference: tensorBase.py:550-556)."""
    norm = jnp.max(jnp.abs(pts), axis=-1, keepdims=True)
    safe = jnp.maximum(norm, 1e-9)
    contracted = (2.0 - 1.0 / safe) * (pts / safe)
    return jnp.where(norm > 1.0, contracted, pts)


def contract2world(pts_contract: jnp.ndarray) -> jnp.ndarray:
    """Inverse contraction (reference: renderer.py:1285-1296)."""
    norm = jnp.max(jnp.abs(pts_contract), axis=-1, keepdims=True)
    safe = jnp.maximum(norm, 1e-9)
    scale = -1.0 / (norm - 2.0)
    return jnp.where(norm > 1.0, pts_contract / safe * scale, pts_contract)
