"""Ray generation: pixel -> camera-space direction -> world ray -> NDC.

Functional equivalents of the reference's ray utilities
(reference: dataLoader/ray_utils.py:30-250, train.py:96-103 ids2pixel).
OpenGL-style camera convention (x right, y up, camera looks down -z).
All functions are batched and differentiable wrt focal and poses.
"""

from __future__ import annotations

import jax.numpy as jnp

from .se3 import f32_matmul


def ids2pixel(W: int, H: int, ids: jnp.ndarray):
    """Flat pixel id -> (col i, row j, view index) (reference: train.py:96-103)."""
    col = ids % W
    row = (ids // W) % H
    view_ids = ids // (W * H)
    return col, row, view_ids


def get_ray_directions_lean(i, j, focal, center):
    """Camera-space dirs for sampled pixels (reference: ray_utils.py:53-69).

    i/j are pixel column/row indices (float or int); focal = (fx, fy);
    center = (cx, cy). Adds the half-pixel offset internally.
    """
    i = jnp.asarray(i, jnp.float32) + 0.5
    j = jnp.asarray(j, jnp.float32) + 0.5
    return jnp.stack(
        [(i - center[0]) / focal[0], -(j - center[1]) / focal[1], -jnp.ones_like(i)],
        axis=-1,
    )


def get_ray_directions_blender(H: int, W: int, focal, center=None):
    """Full-image camera-space dirs grid (reference: ray_utils.py:93-112)."""
    jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ii, jj = ii + 0.5, jj + 0.5
    cent = center if center is not None else [W / 2, H / 2]
    return jnp.stack(
        [(ii - cent[0]) / focal[0], -(jj - cent[1]) / focal[1], -jnp.ones_like(ii)],
        axis=-1,
    )  # (H, W, 3)


@f32_matmul
def get_rays_lean(directions: jnp.ndarray, c2w: jnp.ndarray):
    """Per-ray world origin/direction from per-ray c2w (reference: ray_utils.py:72-90).

    directions: (B, 3); c2w: (B, 3, 4). Returns (rays_o, rays_d), both (B, 3).
    """
    rays_d = jnp.einsum("bi,bji->bj", directions, c2w[:, :3, :3])
    rays_o = c2w[:, :3, 3]
    return rays_o, rays_d


@f32_matmul
def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray):
    """Full-image rays from one c2w (reference: ray_utils.py:143-164)."""
    rays_d = directions @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def ndc_rays_blender(H: int, W: int, focal, near: float, rays_o, rays_d):
    """LLFF forward-facing NDC warp; per-axis focal, differentiable wrt focal
    (reference: ray_utils.py:115-140 ndc_rays_blender2; the scalar-focal
    variant at 197-222 is this with fx == fy).
    """
    if isinstance(focal, (tuple, list)):
        fx, fy = focal[0], focal[1]
    else:
        fx = fy = focal
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * fx)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * fy)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * fx)) * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * fy)) * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def make_rays(i, j, focal_xy, center, c2w_per_ray, H, W, ray_type: str):
    """Pixel ids + per-ray pose -> packed [B, 6] (o, d) rays, with optional
    NDC projection. This is the train-loop hot path (reference:
    train.py:1066-1077)."""
    dirs = get_ray_directions_lean(i, j, focal_xy, center)
    rays_o, rays_d = get_rays_lean(dirs, c2w_per_ray)
    if ray_type == "ndc":
        rays_o, rays_d = ndc_rays_blender(H, W, focal_xy, 1.0, rays_o, rays_d)
    return jnp.concatenate([rays_o, rays_d], axis=-1)
