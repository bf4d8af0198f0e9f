"""Ray-point samplers for the three scene parameterizations.

Functional equivalents of the reference's samplers
(reference: models/tensorBase.py:487-559 sample_ray_ndc / sample_ray /
sample_ray_contracted, renderer.py:147-170 sampleXYZ dispatch).

All samplers return (xyz [R, S, 3], z_vals [R, S], ray_valid [R, S]) with a
*static* sample count S; jitter is driven by an explicit PRNG key (None =
deterministic / eval mode).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.spaces import contract


def sample_ray_ndc(
    rays_o, rays_d, near: float, far: float, n_samples: int, aabb,
    key: Optional[jax.Array], det_jitter: bool = False,
):
    """Uniform z in [near, far]; jitter shared across rays (reference:
    tensorBase.py:487-499). det_jitter=True applies the constant 0.5 jitter
    of golden-comparison mode (torch.rand patched to 0.5 on the torch side)."""
    interpx = jnp.linspace(near, far, n_samples)[None]  # [1, S]
    if det_jitter:
        interpx = interpx + 0.5 * ((far - near) / n_samples)
    elif key is not None:
        interpx = interpx + jax.random.uniform(key, interpx.shape) * ((far - near) / n_samples)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * interpx[..., None]
    inb = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
    z_vals = jnp.broadcast_to(interpx, (rays_o.shape[0], n_samples))
    return pts, z_vals, inb


def sample_ray_world(
    rays_o, rays_d, near: float, far: float, n_samples: int, aabb, step_size: float,
    key: Optional[jax.Array], det_jitter: bool = False,
):
    """World-space AABB march (reference: tensorBase.py:501-522)."""
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.clip(jnp.minimum(rate_a, rate_b).max(-1), near, far)

    rng = jnp.arange(n_samples, dtype=jnp.float32)[None]  # [1, S]
    if det_jitter:
        rng = rng + 0.5
    elif key is not None:
        rng = rng + jax.random.uniform(key, (rays_o.shape[0], 1))
    step = step_size * rng
    interpx = t_min[..., None] + step

    pts = rays_o[..., None, :] + rays_d[..., None, :] * interpx[..., None]
    inb = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
    return pts, jnp.broadcast_to(interpx, (rays_o.shape[0], n_samples)), inb


def sample_ray_contracted(
    rays_o, rays_d, near: float, far: float, n_samples: int,
    key: Optional[jax.Array], det_jitter: bool = False,
):
    """Inner/outer split with mip-NeRF-360 contraction (reference:
    tensorBase.py:524-559). Inner: uniform [near, 2]; outer: inverse-distance
    [2, far]; all samples valid."""
    inner_n = n_samples - n_samples // 2
    outer_n = n_samples // 2

    interpx_inner = jnp.linspace(near, 2.0, inner_n + 1)[None]  # [1, S_in+1]
    if det_jitter:
        k2 = None
        jitter = jnp.full(interpx_inner.shape, 0.5) * ((2.0 - near) / inner_n)
        interpx_inner = interpx_inner.at[:, :-1].add(jitter[:, :-1])
    elif key is not None:
        k1, k2 = jax.random.split(key)
        jitter = jax.random.uniform(k1, interpx_inner.shape) * ((2.0 - near) / inner_n)
        interpx_inner = interpx_inner.at[:, :-1].add(jitter[:, :-1])
    else:
        k2 = None
    interpx_inner = (interpx_inner[:, 1:] + interpx_inner[:, :-1]) * 0.5

    rng = jnp.arange(outer_n + 1, dtype=jnp.float32)[None]
    if det_jitter:
        rng = rng.at[:, :-1].add(0.5)
    elif k2 is not None:
        jitter = jax.random.uniform(k2, rng.shape)
        rng = rng.at[:, :-1].add(jitter[:, :-1])
    rng = jnp.flip(rng, axis=1)
    rng = (rng[:, 1:] + rng[:, :-1]) * 0.5
    interpx_outer = 1.0 / (1.0 / far + (1.0 / 2.0 - 1.0 / far) * rng / outer_n)

    interpx = jnp.concatenate([interpx_inner, interpx_outer], -1)  # [1, S]
    pts = rays_o[..., None, :] + rays_d[..., None, :] * interpx[..., None]
    pts = contract(pts)
    z_vals = jnp.broadcast_to(interpx, (rays_o.shape[0], n_samples))
    valid = jnp.ones_like(z_vals, dtype=bool)
    return pts, z_vals, valid


def sample_xyz(
    rays: jnp.ndarray,
    n_samples: int,
    ray_type: str,
    near_far,
    aabb,
    step_size: float,
    key: Optional[jax.Array] = None,
    det_jitter: bool = False,
):
    """Dispatch (reference: renderer.py:147-170). rays [R, 6] packed (o, d)."""
    rays_o, rays_d = rays[:, :3], rays[:, 3:6]
    near, far = near_far
    if ray_type == "ndc":
        return sample_ray_ndc(rays_o, rays_d, near, far, n_samples, aabb, key, det_jitter)
    if ray_type == "contract":
        return sample_ray_contracted(rays_o, rays_d, near, far, n_samples, key, det_jitter)
    return sample_ray_world(rays_o, rays_d, near, far, n_samples, aabb, step_size, key, det_jitter)
