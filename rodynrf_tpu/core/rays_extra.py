"""Secondary ray utilities: hierarchical PDF sampling, DDA, distance helpers.

Equivalents of the reference's auxiliary ray tools (reference:
dataLoader/ray_utils.py:11-27 depth2dist/ndc2dist, 254-352
sample_pdf/ray_marcher/dda, 355-403 read_pfm/ndc_bbox). These are not in
the training hot loop (the reference never calls sample_pdf/ray_marcher
from train.py) but are part of the public surface.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def depth2dist(z_vals: jnp.ndarray, cos_angle: jnp.ndarray) -> jnp.ndarray:
    """(reference: ray_utils.py:11-19)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    return dists * cos_angle[..., None]


def ndc2dist(ndc_pts: jnp.ndarray, cos_angle: jnp.ndarray) -> jnp.ndarray:
    """(reference: ray_utils.py:22-27)."""
    dists = jnp.linalg.norm(ndc_pts[:, 1:] - ndc_pts[:, :-1], axis=-1)
    return jnp.concatenate([dists, 1e10 * cos_angle[..., None]], -1)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-CDF hierarchical sampling (reference: ray_utils.py:254-296)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [B, n_bins]

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, -1)
    cdf_above = jnp.take_along_axis(cdf, above, -1)
    bins_below = jnp.take_along_axis(bins, below, -1)
    bins_above = jnp.take_along_axis(bins, above, -1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def dda(rays_o: jnp.ndarray, rays_d: jnp.ndarray, bbox_3d: jnp.ndarray):
    """Slab-method ray/aabb intersection (reference: ray_utils.py:299-306)."""
    inv_d = 1.0 / (rays_d + 1e-6)
    t_min = (bbox_3d[:1] - rays_o) * inv_d
    t_max = (bbox_3d[1:] - rays_o) * inv_d
    t = jnp.stack([t_min, t_max])
    t_near = jnp.max(jnp.min(t, axis=0), axis=-1, keepdims=True)
    t_far = jnp.min(jnp.max(t, axis=0), axis=-1, keepdims=True)
    return t_near, t_far


def ray_marcher(
    rays: jnp.ndarray,
    n_samples: int = 64,
    lindisp: bool = False,
    perturb: float = 0.0,
    bbox_3d: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
):
    """Uniform depth/disparity marching (reference: ray_utils.py:309-352)."""
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    if bbox_3d is not None:
        near, far = dda(rays_o, rays_d, bbox_3d)

    z_steps = jnp.linspace(0.0, 1.0, n_samples)
    if not lindisp:
        z_vals = near * (1 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1 - z_steps) + 1.0 / far * z_steps)
    z_vals = jnp.broadcast_to(z_vals, (rays.shape[0], n_samples))

    if perturb > 0 and key is not None:
        mids = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], -1)
        lower = jnp.concatenate([z_vals[:, :1], mids], -1)
        z_vals = lower + (upper - lower) * perturb * jax.random.uniform(key, z_vals.shape)

    xyz = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    return xyz, rays_o, rays_d, z_vals


def ndc_bbox(all_rays: jnp.ndarray) -> jnp.ndarray:
    """Bounding box of ray near/far points (reference: ray_utils.py:393-403)."""
    near = all_rays[..., :3].reshape(-1, 3)
    far = (all_rays[..., :3] + all_rays[..., 3:6]).reshape(-1, 3)
    lo = jnp.minimum(near.min(0), far.min(0))
    hi = jnp.maximum(near.max(0), far.max(0))
    return jnp.stack([lo, hi])


def read_pfm(filename: str):
    """Portable float map reader (reference: ray_utils.py:355-390)."""
    import re

    with open(filename, "rb") as f:
        header = f.readline().decode().rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")
        dims = re.match(r"^(\d+)\s(\d+)\s$", f.readline().decode())
        if not dims:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)), scale
