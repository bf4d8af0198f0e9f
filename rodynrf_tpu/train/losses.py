"""Loss functions for the joint static/dynamic/camera optimization.

Each matches a reference loss term exactly (SURVEY.md §3.2 inventory);
citations point into /root/reference/train.py. All helpers are mask-based
with static shapes (no boolean indexing) so the whole loss assembly jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def masked_l1_mean(err_abs, mask, denom_extra: float = 1.0):
    """sum(|err| * mask) / (sum(mask) + 1e-8) / denom_extra
    (the reference's flow-loss normalization, train.py:1391-1395)."""
    return jnp.sum(err_abs * mask) / (jnp.sum(mask) + 1e-8) / denom_extra


def skewed_entropy(mask_map):
    """Skewed binary entropy of the dynamicness map (train.py:1250-1259)."""
    m = jnp.clip(mask_map, 1e-6, 1.0 - 1e-6)
    m2 = m * m
    return jnp.mean(-(m2 * jnp.log(m2) + (1 - m2) * jnp.log(1 - m2)))


def adaptive_order_loss(depth_d, depth_s_detached, dynamicness_detached, ray_type):
    """Depth-order consistency on static regions (train.py:1276-1292, 1666-1680)."""
    w = 1.0 - dynamicness_detached
    if ray_type == "ndc":
        err = (depth_d - depth_s_detached) ** 2
    else:  # contract
        err = (1.0 / (depth_d + 1e-6) - 1.0 / (depth_s_detached + 1e-6)) ** 2
    return jnp.sum(err * w) / (jnp.sum(w) + 1e-8)


def _masked_lower_median(x, valid):
    """Exact torch-style lower median of x over valid entries.

    torch.median returns the lower of the two middle elements; jnp.median
    averages. We sort invalids to +inf and index (count-1)//2.
    """
    big = jnp.where(valid, x, jnp.inf)
    srt = jnp.sort(big)
    count = jnp.sum(valid.astype(jnp.int32))
    idx = jnp.maximum(count - 1, 0) // 2
    return srt[idx]


def compute_depth_loss_masked(dyn_depth, gt_depth, valid):
    """Median/MAD-normalized depth loss over a masked subset
    (reference: train.py:797-807 compute_depth_loss, applied per camera)."""
    v = valid.astype(dyn_depth.dtype)
    n = jnp.sum(v)
    t_d = _masked_lower_median(dyn_depth, valid)
    s_d = jnp.sum(jnp.abs(dyn_depth - t_d) * v) / jnp.maximum(n, 1.0)
    d_norm = (dyn_depth - t_d) / (s_d + 1e-10)

    t_g = _masked_lower_median(gt_depth, valid)
    s_g = jnp.sum(jnp.abs(gt_depth - t_g) * v) / jnp.maximum(n, 1.0)
    g_norm = (gt_depth - t_g) / (s_g + 1e-10)

    return jnp.sum(((d_norm - g_norm) ** 2) * v)


def monodepth_loss(depth, target, t_ref, n_cams: int, extra_valid=None):
    """Per-camera normalized monodepth loss (reference: train.py:1635-1658,
    2096-2113): Σ_cam depth_loss(cam subset) / Σ_cam |subset|, cameras with
    ≤1 valid ray skipped."""
    if extra_valid is None:
        extra_valid = jnp.ones_like(depth, dtype=bool)

    def per_cam(cam_idx):
        valid = (t_ref == cam_idx) & extra_valid
        n = jnp.sum(valid.astype(jnp.float32))
        use = n > 1.0
        loss = jnp.where(use, compute_depth_loss_masked(depth, target, valid), 0.0)
        return loss, jnp.where(use, n, 0.0)

    losses, counts = jax.vmap(per_cam)(jnp.arange(n_cams))
    return jnp.sum(losses) / jnp.maximum(jnp.sum(counts), 1.0)


def disp_smooth_loss(depth, depth_i_neighbor, depth_j_neighbor):
    """Disparity smoothness vs pixel neighbors (train.py:2293-2305)."""
    inv = 1.0 / jnp.clip(depth, 1e-6, None)
    inv_i = 1.0 / jnp.clip(depth_i_neighbor, 1e-6, None)
    inv_j = 1.0 / jnp.clip(depth_j_neighbor, 1e-6, None)
    return jnp.mean((inv - inv_i) ** 2) + jnp.mean((inv - inv_j) ** 2)
