"""Golden parity for the compositor and loss helpers vs torch mirrors."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rodynrf_tpu.ops.compositing import raw2outputs
from rodynrf_tpu.train.losses import compute_depth_loss_masked, monodepth_loss

RNG = np.random.default_rng(5)


def torch_raw2outputs(rgb_s, sigma_s, rgb_d, sigma_d, dists, blending, z_vals, rays, ray_type):
    """Torch mirror of the reference compositor (renderer.py:173-315),
    eval mode (no stochastic white fill)."""
    t = torch.from_numpy
    rgb_s, sigma_s, rgb_d, sigma_d = t(rgb_s), t(sigma_s), t(rgb_d), t(sigma_d)
    dists, blending, z_vals, rays = t(dists), t(blending), t(z_vals), t(rays)

    alpha_d = 1.0 - torch.exp(-sigma_d * dists)
    alpha_s = 1.0 - torch.exp(-sigma_s * dists)

    def excl(alpha):
        return torch.cumprod(
            torch.cat([torch.ones(alpha.shape[0], 1), 1.0 - alpha + 1e-10], -1), -1
        )[:, :-1]

    T_d, T_s = excl(alpha_d), excl(alpha_s)
    T_full = torch.cumprod(
        torch.cat(
            [torch.ones(alpha_d.shape[0], 1),
             (1.0 - alpha_d * blending) * (1.0 - alpha_s * (1.0 - blending)) + 1e-10],
            -1,
        ),
        -1,
    )[:, :-1]

    weights_d = alpha_d * T_d
    weights_s = alpha_s * T_s
    weights_d = weights_d / (torch.sum(weights_d, -1, keepdim=True) + 1e-10)
    weights_full = (alpha_d * blending + alpha_s * (1.0 - blending)) * T_full

    rgb_map_d = torch.sum(weights_d[..., None] * rgb_d, -2)
    rgb_map_s = torch.sum(weights_s[..., None] * rgb_s, -2)
    rgb_map_full = torch.sum(
        (T_full * alpha_d * blending)[..., None] * rgb_d
        + (T_full * alpha_s * (1.0 - blending))[..., None] * rgb_s,
        -2,
    )
    acc_d = weights_d.sum(-1)
    acc_s = weights_s.sum(-1)
    acc_full = weights_full.sum(-1)
    depth_d = torch.sum(weights_d * z_vals, -1)
    depth_s = torch.sum(weights_s * z_vals, -1)
    depth_full = torch.sum(weights_full * z_vals, -1)
    if ray_type == "ndc":
        far = rays[..., 2] + rays[..., -1]
        depth_d = depth_d + (1 - acc_d) * far
        depth_s = depth_s + (1 - acc_s) * far
        depth_full = depth_full + torch.relu(1 - acc_full) * far
    else:
        depth_d = depth_d + (1 - acc_d) * 256.0
        depth_s = depth_s + (1 - acc_s) * 256.0
        depth_full = depth_full + torch.relu(1 - acc_full) * 256.0
    dyn = torch.sum(weights_full * blending, -1)
    return {
        "rgb_full": rgb_map_full.clamp(0, 1),
        "depth_full": depth_full,
        "rgb_s": rgb_map_s.clamp(0, 1),
        "depth_s": depth_s,
        "rgb_d": rgb_map_d.clamp(0, 1),
        "depth_d": depth_d,
        "weights_full": weights_full,
        "weights_d": weights_d,
        "weights_s": weights_s,
        "dynamicness": dyn,
    }


@pytest.mark.parametrize("ray_type", ["ndc", "contract"])
def test_raw2outputs_matches_torch_mirror(ray_type):
    R, S = 16, 24
    rgb_s = RNG.uniform(0, 1, (R, S, 3)).astype(np.float32)
    rgb_d = RNG.uniform(0, 1, (R, S, 3)).astype(np.float32)
    sigma_s = (np.abs(RNG.standard_normal((R, S))) * 4).astype(np.float32)
    sigma_d = (np.abs(RNG.standard_normal((R, S))) * 4).astype(np.float32)
    dists = np.full((R, S), 0.06, np.float32)
    z_vals = np.cumsum(dists, -1).astype(np.float32)
    blending = RNG.uniform(0, 1, (R, S)).astype(np.float32)
    rays = RNG.standard_normal((R, 6)).astype(np.float32)

    import functools
    import jax

    fn = jax.jit(functools.partial(raw2outputs, is_train=False, ray_type=ray_type))
    out = fn(
        jnp.asarray(rgb_s), jnp.asarray(sigma_s), jnp.asarray(rgb_d), jnp.asarray(sigma_d),
        jnp.asarray(dists), jnp.asarray(blending), jnp.asarray(z_vals), jnp.asarray(rays),
    )
    ref = torch_raw2outputs(rgb_s, sigma_s, rgb_d, sigma_d, dists, blending, z_vals, rays, ray_type)
    for name in ("rgb_full", "depth_full", "rgb_s", "depth_s", "rgb_d", "depth_d",
                 "weights_full", "weights_d", "weights_s", "dynamicness"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), ref[name].numpy(), atol=2e-4, rtol=2e-3,
            err_msg=name,
        )


def torch_compute_depth_loss(dyn_depth, gt_depth):
    """(reference: train.py:797-807)."""
    t = torch.from_numpy
    dyn_depth, gt_depth = t(dyn_depth), t(gt_depth)
    t_d = torch.median(dyn_depth)
    s_d = torch.mean(torch.abs(dyn_depth - t_d))
    d_norm = (dyn_depth - t_d) / (s_d + 1e-10)
    t_g = torch.median(gt_depth)
    s_g = torch.mean(torch.abs(gt_depth - t_g))
    g_norm = (gt_depth - t_g) / (s_g + 1e-10)
    return float(torch.sum((d_norm - g_norm) ** 2))


@pytest.mark.parametrize("n", [7, 8, 33])
def test_depth_loss_matches_torch_median_semantics(n):
    dyn = RNG.standard_normal(n).astype(np.float32)
    gt = RNG.standard_normal(n).astype(np.float32)
    ours = float(
        compute_depth_loss_masked(jnp.asarray(dyn), jnp.asarray(gt), jnp.ones(n, bool))
    )
    ref = torch_compute_depth_loss(dyn, gt)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_monodepth_loss_per_camera_matches_loop():
    """Vectorized per-camera loss == explicit reference loop
    (train.py:1635-1658)."""
    B, T = 96, 4
    depth = RNG.standard_normal(B).astype(np.float32)
    target = RNG.standard_normal(B).astype(np.float32)
    t_ref = RNG.integers(0, T, B)

    total, counter = 0.0, 0.0
    for cam in range(T):
        valid = t_ref == cam
        if valid.sum() > 1:
            total += torch_compute_depth_loss(depth[valid], target[valid])
            counter += valid.sum()
    ref = total / counter

    ours = float(monodepth_loss(jnp.asarray(depth), jnp.asarray(target), jnp.asarray(t_ref), T))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
