"""Volume-rendering compositors: single-field and dual-field (static+dynamic).

Functional equivalents of the reference's `raw2alpha`
(models/tensorBase.py:22-34) and `raw2outputs` (renderer.py:173-315).
All maps are computed densely over a fixed [rays, samples] layout with
vectorized cumprods — no data-dependent control flow, jit/scan friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _exclusive_transmittance(alpha: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """T_i = prod_{j<i} (1 - alpha_j + eps); shape preserved [R, S]."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), 1.0 - alpha[:, :-1] + eps], axis=-1
    )
    return jnp.cumprod(shifted, axis=-1)


def raw2alpha(sigma: jnp.ndarray, dist: jnp.ndarray):
    """sigma, dist [R, S] -> (alpha, weights, bg_weight [R, 1]).

    Matches reference tensorBase.py:22-34.
    """
    alpha = 1.0 - jnp.exp(-sigma * dist)
    T = _exclusive_transmittance(alpha)
    weights = alpha * T
    bg_weight = T[:, -1:] * (1.0 - alpha[:, -1:] + 1e-10)
    return alpha, weights, bg_weight


def static_side_outputs(
    rgb_s: jnp.ndarray,
    sigma_s: jnp.ndarray,
    dists: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays: jnp.ndarray,
    *,
    is_train: bool = False,
    ray_type: str = "ndc",
    key: Optional[jax.Array] = None,
    white: Optional[jnp.ndarray] = None,
):
    """The static-side subset of raw2outputs, bit-for-bit.

    The reference re-renders the full dual model in the camera passes
    (train.py:1755-2311) but its losses there consume only rgb_map_s /
    depth_map_s / weights_s, which depend solely on the static field — so
    those passes never need the dynamic evaluation at all. Returns
    (rgb_map_s, depth_s, acc_s, weights_s) computed with exactly the
    formulas (incl. eps and white-fill coin) of raw2outputs.
    """
    alpha_s = 1.0 - jnp.exp(-sigma_s * dists)
    T_s = _exclusive_transmittance(alpha_s)
    weights_s = alpha_s * T_s
    rgb_map_s = jnp.sum(weights_s[..., None] * rgb_s, -2)
    acc_s = jnp.sum(weights_s, -1)

    if is_train and white is None and key is not None:
        white = jax.random.uniform(key, ()) < 0.5
    if is_train and white is not None:
        white = jnp.reshape(white, (-1,) if jnp.ndim(white) else ())
        if jnp.ndim(white):
            white = white[:, None]
        rgb_map_s = jnp.where(white, rgb_map_s + (1.0 - acc_s[..., None]), rgb_map_s)

    depth_s = jnp.sum(weights_s * z_vals, -1)
    if ray_type == "ndc":
        far = rays[..., 2] + rays[..., -1]
        depth_s = depth_s + (1.0 - acc_s) * far
    elif ray_type == "contract":
        depth_s = depth_s + (1.0 - acc_s) * 256.0
    rgb_map_s = jnp.clip(rgb_map_s, 0.0, 1.0)
    return rgb_map_s, depth_s, acc_s, weights_s


def dynamic_side_weights(sigma_d: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
    """raw2outputs' normalized dynamic weights, bit-for-bit — the only
    compositor output the flow-warped neighbor passes consume (their losses
    use weights_d + the sampler's points only; reference train.py:1431-1625)."""
    alpha_d = 1.0 - jnp.exp(-sigma_d * dists)
    T_d = _exclusive_transmittance(alpha_d)
    weights_d = alpha_d * T_d
    # max(sum, eps) instead of the reference's sum + eps (train.py weights_d
    # normalization): XLA's simplifier can fold the +1e-10 into the f32 sum
    # (1e-10 < ulp for any sum > ~1e-3), after which an all-empty ray divides
    # 0/0 = NaN. max() is fold-proof; for sum >= eps the two differ by
    # <= 1e-10 relative — far below every parity tolerance.
    return weights_d / jnp.maximum(jnp.sum(weights_d, -1, keepdims=True), 1e-10)


class RenderOutputs(NamedTuple):
    """Outputs of the dual-field compositor (order mirrors renderer.py:301-315)."""

    rgb_full: jnp.ndarray
    depth_full: jnp.ndarray
    acc_full: jnp.ndarray
    weights_full: jnp.ndarray
    rgb_s: jnp.ndarray
    depth_s: jnp.ndarray
    acc_s: jnp.ndarray
    weights_s: jnp.ndarray
    rgb_d: jnp.ndarray
    depth_d: jnp.ndarray
    acc_d: jnp.ndarray
    weights_d: jnp.ndarray
    dynamicness: jnp.ndarray


def raw2outputs(
    rgb_s: jnp.ndarray,
    sigma_s: jnp.ndarray,
    rgb_d: jnp.ndarray,
    sigma_d: jnp.ndarray,
    dists: jnp.ndarray,
    blending: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays: jnp.ndarray,
    *,
    is_train: bool = False,
    ray_type: str = "ndc",
    key: Optional[jax.Array] = None,
    white: Optional[jnp.ndarray] = None,
) -> RenderOutputs:
    """Dual-field compositing (reference: renderer.py:173-315).

    rgb_s/rgb_d: [R, S, 3]; sigma_s/sigma_d/dists/blending/z_vals: [R, S];
    rays: [R, 6] packed (o, d). When training, a fair coin (from ``key``)
    decides whether unoccupied ray remainder is white-filled — the
    reference's stochastic background (renderer.py:269-272). ``white``
    ([R] bool) supplies precomputed per-ray coins instead — used by the
    batched multi-pass step, where each pass's scalar coin is drawn from its
    own key and broadcast over that pass's rows (identical semantics).
    """
    alpha_d = 1.0 - jnp.exp(-sigma_d * dists)
    alpha_s = 1.0 - jnp.exp(-sigma_s * dists)

    T_d = _exclusive_transmittance(alpha_d)
    T_s = _exclusive_transmittance(alpha_s)
    alpha_mix = (1.0 - alpha_d * blending) * (1.0 - alpha_s * (1.0 - blending))
    T_full = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha_d[:, :1]), alpha_mix[:, :-1] + 1e-10], -1),
        axis=-1,
    )

    weights_d = alpha_d * T_d
    weights_s = alpha_s * T_s
    # max(): fold-proof zero-ray guard, see dynamic_side_weights
    weights_d = weights_d / jnp.maximum(jnp.sum(weights_d, -1, keepdims=True), 1e-10)
    weights_full = (alpha_d * blending + alpha_s * (1.0 - blending)) * T_full

    rgb_map_d = jnp.sum(weights_d[..., None] * rgb_d, -2)
    rgb_map_s = jnp.sum(weights_s[..., None] * rgb_s, -2)
    rgb_map_full = jnp.sum(
        (T_full * alpha_d * blending)[..., None] * rgb_d
        + (T_full * alpha_s * (1.0 - blending))[..., None] * rgb_s,
        -2,
    )

    acc_d = jnp.sum(weights_d, -1)
    acc_s = jnp.sum(weights_s, -1)
    acc_full = jnp.sum(weights_full, -1)

    if is_train and white is None and key is not None:
        white = jax.random.uniform(key, ()) < 0.5
    if is_train and white is not None:
        white = jnp.reshape(white, (-1,) if jnp.ndim(white) else ())
        if jnp.ndim(white):
            white = white[:, None]
        rgb_map_d = jnp.where(white, rgb_map_d + (1.0 - acc_d[..., None]), rgb_map_d)
        rgb_map_s = jnp.where(white, rgb_map_s + (1.0 - acc_s[..., None]), rgb_map_s)
        rgb_map_full = jnp.where(
            white, rgb_map_full + jax.nn.relu(1.0 - acc_full[..., None]), rgb_map_full
        )

    depth_d = jnp.sum(weights_d * z_vals, -1)
    depth_s = jnp.sum(weights_s * z_vals, -1)
    depth_full = jnp.sum(weights_full * z_vals, -1)
    if ray_type == "ndc":
        far = rays[..., 2] + rays[..., -1]
        depth_d = depth_d + (1.0 - acc_d) * far
        depth_s = depth_s + (1.0 - acc_s) * far
        depth_full = depth_full + jax.nn.relu(1.0 - acc_full) * far
    elif ray_type == "contract":
        depth_d = depth_d + (1.0 - acc_d) * 256.0
        depth_s = depth_s + (1.0 - acc_s) * 256.0
        depth_full = depth_full + jax.nn.relu(1.0 - acc_full) * 256.0

    rgb_map_d = jnp.clip(rgb_map_d, 0.0, 1.0)
    rgb_map_s = jnp.clip(rgb_map_s, 0.0, 1.0)
    rgb_map_full = jnp.clip(rgb_map_full, 0.0, 1.0)

    dynamicness = jnp.sum(weights_full * blending, -1)

    return RenderOutputs(
        rgb_map_full,
        depth_full,
        acc_full,
        weights_full,
        rgb_map_s,
        depth_s,
        acc_s,
        weights_s,
        rgb_map_d,
        depth_d,
        acc_d,
        weights_d,
        dynamicness,
    )
