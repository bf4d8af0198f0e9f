"""Sample-axis sharding: the dual-field compositor over a 2-D (ray x sample)
device mesh (SURVEY §5.7).

Everything in the render pipeline except the transmittance prefix is
pointwise per sample, so GSPMD shards it over a (ray, sample) mesh for free.
The one genuinely sequential op — the exclusive transmittance
``T_i = prod_{j<i}(1 - alpha_j + eps)`` (ops/compositing.py, reference
renderer.py:173-315) — is implemented here as a *distributed exclusive
prefix product*: each sample shard computes its local exclusive cumprod,
then the per-shard totals are all-gathered along the ``sample`` mesh axis
(K scalars per ray, K = sample-shard count) and each shard multiplies in
the product of its predecessors. One tiny collective instead of a
serialized scan; per-ray reductions (rgb/depth/acc maps) become local sums
+ ``psum`` over the sample axis.

This is an optional parallelism mode: it pays off only when rays x samples
per chip exceeds the HBM activation budget (very deep sample counts or very
large eval chunks). The production train step shards rays only
(parallel/mesh.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.compositing import RenderOutputs

RAY_AXIS = "ray"
SAMPLE_AXIS = "sample"


def make_2d_mesh(n_ray: int, n_sample: int) -> Mesh:
    """A (ray, sample) mesh over the first n_ray*n_sample devices."""
    devs = jax.devices()
    if len(devs) < n_ray * n_sample:
        raise ValueError(
            f"make_2d_mesh({n_ray}, {n_sample}) needs {n_ray * n_sample} "
            f"devices, but only {len(devs)} are available"
        )
    devices = np.asarray(devs[: n_ray * n_sample]).reshape(n_ray, n_sample)
    return Mesh(devices, (RAY_AXIS, SAMPLE_AXIS))


def _exclusive_prod_sharded(factors: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Exclusive prefix product along the GLOBAL sample axis.

    ``factors``: the local [R_loc, S_loc] shard of a [R, S] array; returns the
    local shard of ``T`` with ``T[:, i] = prod_{j < i_global} factors[:, j]``.
    Local exclusive cumprod + all-gathered predecessor-shard totals.
    """
    local_cum = jnp.cumprod(factors, axis=-1)
    excl_local = jnp.concatenate(
        [jnp.ones_like(factors[:, :1]), local_cum[:, :-1]], axis=-1
    )
    # [K, R_loc]: every shard's total product, in sample-shard order
    totals = jax.lax.all_gather(local_cum[:, -1], SAMPLE_AXIS)
    k = jax.lax.axis_index(SAMPLE_AXIS)
    pred = (jnp.arange(n_shards) < k)[:, None]
    offset = jnp.prod(jnp.where(pred, totals, jnp.ones_like(totals)), axis=0)
    return excl_local * offset[:, None]


def _psum_samples(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.psum(jnp.sum(x, axis=-1), SAMPLE_AXIS)


def _raw2outputs_local(
    rgb_s, sigma_s, rgb_d, sigma_d, dists, blending, z_vals, rays,
    white, *, n_sample_shards: int, is_train: bool, ray_type: str,
) -> RenderOutputs:
    """Per-shard body of the dual-field compositor; bit-for-bit the math of
    ops/compositing.py raw2outputs with the three transmittance prefixes
    rewritten as distributed exclusive products and the per-ray reductions
    as psum over the sample axis. rays/white are per-ray (ray-sharded,
    sample-replicated)."""
    alpha_d = 1.0 - jnp.exp(-sigma_d * dists)
    alpha_s = 1.0 - jnp.exp(-sigma_s * dists)

    T_d = _exclusive_prod_sharded(1.0 - alpha_d + 1e-10, n_sample_shards)
    T_s = _exclusive_prod_sharded(1.0 - alpha_s + 1e-10, n_sample_shards)
    alpha_mix = (1.0 - alpha_d * blending) * (1.0 - alpha_s * (1.0 - blending))
    T_full = _exclusive_prod_sharded(alpha_mix + 1e-10, n_sample_shards)

    weights_d = alpha_d * T_d
    weights_s = alpha_s * T_s
    wd_sum = jax.lax.psum(jnp.sum(weights_d, -1), SAMPLE_AXIS)
    weights_d = weights_d / (wd_sum[:, None] + 1e-10)
    weights_full = (alpha_d * blending + alpha_s * (1.0 - blending)) * T_full

    rgb_map_d = jax.lax.psum(jnp.sum(weights_d[..., None] * rgb_d, -2), SAMPLE_AXIS)
    rgb_map_s = jax.lax.psum(jnp.sum(weights_s[..., None] * rgb_s, -2), SAMPLE_AXIS)
    rgb_map_full = jax.lax.psum(
        jnp.sum(
            (T_full * alpha_d * blending)[..., None] * rgb_d
            + (T_full * alpha_s * (1.0 - blending))[..., None] * rgb_s,
            -2,
        ),
        SAMPLE_AXIS,
    )

    acc_d = _psum_samples(weights_d)
    acc_s = _psum_samples(weights_s)
    acc_full = _psum_samples(weights_full)

    if is_train and white is not None:
        w = white[:, None]
        rgb_map_d = jnp.where(w, rgb_map_d + (1.0 - acc_d[..., None]), rgb_map_d)
        rgb_map_s = jnp.where(w, rgb_map_s + (1.0 - acc_s[..., None]), rgb_map_s)
        rgb_map_full = jnp.where(
            w, rgb_map_full + jax.nn.relu(1.0 - acc_full[..., None]), rgb_map_full
        )

    depth_d = _psum_samples(weights_d * z_vals)
    depth_s = _psum_samples(weights_s * z_vals)
    depth_full = _psum_samples(weights_full * z_vals)
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

    dynamicness = _psum_samples(weights_full * blending)

    return RenderOutputs(
        rgb_map_full, depth_full, acc_full, weights_full,
        rgb_map_s, depth_s, acc_s, weights_s,
        rgb_map_d, depth_d, acc_d, weights_d,
        dynamicness,
    )


def make_sample_sharded_raw2outputs(
    mesh: Mesh,
    *,
    is_train: bool = False,
    ray_type: str = "ndc",
):
    """Build the shard_map'd dual-field compositor over a (ray, sample) mesh.

    Returns ``fn(rgb_s, sigma_s, rgb_d, sigma_d, dists, blending, z_vals,
    rays, white=None) -> RenderOutputs`` where every [R, S(, 3)] input is
    sharded P(ray, sample), per-ray inputs P(ray), per-ray outputs come back
    P(ray) (replicated over the sample axis by construction — they are psum
    results), and the two weight maps stay P(ray, sample).
    """
    n_sample_shards = mesh.shape[SAMPLE_AXIS]
    rs = P(RAY_AXIS, SAMPLE_AXIS)
    r = P(RAY_AXIS)
    body = partial(
        _raw2outputs_local,
        n_sample_shards=n_sample_shards,
        is_train=is_train,
        ray_type=ray_type,
    )
    out_specs = RenderOutputs(
        rgb_full=r, depth_full=r, acc_full=r, weights_full=rs,
        rgb_s=r, depth_s=r, acc_s=r, weights_s=rs,
        rgb_d=r, depth_d=r, acc_d=r, weights_d=rs,
        dynamicness=r,
    )
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(rs, rs, rs, rs, rs, rs, rs, r, r),
        out_specs=out_specs,
        # check_vma=False: every per-ray output is a psum over the sample
        # axis (replicated across it by construction), but shard_map's
        # varying-manual-axes check cannot prove that through the prefix-
        # product ppermute chain and rejects the (correct) out_specs.
        # tests/test_sample_shard.py asserts value parity against the
        # unsharded compositor, which is the guarantee the check would give.
        check_vma=False,
    )

    def fn(
        rgb_s, sigma_s, rgb_d, sigma_d, dists, blending, z_vals, rays,
        white: Optional[jnp.ndarray] = None,
    ) -> RenderOutputs:
        if white is None:
            white = jnp.zeros(rays.shape[:1], bool)
        return sharded(rgb_s, sigma_s, rgb_d, sigma_d, dists, blending, z_vals, rays, white)

    return fn


def shard_compositor_inputs(mesh: Mesh, rgb_s, sigma_s, rgb_d, sigma_d,
                            dists, blending, z_vals, rays):
    """Place compositor inputs on the 2-D mesh: [R, S(,3)] arrays sharded
    over both axes, per-ray arrays over rays only."""
    rs = NamedSharding(mesh, P(RAY_AXIS, SAMPLE_AXIS))
    r = NamedSharding(mesh, P(RAY_AXIS))
    put = jax.device_put
    return (
        put(rgb_s, rs), put(sigma_s, rs), put(rgb_d, rs), put(sigma_d, rs),
        put(dists, rs), put(blending, rs), put(z_vals, rs), put(rays, r),
    )
