"""Image renderer: chunked dual-field rendering of full frames.

Replaces the reference's `OctreeRender_trilinear_fast` chunk loop + the
evaluation render bodies (reference: renderer.py:24-144, 660-966) with one
jitted chunk function reused across frames. Chunks are static-shaped; the
last partial chunk is padded, keeping a single compiled executable.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rays import get_ray_directions_blender, get_rays, ndc_rays_blender
from ..fields import dynamic as dyn_fields
from ..fields import static as stat_fields
from ..fields.config import FieldConfig
from ..ops.compositing import raw2outputs
from .pipeline import eval_dynamic_field, eval_static_field
from .sampling import sample_xyz


class RenderMaps(NamedTuple):
    """Per-ray maps returned to the HOST. Per-sample tensors (weights,
    pts_ref) deliberately stay on device: shipping them cost ~44 MB per
    8192-ray chunk over the tunneled attachment and no render_image consumer
    reads them (the vis renderer computes its induced-flow maps in-graph)."""

    rgb: jnp.ndarray  # [N, 3]
    depth: jnp.ndarray  # [N]
    rgb_s: jnp.ndarray
    depth_s: jnp.ndarray
    rgb_d: jnp.ndarray
    depth_d: jnp.ndarray
    blending: jnp.ndarray  # [N] dynamicness
    delta_xyz: jnp.ndarray  # [N, 3] mean warp displacement


def make_chunk_renderer(
    static_cfg: FieldConfig,
    dynamic_cfg: FieldConfig,
    ray_type: str,
    n_samples: int,
    step_size: float,
    alpha_mask=None,
    compact: bool = False,
    k_quantum: int = 32,
):
    """Build the jitted per-chunk render function (eval mode: deterministic
    sampling, no stochastic white fill).

    alpha_mask: optional AlphaGridMask — samples whose occupancy bit is 0 are
    marked invalid before the field evaluation, the reference's early-out
    (tensorBase.py:745-765).

    compact: with an alpha_mask, COMPACT each ray's occupied samples into a
    fixed [R, K] bucket and run both field evaluations only on those — the
    TPU-native form of the reference's `xyz[ray_valid]` boolean early-out
    (tensorBase.py:745-804). K is chosen per chunk as the max per-ray
    occupied count rounded up to `k_quantum` (one compiled executable per
    bucket, cached): skipped samples have sigma = blending = rgb = 0 in the
    dense path too, so the composited maps are EXACT up to the compositor's
    +1e-10 cumprod epsilon at dropped rows (~1e-8 relative; asserted by
    tests/test_render_compact.py). Only `delta_xyz` changes definition: the
    mean warp displacement runs over the evaluated samples instead of all S
    (a vis-only diagnostic; the dense path averages the warp over masked
    samples too)."""
    import functools as _functools

    from .pipeline import _dists_and_viewdirs

    def _sample_and_mask(aabb, rays, ts, mask):
        # `mask` is threaded through the jit boundary as an ARGUMENT: a
        # closed-over AlphaGridMask volume gets embedded in the lowered HLO
        # as a constant (a 192^3 x T f32 volume is ~340 MB of proto), which
        # blows the axon remote-compile request limit and bloats every
        # executable. As an argument it is an ordinary device buffer.
        xyz, z_vals, ray_valid = sample_xyz(
            rays, n_samples, ray_type, static_cfg.near_far, aabb, step_size, None
        )
        if mask is not None:
            R, S, _ = xyz.shape
            t_flat = jnp.broadcast_to(ts[:, None], (R, S)).reshape(-1)
            alphas = mask.sample_alpha(xyz.reshape(-1, 3), t_flat).reshape(R, S)
            ray_valid = ray_valid & (alphas > 0)
        return xyz, z_vals, ray_valid

    def _finish(params, packs, aabb, rays, ts, xyz, z_vals, valid, dists=None, keepf=None):
        st = eval_static_field(
            params["static"], static_cfg, aabb, rays, ts, xyz, z_vals, valid, ray_type,
            packed=packs[0], dists=dists,
        )
        dn = eval_dynamic_field(
            params["dynamic"], dynamic_cfg, aabb, rays, ts, xyz, z_vals, valid, ray_type,
            packed=packs[1], dists=dists,
        )
        out = raw2outputs(
            st.rgb, st.sigma, dn.rgb, dn.sigma, dn.dists, dn.blending, dn.z_vals, rays,
            is_train=False, ray_type=ray_type,
        )
        if keepf is None:
            delta = jnp.mean(jnp.abs(dn.xyz_prime - dn.pts_ref), axis=1)
        else:
            kf = keepf[..., None]
            delta = jnp.sum(jnp.abs(dn.xyz_prime - dn.pts_ref) * kf, axis=1) / jnp.maximum(
                jnp.sum(kf, axis=1), 1.0
            )
        return RenderMaps(
            out.rgb_full, out.depth_full, out.rgb_s, out.depth_s, out.rgb_d, out.depth_d,
            out.dynamicness, delta,
        )

    @jax.jit
    def _render_dense(params, packs, aabb, rays, ts, mask) -> RenderMaps:
        xyz, z_vals, ray_valid = _sample_and_mask(aabb, rays, ts, mask)
        return _finish(params, packs, aabb, rays, ts, xyz, z_vals, ray_valid)

    def render_dense(params, packs, aabb, rays, ts) -> RenderMaps:
        return _render_dense(params, packs, aabb, rays, ts, alpha_mask)

    @jax.jit
    def _max_count(aabb, rays, ts, mask):
        _, _, valid = _sample_and_mask(aabb, rays, ts, mask)
        return jnp.max(jnp.sum(valid.astype(jnp.int32), axis=1))

    @_functools.lru_cache(maxsize=None)
    def _compact_fn(K: int):
        @jax.jit
        def render_compact(params, packs, aabb, rays, ts, mask) -> RenderMaps:
            xyz, z_vals, valid = _sample_and_mask(aabb, rays, ts, mask)
            # dense-space consecutive-z dists; compacted z_vals cannot
            # reproduce them (each kept sample keeps ITS dense interval)
            dists, _ = _dists_and_viewdirs(rays, z_vals, ray_type)
            # valid-first stable order preserves ascending z among kept
            # samples (transmittance order); dropped slots carry alpha=0
            order = jnp.argsort(jnp.logical_not(valid), axis=1, stable=True)
            idx = order[:, :K]
            keep = jnp.take_along_axis(valid, idx, axis=1)
            xyz_c = jnp.take_along_axis(xyz, idx[..., None], axis=1)
            z_c = jnp.take_along_axis(z_vals, idx, axis=1)
            d_c = jnp.take_along_axis(dists, idx, axis=1)
            return _finish(
                params, packs, aabb, rays, ts, xyz_c, z_c, keep,
                dists=d_c, keepf=keep.astype(jnp.float32),
            )

        # public signature stays (params, packs, aabb, rays, ts); the mask
        # rides along as a jit argument (see _sample_and_mask)
        def call(params, packs, aabb, rays, ts):
            return render_compact(params, packs, aabb, rays, ts, alpha_mask)

        return call

    def render_chunk_wrapped(params, packs, aabb, rays, ts):
        if not (compact and alpha_mask is not None):
            return render_dense(params, packs, aabb, rays, ts)
        maxc = int(_max_count(aabb, rays, ts, alpha_mask))
        K = min(n_samples, -(-max(maxc, 1) // k_quantum) * k_quantum)
        if K >= n_samples:
            return render_dense(params, packs, aabb, rays, ts)
        return _compact_fn(K)(params, packs, aabb, rays, ts)

    render_chunk_wrapped.compact_fn = _compact_fn  # bench/tests: pin one K

    # gather tables are built once per FRAME by render_image (not once per
    # chunk inside the jitted body): ~15 ms of table construction amortized
    # over the whole frame
    # eval_mode: no backward residuals, so the merged-layout budget is the
    # larger eval one (ops/fused_vm.py EVAL_MERGED_BYTES_LIMIT)
    render_chunk_wrapped.pack = lambda params: (
        stat_fields.pack_tables(params["static"], static_cfg),
        dyn_fields.pack_tables(params["dynamic"], dynamic_cfg, eval_mode=True),
    )
    return render_chunk_wrapped


class VisMaps(NamedTuple):
    """RenderMaps + the induced-flow/Δxyz families the reference's train-time
    vis logs (reference: renderer.py:483-560, 612-615)."""

    base: RenderMaps
    induced_flow_f: jnp.ndarray  # [N, 2] px
    induced_flow_b: jnp.ndarray
    induced_flow_s_f: jnp.ndarray
    induced_flow_s_b: jnp.ndarray
    delta_xyz_sum: jnp.ndarray  # [N, 3] weights_d-weighted warp displacement


def make_vis_chunk_renderer(
    static_cfg: FieldConfig,
    dynamic_cfg: FieldConfig,
    ray_type: str,
    n_samples: int,
    step_size: float,
    H: int,
    W: int,
):
    """Vis-mode chunk renderer: everything render_chunk produces plus the
    dynamic/static induced fwd/bwd flows against neighbor poses and the
    weighted scene-flow displacement map (reference: renderer.py:400-560)."""
    from ..fields import dynamic as dyn_field
    from .flow import induce_flow

    @jax.jit
    def render_chunk_vis(params, packs, aabb, rays, ts, grid, pose_f, pose_b, focal) -> VisMaps:
        xyz, z_vals, ray_valid = sample_xyz(
            rays, n_samples, ray_type, static_cfg.near_far, aabb, step_size, None
        )
        st = eval_static_field(
            params["static"], static_cfg, aabb, rays, ts, xyz, z_vals, ray_valid, ray_type,
            packed=packs[0],
        )
        dn = eval_dynamic_field(
            params["dynamic"], dynamic_cfg, aabb, rays, ts, xyz, z_vals, ray_valid, ray_type,
            packed=packs[1],
        )
        out = raw2outputs(
            st.rgb, st.sigma, dn.rgb, dn.sigma, dn.dists, dn.blending, dn.z_vals, rays,
            is_train=False, ray_type=ray_type,
        )
        delta_sum = jnp.sum(out.weights_d[..., None] * (dn.xyz_prime - dn.pts_ref), axis=1)
        base = RenderMaps(
            out.rgb_full, out.depth_full, out.rgb_s, out.depth_s, out.rgb_d, out.depth_d,
            out.dynamicness, delta_sum,
        )

        sf_f, sf_b = dyn_field.scene_flow(params["dynamic"], dn.pts_ref, ts, aabb)
        pts_f = dn.pts_ref + sf_f
        pts_b = dn.pts_ref + sf_b
        R = rays.shape[0]
        pf = jnp.broadcast_to(pose_f[None], (R, 3, 4))
        pb = jnp.broadcast_to(pose_b[None], (R, 3, 4))
        if_f, _ = induce_flow(H, W, focal, pf, out.weights_d, pts_f, grid, rays, ray_type)
        if_b, _ = induce_flow(H, W, focal, pb, out.weights_d, pts_b, grid, rays, ray_type)
        if_s_f, _ = induce_flow(H, W, focal, pf, out.weights_s, st.pts_ref, grid, rays, ray_type)
        if_s_b, _ = induce_flow(H, W, focal, pb, out.weights_s, st.pts_ref, grid, rays, ray_type)
        return VisMaps(base, if_f, if_b, if_s_f, if_s_b, delta_sum)

    def render_chunk_vis_wrapped(params, packs, aabb, rays, ts, grid, pose_f, pose_b, focal):
        return render_chunk_vis(params, packs, aabb, rays, ts, grid, pose_f, pose_b, focal)

    render_chunk_vis_wrapped.pack = lambda params: (
        stat_fields.pack_tables(params["static"], static_cfg),
        dyn_fields.pack_tables(params["dynamic"], dynamic_cfg, eval_mode=True),
    )
    return render_chunk_vis_wrapped


def render_image_vis(
    render_chunk_vis,
    params,
    aabb,
    pose_c2w,
    pose_f,
    pose_b,
    focal,
    t_value: float,
    H: int,
    W: int,
    ray_type: str,
    chunk: int = 8192,
) -> Dict[str, np.ndarray]:
    """Render one frame in vis mode: render_image's maps plus induced-flow
    and Δxyz maps against the given neighbor poses."""
    rays = rays_for_view(pose_c2w, focal, H, W, ray_type)
    ii, jj = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    grid = jnp.asarray(np.stack([ii, jj], -1).reshape(-1, 2))
    N = rays.shape[0]
    ts_full = jnp.full((N,), t_value, jnp.float32)
    pose_f = jnp.asarray(pose_f, jnp.float32)
    pose_b = jnp.asarray(pose_b, jnp.float32)
    focal = jnp.asarray(focal, jnp.float32)
    packs = render_chunk_vis.pack(params)

    outs = []
    for start in range(0, N, chunk):
        sl = slice(start, min(start + chunk, N))
        rays_c, ts_c, grid_c = rays[sl], ts_full[sl], grid[sl]
        pad = chunk - rays_c.shape[0]
        if pad:
            rays_c = jnp.pad(rays_c, ((0, pad), (0, 0)))
            ts_c = jnp.pad(ts_c, (0, pad))
            grid_c = jnp.pad(grid_c, ((0, pad), (0, 0)))
        maps = render_chunk_vis(params, packs, aabb, rays_c, ts_c, grid_c, pose_f, pose_b, focal)
        outs.append(
            jax.tree_util.tree_map(lambda x: np.asarray(x[: sl.stop - sl.start]), maps)
        )

    cat = jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, 0), *outs)
    b = cat.base
    return {
        "rgb": b.rgb.reshape(H, W, 3),
        "depth": b.depth.reshape(H, W),
        "rgb_s": b.rgb_s.reshape(H, W, 3),
        "depth_s": b.depth_s.reshape(H, W),
        "rgb_d": b.rgb_d.reshape(H, W, 3),
        "depth_d": b.depth_d.reshape(H, W),
        "blending": b.blending.reshape(H, W),
        "induced_flow_f": cat.induced_flow_f.reshape(H, W, 2),
        "induced_flow_b": cat.induced_flow_b.reshape(H, W, 2),
        "induced_flow_s_f": cat.induced_flow_s_f.reshape(H, W, 2),
        "induced_flow_s_b": cat.induced_flow_s_b.reshape(H, W, 2),
        "delta_xyz_sum": cat.delta_xyz_sum.reshape(H, W, 3),
    }


def rays_for_view(pose_c2w, focal, H: int, W: int, ray_type: str):
    """All-pixel rays for one camera (reference: renderer.py:359-372)."""
    dirs = get_ray_directions_blender(H, W, (focal, focal))
    rays_o, rays_d = get_rays(dirs, pose_c2w)
    if ray_type == "ndc":
        rays_o, rays_d = ndc_rays_blender(H, W, focal, 1.0, rays_o, rays_d)
    return jnp.concatenate([rays_o, rays_d], -1)


def render_image(
    render_chunk,
    params,
    aabb,
    pose_c2w,
    focal,
    t_value: float,
    H: int,
    W: int,
    ray_type: str,
    chunk: int = 8192,
) -> Dict[str, np.ndarray]:
    """Render one frame; returns host numpy maps shaped [H, W, ...]."""
    rays = rays_for_view(pose_c2w, focal, H, W, ray_type)
    N = rays.shape[0]
    ts_full = jnp.full((N,), t_value, jnp.float32)
    packs = render_chunk.pack(params)

    outs = []
    for start in range(0, N, chunk):
        sl = slice(start, min(start + chunk, N))
        rays_c, ts_c = rays[sl], ts_full[sl]
        pad = chunk - rays_c.shape[0]
        if pad:
            rays_c = jnp.pad(rays_c, ((0, pad), (0, 0)))
            ts_c = jnp.pad(ts_c, (0, pad))
        maps = render_chunk(params, packs, aabb, rays_c, ts_c)
        outs.append(jax.tree_util.tree_map(lambda x: np.asarray(x[: sl.stop - sl.start]), maps))

    cat = jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, 0), *outs)
    return {
        "rgb": cat.rgb.reshape(H, W, 3),
        "depth": cat.depth.reshape(H, W),
        "rgb_s": cat.rgb_s.reshape(H, W, 3),
        "depth_s": cat.depth_s.reshape(H, W),
        "rgb_d": cat.rgb_d.reshape(H, W, 3),
        "depth_d": cat.depth_d.reshape(H, W),
        "blending": cat.blending.reshape(H, W),
        "delta_xyz": cat.delta_xyz.reshape(H, W, 3),
    }
