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
    flat_quantum: int = 16384,
):
    """Build the jitted per-chunk render function (eval mode: deterministic
    sampling, no stochastic white fill).

    alpha_mask: optional AlphaGridMask — samples whose occupancy bit is 0 are
    marked invalid before the field evaluation, the reference's early-out
    (tensorBase.py:745-765).

    compact: with an alpha_mask, COMPACT the whole chunk's occupied samples
    into ONE flat array and run both field evaluations only on those — the
    TPU-native form of the reference's `xyz[ray_valid]` flat evaluation +
    scatter-back (tensorBase.py:745-804). The selector is the single-gather
    nearest-voxel test on the pre-dilated volume (a strict superset of the
    trilinear>0 kept set — see the comment at _occ_probe), evaluated ONCE
    per chunk. The flat bucket size is the chunk's total occupied count
    rounded up to `flat_quantum` (one compiled executable per bucket,
    cached — see _flat_fn for why chunk-level beats a per-ray [R, K]
    bucket under skewed occupancy). Skipped samples have sigma = blending
    = rgb = 0 in the superset-masked dense render too, so the composited
    maps are EXACT vs that dense render up to the compositor's +1e-10
    cumprod epsilon at dropped rows (~1e-8 relative; asserted by
    tests/test_render_compact.py, along with the superset property vs the
    trilinear mask). Only `delta_xyz` changes definition: the mean warp
    displacement runs over the kept samples instead of all S (a vis-only
    diagnostic; the dense path averages the warp over masked samples
    too)."""
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

    # Compact-path occupancy selector: nearest-voxel test on a PRE-DILATED
    # volume — ONE gathered byte per sample vs the trilinear test's 8 corner
    # gathers (takes serialize per index, PERF.md §1: the trilinear mask at
    # 8192x270 samples is ~17.7M indices ≈ 230 ms/chunk, 2x the whole dense
    # field evaluation). Dilation (fields/alpha_mask.dilate_occupancy) makes
    # the kept set a strict SUPERSET of the trilinear>0 kept set: every
    # dropped sample is one the reference's early-out drops too, and extra
    # kept samples contribute their TRUE field values — the compacted output
    # sits between the reference's masked render and the unmasked dense
    # render. Superset + exactness-vs-superset-dense are asserted by
    # tests/test_render_compact.py; same selector as the train step
    # (train/step.py _occupancy).
    if compact and alpha_mask is not None:
        from ..fields.alpha_mask import dilate_occupancy, occupancy_nearest

        _vd = dilate_occupancy(alpha_mask.alpha_volume)
        # FLAT layout: a 4-D u8 jit parameter gets an XLA-chosen tiled
        # layout costing a full-volume relayout copy + reshape per chunk
        # before the flat gather (fields/alpha_mask.occupancy_nearest)
        vol_shape = tuple(int(s) for s in _vd.shape)
        vol_dilated = _vd.reshape(-1)

        @jax.jit
        def _occ_probe(aabb, rays, ts, vol, maabb):
            # vol/maabb ride as jit ARGUMENTS (constant-embedding would blow
            # the remote-compile request, see _sample_and_mask); xyz/z/occ
            # stay on device, only the max count scalar is fetched
            xyz, z_vals, ray_valid = sample_xyz(
                rays, n_samples, ray_type, static_cfg.near_far, aabb, step_size, None
            )
            R, S, _ = xyz.shape
            t_flat = jnp.broadcast_to(ts[:, None], (R, S)).reshape(-1)
            occ = ray_valid & occupancy_nearest(
                vol, maabb, xyz.reshape(-1, 3), t_flat, shape=vol_shape
            ).reshape(R, S)
            return xyz, z_vals, occ, jnp.sum(occ.astype(jnp.int32))

        @jax.jit
        def _render_dense_occ(params, packs, aabb, rays, ts, xyz, z_vals, occ):
            # superset-masked DENSE render: the compact path's exactness
            # oracle (same selector, no compaction) and the wrapper's
            # fallback when the bucket would not shrink the sample axis
            return _finish(params, packs, aabb, rays, ts, xyz, z_vals, occ)

    @_functools.lru_cache(maxsize=None)
    def _flat_fn(N: int):
        """CHUNK-LEVEL flat compaction: all occupied samples of the chunk
        ride in ONE [N] flat array — the TPU-native mirror of the
        reference's `xyz[ray_valid]` flat evaluation + scatter-back
        (tensorBase.py:745-804), with N a quantized static bucket size.

        A per-ray [R, K] bucket (the train step's form) is hostage to the
        LONGEST ray under the measured skew (mean 38 / max 215 occupied of
        270): one long ray forces K≈max for the whole chunk and the
        "compacted" eval does near-dense work (measured: 296 ms vs 240 ms
        dense). The flat form's work scales with the MEAN occupancy.
        Field evaluations (gathers + shading MLPs) run on the N flat
        samples; the per-sample outputs scatter back to dense [R, S]
        (one N-index scatter) and the cheap elementwise compositor runs
        dense — output EXACT vs the superset-masked dense oracle."""

        @jax.jit
        def render_flat(params, packs, aabb, rays, ts, xyz, z_vals, occ) -> RenderMaps:
            from ..fields.mlps import apply_shading
            from ..fields.static import feature2density
            from ..ops.compositing import raw2alpha
            from ..fields.dynamic import normalize_coord

            R, S, _ = xyz.shape
            RS = R * S
            dists, viewdirs = _dists_and_viewdirs(rays, z_vals, ray_type)

            # flat slot table: slot n -> dense position idx_flat[n]; unused
            # slots hold the sentinel RS (their scatter writes drop). If
            # N < the true occupied count (misuse of a pinned N), overflow
            # samples drop to sigma=0 — the wrapper always sizes N >= count.
            occf = occ.reshape(-1)
            pos = jnp.cumsum(occf.astype(jnp.int32)) - 1
            src = jnp.where(occf, pos, N)  # unoccupied -> OOB, dropped
            idx_flat = (
                jnp.full((N,), RS, jnp.int32)
                .at[src]
                .set(jnp.arange(RS, dtype=jnp.int32), mode="drop")
            )
            idx_safe = jnp.minimum(idx_flat, RS - 1)  # clamp for gathers
            rid = idx_safe // S

            xyz_f = xyz.reshape(RS, 3).at[idx_safe].get(mode="promise_in_bounds")
            t_f = ts.at[rid].get(mode="promise_in_bounds")
            vd_f = viewdirs.at[rid].get(mode="promise_in_bounds")
            xyz_fn = normalize_coord(xyz_f, aabb)

            # static: density + appearance in one fused gather, shading MLP
            sig_feat_s, app_s = stat_fields.all_features_fused(
                params["static"], static_cfg, xyz_fn, packed=packs[0]
            )
            sigma_s_f = feature2density(sig_feat_s, static_cfg)
            rgb_s_f = apply_shading(
                params["static"]["shading"], static_cfg.shading_mode,
                static_cfg.view_pe, static_cfg.fea_pe, static_cfg.pos_pe,
                xyz_fn, vd_f, app_s, t_f[:, None],
            )

            # dynamic: warp once, density+blending+appearance in one gather
            xyz_prime_f = dyn_fields.warp_coordinate(
                params["dynamic"], xyz_f, t_f, aabb
            )
            xyz_prime_fn = normalize_coord(xyz_prime_f, aabb)
            sig_feat_d, blend_feat, app_d = dyn_fields.all_features_fused(
                params["dynamic"], dynamic_cfg, xyz_fn, t_f, xyz_prime_fn,
                packed=packs[1],
            )
            sigma_d_f = feature2density(sig_feat_d, dynamic_cfg)
            blend_f = jax.nn.sigmoid(blend_feat)
            rgb_d_f = apply_shading(
                params["dynamic"]["shading"], dynamic_cfg.shading_mode,
                dynamic_cfg.view_pe, dynamic_cfg.fea_pe, dynamic_cfg.pos_pe,
                xyz_fn, vd_f, app_d, t_f[:, None],
            )

            # ONE packed scatter-back: [sig_s, sig_d, blend, rgb_s, rgb_d,
            # xyz_prime] = 12 channels; zeros everywhere the mask dropped
            # (exactly the oracle's where(occ, ., 0))
            payload = jnp.concatenate(
                [
                    sigma_s_f[:, None], sigma_d_f[:, None], blend_f[:, None],
                    rgb_s_f, rgb_d_f, xyz_prime_f,
                ],
                axis=-1,
            )
            dense = (
                jnp.zeros((RS, payload.shape[-1]), payload.dtype)
                .at[idx_flat]
                .set(payload, mode="drop")
            )
            sigma_s = dense[:, 0].reshape(R, S)
            sigma_d = dense[:, 1].reshape(R, S)
            blending = dense[:, 2].reshape(R, S)
            rgb_s_raw = dense[:, 3:6].reshape(R, S, 3)
            rgb_d_raw = dense[:, 6:9].reshape(R, S, 3)
            xyz_prime = dense[:, 9:12].reshape(R, S, 3)

            # reference app_mask semantics: rgb zeroed below the TRUE
            # transmittance-weight threshold (needs dense sigma, so it runs
            # post-scatter; tensorBase.py:774-804)
            _, w_s, _ = raw2alpha(sigma_s, dists * static_cfg.distance_scale)
            _, w_d, _ = raw2alpha(sigma_d, dists * dynamic_cfg.distance_scale)
            rgb_s = jnp.where(
                (w_s > static_cfg.ray_march_weight_thres)[..., None], rgb_s_raw, 0.0
            )
            rgb_d = jnp.where(
                (w_d > dynamic_cfg.ray_march_weight_thres)[..., None], rgb_d_raw, 0.0
            )

            out = raw2outputs(
                rgb_s, sigma_s, rgb_d, sigma_d,
                dists * dynamic_cfg.distance_scale, blending, z_vals, rays,
                is_train=False, ray_type=ray_type,
            )
            kf = occ.astype(jnp.float32)[..., None]
            delta = jnp.sum(jnp.abs(xyz_prime - xyz) * kf, axis=1) / jnp.maximum(
                jnp.sum(kf, axis=1), 1.0
            )
            return RenderMaps(
                out.rgb_full, out.depth_full, out.rgb_s, out.depth_s,
                out.rgb_d, out.depth_d, out.dynamicness, delta,
            )

        # public signature stays (params, packs, aabb, rays, ts); the
        # occupancy probe runs once per chunk and its device-resident
        # geometry is handed straight to the flat executable
        def call(params, packs, aabb, rays, ts, probed=None):
            if probed is None:
                probed = _occ_probe(
                    aabb, rays, ts, vol_dilated, alpha_mask.aabb
                )[:3]
            xyz, z_vals, occ = probed
            return render_flat(params, packs, aabb, rays, ts, xyz, z_vals, occ)

        return call

    def render_chunk_wrapped(params, packs, aabb, rays, ts):
        if not (compact and alpha_mask is not None):
            return render_dense(params, packs, aabb, rays, ts)
        xyz, z_vals, occ, total = _occ_probe(
            aabb, rays, ts, vol_dilated, alpha_mask.aabb
        )
        RS = rays.shape[0] * n_samples
        N = min(RS, -(-max(int(total), 1) // flat_quantum) * flat_quantum)
        if N >= RS:
            return _render_dense_occ(params, packs, aabb, rays, ts, xyz, z_vals, occ)
        return _flat_fn(N)(params, packs, aabb, rays, ts, probed=(xyz, z_vals, occ))

    render_chunk_wrapped.flat_fn = _flat_fn  # bench/tests: pin one bucket N
    if compact and alpha_mask is not None:
        # the compact path's exactness oracle, exposed for tests/bench
        def _dense_superset(params, packs, aabb, rays, ts):
            xyz, z_vals, occ, _ = _occ_probe(
                aabb, rays, ts, vol_dilated, alpha_mask.aabb
            )
            return _render_dense_occ(params, packs, aabb, rays, ts, xyz, z_vals, occ)

        render_chunk_wrapped.dense_superset = _dense_superset

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
