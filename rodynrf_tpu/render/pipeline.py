"""Field evaluation pipeline: one batch of rays through a field.

Functional equivalent of the reference's `TensorBase.forward`
(reference: models/tensorBase.py:704-850), re-designed for TPU: everything is
dense over a static [rays, samples] layout with `where`-masking instead of
boolean gathers (`xyz[ray_valid]`, `rgb[app_mask]`), which XLA maps onto the
VPU/MXU without scatter.

With appearance compaction (cfg.app_frac > 0, ops/compaction.py) the
reference's data-dependent `app_mask` sparsity (tensorBase.py:774-804) is
recovered with static shapes: density (and blending) are evaluated densely,
then the appearance gather + shading MLP run only on the K highest-weight
samples of each ray, with the reference's `weight > thres` zeroing applied in
compacted space. Exact vs the dense path whenever per-ray above-threshold
occupancy <= K.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..fields import dynamic as dyn
from ..fields import static as stat
from ..fields.config import FieldConfig
from ..fields.mlps import apply_shading
from ..fields.static import feature2density
from ..ops.compaction import compact_rows, expand_rows, topk_select
from ..ops.compositing import raw2alpha


class FieldEval(NamedTuple):
    """Per-sample field outputs (mirrors tensorBase.py:839-850 return)."""

    blending: Optional[jnp.ndarray]  # [R, S] or None (static field)
    pts_ref: jnp.ndarray  # [R, S, 3] sampled points (input space)
    weights: jnp.ndarray  # [R, S]
    xyz_prime: Optional[jnp.ndarray]  # [R, S, 3] warped points or None
    rgb: jnp.ndarray  # [R, S, 3]
    sigma: jnp.ndarray  # [R, S]
    z_vals: jnp.ndarray  # [R, S]
    dists: jnp.ndarray  # [R, S] (already × distance_scale)


def _dists_and_viewdirs(rays, z_vals, ray_type):
    """(reference: tensorBase.py:717-739)."""
    viewdirs = rays[:, 3:6]
    dists = jnp.concatenate([z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], -1)
    if ray_type in ("ndc", "contract"):
        norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        dists = dists * norm
        viewdirs = viewdirs / norm
    return dists, viewdirs


def _flat_index(ray_valid: jnp.ndarray, N: int):
    """Flat slot table over the occupied samples of a [R, S] mask.

    Maps flat slot n -> row-major dense position idx_flat[n] in [0, R*S)
    (sentinel R*S for unused slots: gathers clamp, the payload scatter
    drops). Occupied samples beyond the N-th drop too — the caller sizes N
    above the batch-total occupancy (trainer probe) so that is a rare-batch
    tail event. The scatter positions are a cumsum of the mask, hence
    unique. This is the train step's form of the eval renderer's
    chunk-level flat compaction (renderer.py _flat_fn); reference analog:
    the `xyz[ray_valid]` flat evaluation + scatter-back
    (tensorBase.py:745-804)."""
    R, S = ray_valid.shape
    RS = R * S
    occf = ray_valid.reshape(-1)
    pos = jnp.cumsum(occf.astype(jnp.int32)) - 1
    src = jnp.where(occf, pos, N)  # unoccupied -> OOB, dropped
    idx_flat = (
        jnp.full((N,), RS, jnp.int32)
        .at[src]
        .set(jnp.arange(RS, dtype=jnp.int32), mode="drop")
    )
    idx_safe = jnp.minimum(idx_flat, RS - 1)  # clamp for gathers
    return idx_flat, idx_safe, idx_safe // S


def _scatter_payload(idx_flat, parts, RS: int):
    """ONE packed scatter-back of per-flat-sample channels to dense [RS, C],
    with a leading coverage channel (1 where a flat slot landed): overflow-
    dropped samples must read as EMPTY (sigma = blending = 0), not as
    feature2density(0) — which is nonzero for softplus-class activations."""
    cols = [jnp.ones((idx_flat.shape[0], 1), jnp.float32)]
    for p in parts:
        cols.append((p[:, None] if p.ndim == 1 else p).astype(jnp.float32))
    payload = jnp.concatenate(cols, axis=-1)
    dense = (
        jnp.zeros((RS, payload.shape[-1]), payload.dtype)
        .at[idx_flat]
        .set(payload, mode="drop")
    )
    return dense[:, 0] > 0, dense[:, 1:]


def _shade_compacted(shading_params, cfg: FieldConfig, weight, idx_keep, pts, vd_rays, app_fn, ts):
    """Appearance gather + shading MLP on the per-ray top-K bucket only.

    pts: [R, S, C3] coordinate channels to compact (sample positions, plus
    warped positions first for the dynamic field — the leading 3 channels
    feed the appearance gather). Returns dense rgb [R, S, 3] with zeros off
    the bucket (reference app_mask semantics, tensorBase.py:774-804).
    """
    R, S = weight.shape
    idx, keep = idx_keep
    K = idx.shape[1]
    pts_k = compact_rows(pts, idx)  # [R, K, C3]
    gather_k = pts_k[..., :3].reshape(-1, 3)
    pos_k = pts_k[..., -3:].reshape(-1, 3)
    app_feats = app_fn(gather_k)
    vd = jnp.broadcast_to(vd_rays[:, None, :], (R, K, 3)).reshape(-1, 3)
    t_in = jnp.broadcast_to(ts[:, None], (R, K)).reshape(-1, 1)
    rgb_k = apply_shading(
        shading_params, cfg.shading_mode, cfg.view_pe, cfg.fea_pe, cfg.pos_pe,
        pos_k, vd, app_feats, t_in,
    ).reshape(R, K, 3)
    rgb_k = rgb_k * keep[..., None]
    return expand_rows(rgb_k, idx, S)


def eval_static_field(
    params,
    cfg: FieldConfig,
    aabb,
    rays: jnp.ndarray,
    ts: jnp.ndarray,
    xyz: jnp.ndarray,
    z_vals: jnp.ndarray,
    ray_valid: jnp.ndarray,
    ray_type: str = "ndc",
    packed=None,
    dists=None,
    flat_n: int = 0,
) -> FieldEval:
    """Static field forward over [R, S] samples.

    packed: optional prebuilt gather tables (stat.pack_tables) — hoist table
    construction out of per-pass / per-chunk code.
    dists: optional precomputed per-sample dists (UNscaled, i.e. the
    _dists_and_viewdirs output) — the compacted eval renderer passes the
    dense-space consecutive-z dists, which cannot be recovered from the
    compacted z_vals (render/renderer.py).
    flat_n: > 0 routes the per-sample work (feature gathers + shading MLP)
    through a flat [flat_n] bucket of only the ray_valid samples, scattered
    back dense — the train step's flat compaction (StepStatics.compact_flat;
    exact vs this dense-masked path whenever the batch's occupied count
    fits, tests/test_compact_train.py)."""
    R, S, _ = xyz.shape
    dense_dists, viewdirs = _dists_and_viewdirs(rays, z_vals, ray_type)
    if dists is None:
        dists = dense_dists

    xyz_n = dyn.normalize_coord(xyz, aabb)

    if packed is None:
        packed = stat.pack_tables(params, cfg)

    if flat_n > 0:
        RS = R * S
        idx_flat, idx_safe, rid = _flat_index(ray_valid, flat_n)
        pts_f = xyz_n.reshape(RS, 3).at[idx_safe].get(mode="promise_in_bounds")
        sigma_feat_f, app_f = stat.all_features_fused(params, cfg, pts_f, packed=packed)
        sigma_f = feature2density(sigma_feat_f, cfg)
        vd_f = viewdirs.at[rid].get(mode="promise_in_bounds")
        t_f = ts.at[rid].get(mode="promise_in_bounds")
        rgb_f = apply_shading(
            params["shading"], cfg.shading_mode, cfg.view_pe, cfg.fea_pe, cfg.pos_pe,
            pts_f, vd_f, app_f, t_f[:, None],
        )
        covered, dense = _scatter_payload(idx_flat, (sigma_f, rgb_f), RS)
        sigma = jnp.where(ray_valid & covered.reshape(R, S), dense[:, 0].reshape(R, S), 0.0)
        _, weight, _ = raw2alpha(sigma, dists * cfg.distance_scale)
        rgb = jnp.where(
            (weight > cfg.ray_march_weight_thres)[..., None],
            dense[:, 1:4].reshape(R, S, 3), 0.0,
        )
        return FieldEval(
            blending=None, pts_ref=xyz, weights=weight, xyz_prime=None,
            rgb=rgb, sigma=sigma, z_vals=z_vals, dists=dists * cfg.distance_scale,
        )

    flat = xyz_n.reshape(-1, 3)
    K = cfg.app_topk(S)
    compacted = isinstance(packed, dict) and 0 < K < S

    if compacted:
        sigma_feat = stat.density_fused(params, cfg, flat, packed).reshape(R, S)
    else:
        # fused mega-take: density + appearance in one gather (ops/fused_vm.py)
        sigma_feat, app_feats = stat.all_features_fused(params, cfg, flat, packed=packed)
        sigma_feat = sigma_feat.reshape(R, S)
    sigma = jnp.where(ray_valid, feature2density(sigma_feat, cfg), 0.0)

    _, weight, _ = raw2alpha(sigma, dists * cfg.distance_scale)

    if compacted:
        idx_keep = topk_select(weight, K, cfg.ray_march_weight_thres)
        rgb = _shade_compacted(
            params["shading"], cfg, weight, idx_keep, xyz_n, viewdirs,
            lambda pts: stat.app_fused(params, cfg, pts, packed), ts,
        )
    else:
        app_mask = weight > cfg.ray_march_weight_thres
        vd = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(-1, 3)
        t_in = jnp.broadcast_to(ts[:, None], (R, S)).reshape(-1, 1)
        rgb_raw = apply_shading(
            params["shading"], cfg.shading_mode, cfg.view_pe, cfg.fea_pe, cfg.pos_pe,
            flat, vd, app_feats, t_in,
        ).reshape(R, S, 3)
        rgb = jnp.where(app_mask[..., None], rgb_raw, 0.0)

    return FieldEval(
        blending=None,
        pts_ref=xyz,
        weights=weight,
        xyz_prime=None,
        rgb=rgb,
        sigma=sigma,
        z_vals=z_vals,
        dists=dists * cfg.distance_scale,
    )


def eval_dynamic_field(
    params,
    cfg: FieldConfig,
    aabb,
    rays: jnp.ndarray,
    ts: jnp.ndarray,
    xyz: jnp.ndarray,
    z_vals: jnp.ndarray,
    ray_valid: jnp.ndarray,
    ray_type: str = "ndc",
    packed=None,
    dists=None,
    flat_n: int = 0,
) -> FieldEval:
    """Dynamic field forward over [R, S] samples.

    The deformation warp is evaluated once and shared across the density,
    appearance, blending, and visualization paths (the reference re-runs it
    four times with identical inputs — see fields/dynamic.py docstring).

    dists: optional precomputed UNscaled dists (see eval_static_field).
    flat_n: flat-bucket compaction of the per-sample work (warp + gathers +
    shading), see eval_static_field. xyz_prime is zero off the kept set (no
    train-loss consumer; the dense path's values there are weight-masked by
    every consumer anyway).
    """
    R, S, _ = xyz.shape
    dense_dists, viewdirs = _dists_and_viewdirs(rays, z_vals, ray_type)
    if dists is None:
        dists = dense_dists

    if flat_n > 0:
        if packed is None:
            packed = dyn.pack_tables(params, cfg)
        RS = R * S
        idx_flat, idx_safe, rid = _flat_index(ray_valid, flat_n)
        xyz_f = xyz.reshape(RS, 3).at[idx_safe].get(mode="promise_in_bounds")
        t_f = ts.at[rid].get(mode="promise_in_bounds")
        xyz_prime_f = dyn.warp_coordinate(params, xyz_f, t_f, aabb)
        xyz_n_f = dyn.normalize_coord(xyz_f, aabb)
        xyz_prime_n_f = dyn.normalize_coord(xyz_prime_f, aabb)
        sigma_feat_f, blend_feat_f, app_f = dyn.all_features_fused(
            params, cfg, xyz_n_f, t_f, xyz_prime_n_f, packed=packed
        )
        sigma_f = feature2density(sigma_feat_f, cfg)
        blend_f = jax.nn.sigmoid(blend_feat_f)
        vd_f = viewdirs.at[rid].get(mode="promise_in_bounds")
        rgb_f = apply_shading(
            params["shading"], cfg.shading_mode, cfg.view_pe, cfg.fea_pe, cfg.pos_pe,
            xyz_n_f, vd_f, app_f, t_f[:, None],
        )
        covered, dense = _scatter_payload(
            idx_flat, (sigma_f, blend_f, rgb_f, xyz_prime_f), RS
        )
        live = ray_valid & covered.reshape(R, S)
        sigma = jnp.where(live, dense[:, 0].reshape(R, S), 0.0)
        blending = jnp.where(live, dense[:, 1].reshape(R, S), 0.0)
        _, weight, _ = raw2alpha(sigma, dists * cfg.distance_scale)
        rgb = jnp.where(
            (weight > cfg.ray_march_weight_thres)[..., None],
            dense[:, 2:5].reshape(R, S, 3), 0.0,
        )
        return FieldEval(
            blending=blending, pts_ref=xyz, weights=weight,
            xyz_prime=dense[:, 5:8].reshape(R, S, 3),
            rgb=rgb, sigma=sigma, z_vals=z_vals, dists=dists * cfg.distance_scale,
        )

    xyz_flat = xyz.reshape(-1, 3)
    xyz_n = dyn.normalize_coord(xyz, aabb)
    flat_n = xyz_n.reshape(-1, 3)
    t_flat = jnp.broadcast_to(ts[:, None], (R, S)).reshape(-1)

    xyz_prime = dyn.warp_coordinate(params, xyz_flat, t_flat, aabb)
    xyz_prime_n = dyn.normalize_coord(xyz_prime, aabb)

    if packed is None:
        packed = dyn.pack_tables(params, cfg)
    K = cfg.app_topk(S)
    compacted = isinstance(packed, dict) and 0 < K < S

    if compacted:
        sigma_feat, blend_feat = dyn.density_blend_fused(
            params, cfg, flat_n, t_flat, xyz_prime_n, packed
        )
    else:
        # fused mega-take: density + blending + appearance share one gather
        # (ops/fused_vm.py; 12x fewer gathered rows than per-grid sampling)
        sigma_feat, blend_feat, app_feats = dyn.all_features_fused(
            params, cfg, flat_n, t_flat, xyz_prime_n, packed=packed
        )
    sigma_feat = sigma_feat.reshape(R, S)
    sigma = jnp.where(ray_valid, feature2density(sigma_feat, cfg), 0.0)

    _, weight, _ = raw2alpha(sigma, dists * cfg.distance_scale)

    if compacted:
        idx_keep = topk_select(weight, K, cfg.ray_march_weight_thres)
        # leading 3 channels: warped coords (appearance gather position);
        # trailing 3: unwarped normalized coords (shading MLP pts input)
        pts6 = jnp.concatenate([xyz_prime_n.reshape(R, S, 3), xyz_n], axis=-1)
        rgb = _shade_compacted(
            params["shading"], cfg, weight, idx_keep, pts6, viewdirs,
            lambda pts: dyn.app_fused(params, cfg, pts, packed), ts,
        )
    else:
        app_mask = weight > cfg.ray_march_weight_thres
        vd = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(-1, 3)
        rgb_raw = apply_shading(
            params["shading"], cfg.shading_mode, cfg.view_pe, cfg.fea_pe, cfg.pos_pe,
            flat_n, vd, app_feats, t_flat[:, None],
        ).reshape(R, S, 3)
        rgb = jnp.where(app_mask[..., None], rgb_raw, 0.0)

    blending = jnp.where(ray_valid, jax.nn.sigmoid(blend_feat.reshape(R, S)), 0.0)

    return FieldEval(
        blending=blending,
        pts_ref=xyz,
        weights=weight,
        xyz_prime=xyz_prime.reshape(R, S, 3),
        rgb=rgb,
        sigma=sigma,
        z_vals=z_vals,
        dists=dists * cfg.distance_scale,
    )
