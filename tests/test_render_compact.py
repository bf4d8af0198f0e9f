"""Compacted eval renderer: exactness vs the superset-masked dense oracle.

The compact path (render/renderer.py make_chunk_renderer(compact=True))
implements the reference's `xyz[ray_valid]` eval early-out
(tensorBase.py:745-804) as a fixed per-ray [R, K] bucket. Its selector is
the single-gather nearest-voxel test on the pre-dilated occupancy volume —
a strict SUPERSET of the trilinear>0 kept set (every sample it drops, the
reference's early-out drops too; fields/alpha_mask.dilate_occupancy).
Contract pinned here:

  * compact == dense rendered with the SAME superset selector, exactly
    (up to the compositor's +1e-10 cumprod epsilon, ~1e-8 relative), for
    any K >= the max per-ray occupied count;
  * the kept set is a superset of the trilinear>0 kept set (soundness);
  * overflow (K below occupancy) stays finite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rodynrf_tpu.fields.alpha_mask import (
    AlphaGridMask,
    dilate_occupancy,
    occupancy_nearest,
)
from rodynrf_tpu.render.renderer import make_chunk_renderer, rays_for_view
from rodynrf_tpu.testing import TINY, tiny_trainer

pytestmark = pytest.mark.integration


def _setup():
    tr = tiny_trainer("ndc", 0)
    params = {"static": tr.params["static"], "dynamic": tr.params["dynamic"]}
    # alpha volume occupying roughly the z-middle half of the box: every ray
    # keeps some samples, none keeps all
    D = 12
    vol = np.zeros((D, D, D, TINY["T"]), np.float32)
    vol[:, :, D // 4 : (3 * D) // 4, :] = 1.0
    mask = AlphaGridMask(aabb=jnp.asarray(tr.aabb), alpha_volume=jnp.asarray(vol))
    from rodynrf_tpu.core.se3 import pose_to_mtx

    pose = np.asarray(pose_to_mtx(tr.params["pose"]))[0]
    rays = rays_for_view(pose, tr.focal_fixed, TINY["H"], TINY["W"], "ndc")[:128]
    ts = jnp.full((rays.shape[0],), -0.5, jnp.float32)
    step = tr.static_cfg.step_size(np.asarray(tr.scene.scene_bbox))
    return tr, params, mask, rays, ts, step


def _maps_close(a, b, skip=("delta_xyz",)):
    for name in a._fields:
        if name in skip:
            continue
        x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        np.testing.assert_allclose(x, y, rtol=2e-5, atol=2e-6, err_msg=name)


def test_compact_matches_dense_superset():
    tr, params, mask, rays, ts, step = _setup()
    comp = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples, step,
        alpha_mask=mask, compact=True, flat_quantum=2,
    )
    packs = comp.pack(params)
    out_d = comp.dense_superset(params, packs, tr.aabb, rays, ts)
    out_c = comp(params, packs, tr.aabb, rays, ts)
    _maps_close(out_c, out_d)
    assert np.all(np.isfinite(np.asarray(out_c.delta_xyz)))


def test_selector_superset_of_trilinear():
    """Soundness: every sample the nearest-dilated selector drops, the
    reference's trilinear>0 early-out (dense masked path) drops too."""
    tr, params, _, rays, ts, step = _setup()
    # thinner slab than _setup's: at 6 samples/ray the dilated 12^3 middle-
    # half slab covers every sample (superset trivially true); a 2-voxel
    # slab leaves both kept and dropped samples after dilation
    D = 12
    vol = np.zeros((D, D, D, TINY["T"]), np.float32)
    vol[:, :, 5:7, :] = 1.0
    mask = AlphaGridMask(aabb=jnp.asarray(tr.aabb), alpha_volume=jnp.asarray(vol))
    from rodynrf_tpu.render.sampling import sample_xyz

    xyz, z_vals, valid = sample_xyz(
        rays, tr.n_samples, "ndc", tr.static_cfg.near_far, tr.aabb, step, None
    )
    R, S, _ = xyz.shape
    t_flat = jnp.broadcast_to(ts[:, None], (R, S)).reshape(-1)
    tri = mask.sample_alpha(xyz.reshape(-1, 3), t_flat).reshape(R, S) > 0
    near = occupancy_nearest(
        dilate_occupancy(mask.alpha_volume), mask.aabb, xyz.reshape(-1, 3), t_flat
    ).reshape(R, S)
    tri_kept = np.asarray(valid & tri)
    near_kept = np.asarray(valid & near)
    assert np.all(near_kept >= tri_kept)  # superset
    assert tri_kept.sum() > 0 and near_kept.sum() < tri_kept.size  # non-trivial


def test_compact_pinned_k_exact_and_overflow():
    tr, params, mask, rays, ts, step = _setup()
    comp = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples, step,
        alpha_mask=mask, compact=True,
    )
    packs = comp.pack(params)
    out_d = comp.dense_superset(params, packs, tr.aabb, rays, ts)
    # N = R*S: every occupied sample trivially fits — exact vs the oracle
    RS = rays.shape[0] * tr.n_samples
    out_full = comp.flat_fn(RS)(params, packs, tr.aabb, rays, ts)
    _maps_close(out_full, out_d)
    # overflow (N=2 < total occupancy): still finite (extra samples drop
    # to sigma=0; the wrapper never pins N below the probe's count)
    out_n2 = comp.flat_fn(2)(params, packs, tr.aabb, rays, ts)
    for name in out_n2._fields:
        assert np.all(np.isfinite(np.asarray(getattr(out_n2, name)))), name


def test_compact_no_mask_falls_back_dense():
    tr, params, _, rays, ts, step = _setup()
    # compact requested but no alpha mask: wrapper must run the dense path
    comp = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples, step, compact=True
    )
    dense = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples, step
    )
    packs = dense.pack(params)
    out_c = comp(params, packs, tr.aabb, rays, ts)
    out_d = dense(params, packs, tr.aabb, rays, ts)
    _maps_close(out_c, out_d, skip=())
