"""Compacted eval renderer: parity vs the dense alpha-masked path.

The compact path (render/renderer.py make_chunk_renderer(compact=True))
implements the reference's `xyz[ray_valid]` eval early-out
(tensorBase.py:745-804) as a fixed per-ray [R, K] bucket. When K >= the max
per-ray occupied count the composited maps must match the dense masked path
exactly up to the compositor's +1e-10 cumprod epsilon (~1e-8 relative).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rodynrf_tpu.fields.alpha_mask import AlphaGridMask
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


def test_compact_matches_dense_masked():
    tr, params, mask, rays, ts, step = _setup()
    dense = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples, step, alpha_mask=mask
    )
    comp = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples, step,
        alpha_mask=mask, compact=True, k_quantum=2,
    )
    packs = dense.pack(params)
    out_d = dense(params, packs, tr.aabb, rays, ts)
    out_c = comp(params, packs, tr.aabb, rays, ts)
    _maps_close(out_c, out_d)
    assert np.all(np.isfinite(np.asarray(out_c.delta_xyz)))


def test_compact_pinned_k_exact_and_overflow():
    tr, params, mask, rays, ts, step = _setup()
    dense = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples, step, alpha_mask=mask
    )
    comp = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples, step,
        alpha_mask=mask, compact=True,
    )
    packs = dense.pack(params)
    out_d = dense(params, packs, tr.aabb, rays, ts)
    # K = S is trivially exact (no samples dropped even without a mask)
    out_full = comp.compact_fn(tr.n_samples)(params, packs, tr.aabb, rays, ts)
    _maps_close(out_full, out_d)
    # overflow (K=1 < per-ray occupancy): still finite, near-first-sample
    out_k1 = comp.compact_fn(1)(params, packs, tr.aabb, rays, ts)
    for name in out_k1._fields:
        assert np.all(np.isfinite(np.asarray(getattr(out_k1, name)))), name


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
