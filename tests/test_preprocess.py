"""Preprocessing tests: flow consistency, Sampson error, RAFT/DPT shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rodynrf_tpu.preprocess.flow_utils import compute_fwdbwd_mask
from rodynrf_tpu.preprocess.motion_masks import (
    compute_sampson_error,
    get_uv_grid,
    motion_mask_for_frame,
)
from rodynrf_tpu.utils.flow_viz import flow_to_image


def test_fwdbwd_mask_consistent_flow_is_valid():
    H, W = 32, 40
    fwd = np.zeros((H, W, 2), np.float32)
    fwd[..., 0] = 3.0
    bwd = -fwd
    mf, mb = compute_fwdbwd_mask(fwd, bwd)
    # interior pixels consistent
    assert mf[4:-4, 8:-8].all()
    assert mb[4:-4, 8:-8].all()


def test_fwdbwd_mask_inconsistent_flow_rejected():
    H, W = 32, 40
    fwd = np.full((H, W, 2), 5.0, np.float32)
    bwd = np.full((H, W, 2), 5.0, np.float32)  # NOT inverse
    mf, _ = compute_fwdbwd_mask(fwd, bwd)
    assert not mf[8:-8, 8:-8].any()


def test_sampson_error_zero_on_epipolar_points():
    # pure-translation fundamental matrix: F = [e]_x for epipole at x-infinity
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    x1 = np.random.default_rng(0).uniform(-1, 1, (100, 2)).astype(np.float32)
    x2 = x1 + np.array([0.1, 0.0], np.float32)  # horizontal motion only
    err = compute_sampson_error(x1, x2, F)
    np.testing.assert_allclose(err, np.zeros(100), atol=1e-10)
    # vertical motion violates the constraint
    x3 = x1 + np.array([0.0, 0.1], np.float32)
    assert np.all(compute_sampson_error(x1, x3, F) > 1e-6)


def test_motion_mask_pipeline_detects_moving_region():
    H, W = 48, 64
    rng = np.random.default_rng(1)
    # background: uniform translation; foreground box: different motion
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0] = 2.0
    flow += rng.normal(0, 0.01, flow.shape).astype(np.float32)
    flow[16:32, 24:40, 1] += 6.0  # moving object violates epipolar geometry
    from rodynrf_tpu.preprocess.motion_masks import epipolar_error_map

    err = epipolar_error_map(flow, H, W)
    mask = motion_mask_for_frame([err], H, W)
    inside = mask[18:30, 26:38].mean()
    outside = np.concatenate([mask[:12].ravel(), mask[36:].ravel()]).mean()
    assert inside > 0.5
    assert outside < 0.2


def test_flow_to_image_shape_and_range():
    flow = np.random.default_rng(0).normal(0, 3, (20, 30, 2)).astype(np.float32)
    img = flow_to_image(flow)
    assert img.shape == (20, 30, 3) and img.dtype == np.uint8


def test_uv_grid_range():
    uv = get_uv_grid(10, 20)
    assert uv.shape == (10, 20, 2)
    assert -1 < uv.min() < -0.8 and 0.8 < uv.max() < 1


@pytest.mark.slow
def test_raft_forward_shapes():
    from rodynrf_tpu.preprocess.raft import init_raft_params, raft_forward

    params = init_raft_params(jax.random.PRNGKey(0))
    img = jnp.zeros((1, 64, 80, 3))
    flow = raft_forward(params, img, img, iters=2)
    assert flow.shape == (1, 64, 80, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


@pytest.mark.slow
def test_dpt_forward_shapes():
    from rodynrf_tpu.preprocess.dpt import DPTConfig, dpt_forward, init_dpt_params

    cfg = DPTConfig(dim=64, heads=4, blocks=4, hooks=(0, 1, 2, 3),
                    reassemble=(16, 32, 64, 64), features=32)
    params = init_dpt_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 96, 128, 3))
    depth = dpt_forward(params, img, cfg)
    assert depth.shape == (1, 96, 128)
    assert np.all(np.isfinite(np.asarray(depth)))
