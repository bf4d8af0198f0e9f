"""Integration: full multi-pass train step on the synthetic fixture.

Covers the reference's end-to-end vertical (config -> data -> fields ->
render -> losses -> optimizer -> upsample), SURVEY.md §7 milestone 1.
Shapes come from rodynrf_tpu.testing so compiles are shared with the
driver entry points via the persistent cache.
"""

import numpy as np
import jax
import pytest

from rodynrf_tpu.testing import tiny_trainer

pytestmark = pytest.mark.integration


def _leaf_diff(a, b):
    return max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


@pytest.mark.parametrize("ray_type,optim", [("ndc", 1), ("contract", 1)])
def test_train_step_runs_and_updates(ray_type, optim):
    tr = tiny_trainer(ray_type, optim)
    params_before = jax.tree_util.tree_map(np.asarray, tr.params)
    m = tr.run_step()
    assert np.isfinite(float(m["total_loss"]))
    assert np.isfinite(float(m["psnr"]))
    assert _leaf_diff(params_before["dynamic"], tr.params["dynamic"]) > 0
    assert _leaf_diff(params_before["static"], tr.params["static"]) > 0
    # pose lr is live from iteration 0; focal stays frozen until upsamp3
    assert _leaf_diff(params_before["pose"], tr.params["pose"]) > 0
    assert _leaf_diff(params_before["fov"], tr.params["fov"]) == 0


def test_train_no_pose_optim_keeps_pose_fixed():
    tr = tiny_trainer("ndc", 0)
    params_before = jax.tree_util.tree_map(np.asarray, tr.params)
    m = tr.run_step()
    assert np.isfinite(float(m["total_loss"]))
    assert _leaf_diff(params_before["pose"], tr.params["pose"]) == 0


def test_upsample_crossing_keeps_training():
    tr = tiny_trainer("ndc", 1)
    g0 = tr.static_cfg.grid_size
    mses = []
    for _ in range(10):  # crosses the upsample at iteration 8
        m = tr.run_step()
        mses.append(float(m["mse"]))
    assert tr.static_cfg.grid_size != g0
    assert np.isfinite(mses).all()
    assert tr.schedule.lr_pose > 0


def test_total_loss_decreases_fixed_poses():
    # with cameras fixed the objective settles quickly even on tiny shapes
    tr = tiny_trainer("ndc", 0)
    losses = []
    for _ in range(14):
        m = tr.run_step()
        losses.append(float(m["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
