"""Distributed tests: the train step under an 8-device data mesh.

SURVEY.md §4 "Distributed tests": N-device pjit must produce the same loss
as single-device execution (within tolerance) and actually partition the
batch. Runs on the virtual CPU mesh from conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodynrf_tpu.parallel import (
    make_mesh,
    shard_batch_indices,
    shard_train_inputs,
)
from rodynrf_tpu.testing import tiny_trainer


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_multichip_matches_single_chip_loss():
    tr = tiny_trainer("ndc", 1)
    ray_idx = jnp.asarray(tr.sampler.nextids())
    ray_idx_rand = jnp.asarray(tr.sampler2.nextids())
    key = jax.random.PRNGKey(123)
    sc = {
        "iteration": jnp.asarray(0, jnp.int32),
        "focal_fixed": jnp.asarray(tr.focal_fixed, jnp.float32),
        "lr_spatial": jnp.asarray(0.02, jnp.float32),
        "lr_network": jnp.asarray(1e-3, jnp.float32),
        "lr_pose": jnp.asarray(3e-3, jnp.float32),
        "lr_focal": jnp.asarray(0.0, jnp.float32),
    }

    # non-donating step so params can be fed to both executions
    from rodynrf_tpu.train.step import make_train_step

    step_fn = make_train_step(tr._statics(), donate=False)

    # single device
    _, _, m1 = step_fn(
        tr.params, tr.opt_state, tr.aabb, tr.data, ray_idx, ray_idx_rand, key, sc
    )
    loss1 = float(m1["total_loss"])

    # 8-device data mesh
    mesh = make_mesh(8)
    params, opt_state, aabb, data = shard_train_inputs(
        mesh, tr.params, tr.opt_state, tr.aabb, tr.data
    )
    idx_sharded = shard_batch_indices(mesh, ray_idx)
    idx_rand_sharded = shard_batch_indices(mesh, ray_idx_rand)
    with mesh:
        new_params, _, m8 = step_fn(
            params, opt_state, aabb, data, idx_sharded, idx_rand_sharded, key, sc
        )
    loss8 = float(m8["total_loss"])

    assert np.isfinite(loss1) and np.isfinite(loss8)
    np.testing.assert_allclose(loss1, loss8, rtol=2e-3)
    # updated params finite
    for leaf in jax.tree_util.tree_leaves(new_params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_graft_entry_compiles():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, ex = mod.entry()
    out = jax.jit(fn)(*ex)
    assert out.shape[-1] == 3
    assert np.all(np.isfinite(np.asarray(out)))
