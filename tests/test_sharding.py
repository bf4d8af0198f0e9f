"""Distributed tests: the train step under an 8-device data mesh.

SURVEY.md §4 "Distributed tests": N-device pjit must produce the same loss
as single-device execution (within tolerance) and actually partition the
batch. Runs on the virtual CPU mesh from conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.integration

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
    import dataclasses

    from rodynrf_tpu.train.step import make_train_step

    statics = tr._statics()
    step_1dev = make_train_step(dataclasses.replace(statics, mesh=None), donate=False)
    step_8dev = make_train_step(statics, donate=False)

    # single device (no mesh, no constraints)
    _, _, m1 = step_1dev(
        tr.params, tr.opt_state, tr.aabb, tr.data, ray_idx, ray_idx_rand, key, sc
    )
    loss1 = float(m1["total_loss"])

    # 8-device data mesh with asserted batch partitioning
    mesh = statics.mesh if statics.mesh is not None else make_mesh(8)
    params, opt_state, aabb, data = shard_train_inputs(
        mesh, tr.params, tr.opt_state, tr.aabb, tr.data
    )
    idx_sharded = shard_batch_indices(mesh, ray_idx)
    idx_rand_sharded = shard_batch_indices(mesh, ray_idx_rand)
    with mesh:
        new_params, _, m8 = step_8dev(
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


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_batch_partitioning_asserted_in_hlo():
    """The compiled step must CONTAIN the with_sharding_constraint on the ray
    batch (VERDICT r1 item 7: assert partitioning, don't infer it)."""
    tr = tiny_trainer("ndc", 1)
    assert tr.mesh is not None, "trainer should build a mesh on the 8-device env"

    ray_idx = shard_batch_indices(tr.mesh, jnp.asarray(tr.sampler.nextids()))
    ray_idx_rand = shard_batch_indices(tr.mesh, jnp.asarray(tr.sampler2.nextids()))
    sc = {
        "iteration": jnp.asarray(0, jnp.int32),
        "focal_fixed": jnp.asarray(tr.focal_fixed, jnp.float32),
        "lr_spatial": jnp.asarray(0.02, jnp.float32),
        "lr_network": jnp.asarray(1e-3, jnp.float32),
        "lr_pose": jnp.asarray(3e-3, jnp.float32),
        "lr_focal": jnp.asarray(0.0, jnp.float32),
    }
    from rodynrf_tpu.train.step import make_train_step

    step_fn = make_train_step(tr._statics(), donate=False)
    hlo = step_fn.lower(
        tr.params, tr.opt_state, tr.aabb, tr.data, ray_idx, ray_idx_rand,
        jax.random.PRNGKey(0), sc,
    ).as_text()
    # with_sharding_constraint lowers to an explicit annotation over the
    # 8-way data axis — Shardy (`sdy.sharding_constraint` over @mesh) on this
    # toolchain, `mhlo.sharding devices=[8]` on GSPMD — which the partitioner
    # cannot silently drop
    assert (
        "sdy.sharding_constraint" in hlo
        or "devices=[8]" in hlo
        or "Sharding\" (" in hlo
    ), "no 8-way sharding constraint found in lowered step"
    if "sdy.mesh" in hlo:
        assert '"data"=8' in hlo, "mesh in lowered step is not the 8-way data mesh"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_non_divisible_batch_matches_single_device():
    """batch_size 60 on 8 devices must not error: the trainer shards over the
    largest divisor sub-mesh (gcd(60, 8) = 4 devices) and the loss equals the
    unsharded value. (Padding+slicing instead trips an XLA SPMD partitioner
    CHECK in the pose-gradient scatter — uneven tiled intermediates.)"""
    from rodynrf_tpu.testing import tiny_cmd, tiny_scene
    from rodynrf_tpu.train import Trainer, parse_cmd

    args8 = parse_cmd(tiny_cmd("ndc", 1, batch=60))
    tr8 = Trainer(args8, tiny_scene())
    assert tr8.mesh is not None and tr8.mesh.size == 4

    args1 = parse_cmd(tiny_cmd("ndc", 1, batch=60) + " --n_devices 1")
    tr1 = Trainer(args1, tiny_scene())
    assert tr1.mesh is None

    m8 = tr8.run_step()
    m1 = tr1.run_step()
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m8["total_loss"]), rtol=2e-3
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_grid_sharded_matches_replicated_loss():
    """FSDP-lite (SURVEY §5.8): plane grids + Adam moments sharded along H
    over the mesh must produce the same loss and finite sharded updates."""
    import dataclasses

    from rodynrf_tpu.train.step import make_train_step

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
    statics = tr._statics()
    mesh = statics.mesh if statics.mesh is not None else make_mesh(8)
    step = make_train_step(statics, donate=False)

    params_rep, opt_rep, aabb, data = shard_train_inputs(
        mesh, tr.params, tr.opt_state, tr.aabb, tr.data
    )
    params_sh, opt_sh, _, _ = shard_train_inputs(
        mesh, tr.params, tr.opt_state, tr.aabb, tr.data, shard_grids=True
    )
    # the grids really are sharded at rest
    p0 = params_sh["dynamic"]["density_plane"][0]
    assert not p0.sharding.is_fully_replicated
    idx = shard_batch_indices(mesh, ray_idx)
    idx_r = shard_batch_indices(mesh, ray_idx_rand)
    with mesh:
        _, _, m_rep = step(params_rep, opt_rep, aabb, data, idx, idx_r, key, sc)
        new_params, new_opt, m_sh = step(params_sh, opt_sh, aabb, data, idx, idx_r, key, sc)
    np.testing.assert_allclose(
        float(m_rep["total_loss"]), float(m_sh["total_loss"]), rtol=2e-3
    )
    for leaf in jax.tree_util.tree_leaves(new_params):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("shard_grids", [False, True])
def test_grad_accum_under_mesh(shard_grids):
    """lax.scan micro-batching × the 8-device data mesh (VERDICT r3 item 8):
    scan-over-sharded-batch is where GSPMD surprises live. grad_accum=2 under
    the mesh must track grad_accum=1 under the mesh to the same tolerance the
    single-device accumulation test uses (batch-statistic terms shift at
    micro sample size), with finite sharded updates — including FSDP-lite
    (shard_grids=True)."""
    import dataclasses

    from rodynrf_tpu.train.step import make_train_step

    tr = tiny_trainer("ndc", 1)
    ray_idx = jnp.asarray(tr.sampler.nextids())
    ray_idx_rand = jnp.asarray(tr.sampler2.nextids())
    key = jax.random.PRNGKey(29)
    sc = {
        "iteration": jnp.asarray(0, jnp.int32),
        "focal_fixed": jnp.asarray(tr.focal_fixed, jnp.float32),
        "lr_spatial": jnp.asarray(0.02, jnp.float32),
        "lr_network": jnp.asarray(1e-3, jnp.float32),
        "lr_pose": jnp.asarray(3e-3, jnp.float32),
        "lr_focal": jnp.asarray(0.0, jnp.float32),
    }
    statics = dataclasses.replace(tr._statics(), golden_det=True)
    mesh = statics.mesh if statics.mesh is not None else make_mesh(8)
    params, opt_state, aabb, data = shard_train_inputs(
        mesh, tr.params, tr.opt_state, tr.aabb, tr.data, shard_grids=shard_grids
    )
    idx = shard_batch_indices(mesh, ray_idx)
    idx_r = shard_batch_indices(mesh, ray_idx_rand)

    step1 = make_train_step(dataclasses.replace(statics, grad_accum=1), donate=False)
    step2 = make_train_step(dataclasses.replace(statics, grad_accum=2), donate=False)
    with mesh:
        _, _, m1 = step1(params, opt_state, aabb, data, idx, idx_r, key, sc)
        new_params, _, m2 = step2(params, opt_state, aabb, data, idx, idx_r, key, sc)
    np.testing.assert_allclose(
        float(m2["total_loss"]), float(m1["total_loss"]), rtol=5e-3
    )
    for leaf in jax.tree_util.tree_leaves(new_params):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_compacted_multichip_matches_single_chip():
    """Occupancy-compacted step ([R, K] buckets + flat-bucket field evals)
    under the 8-device data mesh equals the single-device compacted step.
    The flat path's index build is a cumsum over the whole [R*S] batch plus
    a global scatter — exactly the kind of op GSPMD must resolve with
    collectives under ray sharding, so it needs explicit mesh coverage."""
    import dataclasses

    from rodynrf_tpu.train.step import make_train_step

    tr = tiny_trainer("ndc", 1)
    ray_idx = jnp.asarray(tr.sampler.nextids())
    ray_idx_rand = jnp.asarray(tr.sampler2.nextids())
    key = jax.random.PRNGKey(41)
    sc = {
        "iteration": jnp.asarray(5, jnp.int32),
        "focal_fixed": jnp.asarray(tr.focal_fixed, jnp.float32),
        "lr_spatial": jnp.asarray(0.02, jnp.float32),
        "lr_network": jnp.asarray(1e-3, jnp.float32),
        "lr_pose": jnp.asarray(3e-3, jnp.float32),
        "lr_focal": jnp.asarray(0.0, jnp.float32),
    }

    rng = np.random.default_rng(7)
    T = tr.args.N_voxel_t
    vol = rng.integers(0, 2, (8, 8, 8, T)).astype(np.uint8)
    vol[:2] = 0
    data = dict(tr.data)
    data["alpha_volume"] = jnp.asarray(vol, jnp.uint8)
    data["alpha_aabb"] = jnp.asarray(tr.aabb)

    K = max(2, tr.n_samples - 2)
    statics = dataclasses.replace(
        tr._statics(), use_alpha_mask=True, compact_k=K,
        compact_flat=tr.n_samples,
    )
    step_1dev = make_train_step(
        dataclasses.replace(statics, mesh=None), donate=False
    )
    _, _, m1 = step_1dev(
        tr.params, tr.opt_state, tr.aabb, data, ray_idx, ray_idx_rand, key, sc
    )

    mesh = statics.mesh if statics.mesh is not None else make_mesh(8)
    step_8dev = make_train_step(
        dataclasses.replace(statics, mesh=mesh), donate=False
    )
    params, opt_state, aabb, data_s = shard_train_inputs(
        mesh, tr.params, tr.opt_state, tr.aabb, data
    )
    idx = shard_batch_indices(mesh, ray_idx)
    idx_r = shard_batch_indices(mesh, ray_idx_rand)
    with mesh:
        new_params, _, m8 = step_8dev(
            params, opt_state, aabb, data_s, idx, idx_r, key, sc
        )

    loss1, loss8 = float(m1["total_loss"]), float(m8["total_loss"])
    assert np.isfinite(loss1) and np.isfinite(loss8)
    np.testing.assert_allclose(loss1, loss8, rtol=2e-3)
    for leaf in jax.tree_util.tree_leaves(new_params):
        assert np.all(np.isfinite(np.asarray(leaf)))
