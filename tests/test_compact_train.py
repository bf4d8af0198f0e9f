"""Train-time occupancy compaction parity (train/step.py use_alpha_mask /
compact_k; VERDICT r4 item 3).

Contract: with an occupancy mask, the train step may treat sub-threshold
samples as empty (the reference's own early-out semantics when its mask
exists, tensorBase.py:745-765) and compact each pass's samples into a
per-ray [R, K] bucket. The compacted step must equal the DENSE-MASKED step
(same mask, no compaction) in every loss, metric, and gradient whenever
every ray's occupied count <= K — masked samples carry sigma = blending =
rgb = 0 through the compositor, the same argument as the eval compactor
(tests/test_render_compact.py). An all-ones mask must reproduce the plain
dense step exactly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodynrf_tpu.testing import tiny_trainer
from rodynrf_tpu.train.step import train_loss

RNG = np.random.default_rng(3)


def _mask_data(trainer, volume):
    data = dict(trainer.data)
    data["alpha_volume"] = jnp.asarray(volume, jnp.uint8)
    data["alpha_aabb"] = jnp.asarray(trainer.aabb)
    return data


def _run(trainer, data, use_mask, K, key, ray_idx, ray_idx_rand, it=5, flat=0):
    S = dataclasses.replace(
        trainer._statics(), use_alpha_mask=use_mask, compact_k=K, compact_flat=flat
    )
    sc = {
        "iteration": jnp.asarray(it, jnp.int32),
        "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
    }
    sc.update(
        {k: jnp.asarray(v, jnp.float32) for k, v in trainer.schedule.scalars(it).items()}
    )

    def lf(p):
        return train_loss(p, S, trainer.aabb, data, ray_idx, ray_idx_rand, key, sc)

    (loss, metrics), grads = jax.jit(jax.value_and_grad(lf, has_aux=True))(
        trainer.params
    )
    return loss, metrics, grads


def _assert_close(res_a, res_b, rtol=2e-5, grad_atol=5e-4):
    loss_a, met_a, g_a = res_a
    loss_b, met_b, g_b = res_b
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=rtol)
    for k in met_b:
        np.testing.assert_allclose(
            np.asarray(met_a[k]), np.asarray(met_b[k]), rtol=5e-4, atol=1e-6,
            err_msg=f"metric {k}",
        )
    flat_b = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_b)
    )
    for path, v in jax.tree_util.tree_leaves_with_path(g_a):
        ks = jax.tree_util.keystr(path)
        r = flat_b[ks]
        scale = max(float(jnp.abs(r).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(v) / scale, np.asarray(r) / scale, atol=grad_atol,
            err_msg=f"grad {ks}",
        )


def test_nearest_occupancy_superset():
    """occupancy_nearest on the PRE-DILATED volume keeps every sample the
    reference's trilinear>0 test on the ORIGINAL volume keeps (the train
    step's soundness contract, fields/alpha_mask.dilate_occupancy)."""
    from rodynrf_tpu.fields.alpha_mask import (
        AlphaGridMask,
        dilate_occupancy,
        occupancy_nearest,
    )

    D, H, W, T = 9, 7, 11, 5
    vol = jnp.asarray(RNG.integers(0, 2, (D, H, W, T)), jnp.uint8)
    aabb = jnp.asarray([[-1.2, -0.8, -1.0], [1.1, 0.9, 1.3]], jnp.float32)
    xyz = jnp.asarray(RNG.uniform(-1.4, 1.4, (2000, 3)), jnp.float32)
    t = jnp.asarray(RNG.uniform(-1, 1, (2000,)), jnp.float32)

    tri = np.asarray(AlphaGridMask(aabb=aabb, alpha_volume=vol).sample_alpha(xyz, t)) > 0
    near = np.asarray(occupancy_nearest(dilate_occupancy(vol), aabb, xyz, t))
    assert not np.any(tri & ~near), "nearest test dropped a trilinear-kept sample"
    # and the dilation is bounded: an empty volume keeps nothing
    zeros = jnp.zeros_like(vol)
    near0 = np.asarray(occupancy_nearest(dilate_occupancy(zeros), aabb, xyz, t))
    assert not near0.any()


@pytest.mark.integration
def test_ones_mask_matches_dense():
    """An all-occupied mask leaves ray_valid unchanged: dense-masked (K=0)
    must reproduce the plain dense step."""
    trainer = tiny_trainer("ndc", 1)
    key = jax.random.PRNGKey(7)
    ri = jnp.asarray(trainer.sampler.nextids())
    rr = jnp.asarray(trainer.sampler2.nextids())
    data = _mask_data(trainer, np.ones((6, 6, 6, trainer.args.N_voxel_t), np.uint8))

    dense = _run(trainer, trainer.data, False, 0, key, ri, rr)
    masked = _run(trainer, data, True, 0, key, ri, rr)
    _assert_close(masked, dense, rtol=1e-6, grad_atol=1e-5)


def _occupancy_counts(trainer, data, ray_idx, ts_idx):
    """Max per-ray occupied count over the pass-A geometry (the widest union
    is A|B; take both time sets to bound every pass)."""
    from rodynrf_tpu.core.se3 import pose_to_mtx
    from rodynrf_tpu.fields.alpha_mask import occupancy_nearest
    from rodynrf_tpu.render.sampling import sample_xyz
    from rodynrf_tpu.train.step import _rays_from_idx, focal_from_fov

    S = trainer._statics()
    focal = focal_from_fov(trainer.params["fov"][0, 0], S.H, S.W)
    rays, _, _, _ = _rays_from_idx(
        ray_idx, pose_to_mtx(trainer.params["pose"]), focal, S
    )
    xyz, _, valid = sample_xyz(
        rays, trainer.n_samples, S.ray_type, S.static_cfg.near_far,
        trainer.aabb, S.step_size, None,
    )
    R, S_ = valid.shape
    occ = np.zeros((R, S_), bool)
    for ts in ts_idx:
        t_flat = jnp.broadcast_to(ts[:, None], (R, S_)).reshape(-1)
        o = occupancy_nearest(
            data["alpha_volume"], data["alpha_aabb"], xyz.reshape(-1, 3), t_flat
        ).reshape(R, S_)
        occ |= np.asarray(valid & o)
    return int(occ.sum(1).max())


@pytest.mark.integration
def test_compacted_matches_dense_masked():
    """Structured ~half-empty mask; K >= max per-ray occupancy: the
    compacted step equals the dense-masked step in losses and gradients."""
    from rodynrf_tpu.testing import tiny_cmd, tiny_scene
    from rodynrf_tpu.train import Trainer, parse_cmd

    # 32^3 grid -> 16 samples/ray (the tiny 8^3 default yields only 6,
    # leaving no headroom between max occupancy and the dense count)
    args = parse_cmd(
        tiny_cmd("ndc", 1) + " --N_voxel_init 32768 --N_voxel_final 32768"
    )
    trainer = Trainer(args, tiny_scene("ndc"))
    key = jax.random.PRNGKey(13)
    ri = jnp.asarray(trainer.sampler.nextids())
    rr = jnp.asarray(trainer.sampler2.nextids())

    T = trainer.args.N_voxel_t
    vol = RNG.integers(0, 2, (8, 8, 8, T)).astype(np.uint8)
    vol[:3] = 0  # empty near-z slab: every ray loses its first samples
    data = _mask_data(trainer, vol)

    ts_train = trainer.data["ts"][ri]
    ts_rand = trainer.data["ts"][rr]
    max_occ = _occupancy_counts(trainer, data, ri, [ts_train, ts_rand])
    # jitter differs between this probe (key=None) and the step's draws;
    # +2 covers the one-bin shift
    K = min(trainer.n_samples, max_occ + 2)
    assert K < trainer.n_samples, "mask too dense for a meaningful test"

    masked = _run(trainer, data, True, 0, key, ri, rr)
    compact = _run(trainer, data, True, K, key, ri, rr)
    _assert_close(compact, masked)


@pytest.mark.integration
def test_compacted_sequential_matches_batched():
    """fused_passes on/off parity holds under compaction too (the samp
    4-tuples thread dists through both execution paths)."""
    trainer = tiny_trainer("ndc", 1)
    key = jax.random.PRNGKey(17)
    ri = jnp.asarray(trainer.sampler.nextids())
    rr = jnp.asarray(trainer.sampler2.nextids())
    vol = RNG.integers(0, 2, (8, 8, 8, trainer.args.N_voxel_t)).astype(np.uint8)
    vol[:3] = 0
    data = _mask_data(trainer, vol)
    # compaction happens in train_loss BEFORE the fused/sequential paths
    # diverge, so parity holds at any K (even truncating)
    K = max(2, trainer.n_samples - 2)

    def run(fused):
        S = dataclasses.replace(
            trainer._statics(), use_alpha_mask=True, compact_k=K, fused_passes=fused
        )
        sc = {
            "iteration": jnp.asarray(5, jnp.int32),
            "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
        }
        sc.update({
            k: jnp.asarray(v, jnp.float32)
            for k, v in trainer.schedule.scalars(5).items()
        })
        (loss, metrics), grads = jax.jit(
            jax.value_and_grad(
                lambda p: train_loss(p, S, trainer.aabb, data, ri, rr, key, sc),
                has_aux=True,
            )
        )(trainer.params)
        return loss, metrics, grads

    _assert_close(run(True), run(False), rtol=2e-5)


@pytest.mark.integration
def test_flat_matches_bucket():
    """Flat-bucket field evals (compact_flat, render/pipeline.py flat_n)
    equal the [R, K] bucket step in every loss and gradient whenever the
    flat budget holds every occupied sample (here: flat = n_samples, an
    upper bound on any per-ray count)."""
    from rodynrf_tpu.testing import tiny_cmd, tiny_scene
    from rodynrf_tpu.train import Trainer, parse_cmd

    args = parse_cmd(
        tiny_cmd("ndc", 1) + " --N_voxel_init 32768 --N_voxel_final 32768"
    )
    trainer = Trainer(args, tiny_scene("ndc"))
    key = jax.random.PRNGKey(13)
    ri = jnp.asarray(trainer.sampler.nextids())
    rr = jnp.asarray(trainer.sampler2.nextids())

    T = trainer.args.N_voxel_t
    vol = RNG.integers(0, 2, (8, 8, 8, T)).astype(np.uint8)
    vol[:3] = 0
    data = _mask_data(trainer, vol)

    ts_train = trainer.data["ts"][ri]
    ts_rand = trainer.data["ts"][rr]
    max_occ = _occupancy_counts(trainer, data, ri, [ts_train, ts_rand])
    K = min(trainer.n_samples, max_occ + 2)

    bucket = _run(trainer, data, True, K, key, ri, rr)
    flat = _run(trainer, data, True, K, key, ri, rr, flat=trainer.n_samples)
    _assert_close(flat, bucket, rtol=2e-6, grad_atol=5e-5)


@pytest.mark.integration
def test_flat_overflow_drops_to_empty():
    """An undersized flat budget must degrade gracefully: overflow samples
    read as EMPTY (sigma = blending = rgb = 0), never as garbage — loss and
    gradients stay finite."""
    trainer = tiny_trainer("ndc", 1)
    key = jax.random.PRNGKey(19)
    ri = jnp.asarray(trainer.sampler.nextids())
    rr = jnp.asarray(trainer.sampler2.nextids())
    vol = np.ones((8, 8, 8, trainer.args.N_voxel_t), np.uint8)
    data = _mask_data(trainer, vol)
    K = max(2, trainer.n_samples - 2)

    loss, metrics, grads = _run(trainer, data, True, K, key, ri, rr, flat=2)
    assert np.isfinite(float(loss))
    for v in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.integration
def test_flat_sequential_matches_batched():
    """fused_passes on/off parity holds for flat-bucket evals too (the
    batched path sizes each group's flat bucket by its concatenated rows)."""
    trainer = tiny_trainer("ndc", 1)
    key = jax.random.PRNGKey(23)
    ri = jnp.asarray(trainer.sampler.nextids())
    rr = jnp.asarray(trainer.sampler2.nextids())
    vol = RNG.integers(0, 2, (8, 8, 8, trainer.args.N_voxel_t)).astype(np.uint8)
    vol[:3] = 0
    data = _mask_data(trainer, vol)
    K = max(2, trainer.n_samples - 2)

    def run(fused):
        S = dataclasses.replace(
            trainer._statics(), use_alpha_mask=True, compact_k=K,
            compact_flat=trainer.n_samples, fused_passes=fused,
        )
        sc = {
            "iteration": jnp.asarray(5, jnp.int32),
            "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
        }
        sc.update({
            k: jnp.asarray(v, jnp.float32)
            for k, v in trainer.schedule.scalars(5).items()
        })
        (loss, metrics), grads = jax.jit(
            jax.value_and_grad(
                lambda p: train_loss(p, S, trainer.aabb, data, ri, rr, key, sc),
                has_aux=True,
            )
        )(trainer.params)
        return loss, metrics, grads

    _assert_close(run(True), run(False), rtol=2e-5)


@pytest.mark.integration
def test_trainer_enables_compaction_end_to_end():
    """--compact_train 1: update_alpha_mask() probes K, wires the mask into
    `data`, rebuilds the step, and the next step runs finite."""
    from rodynrf_tpu.train import Trainer, parse_cmd
    from rodynrf_tpu.testing import tiny_cmd, tiny_scene

    args = parse_cmd(tiny_cmd("ndc", 1) + " --compact_train 1")
    trainer = Trainer(args, tiny_scene("ndc"))
    for _ in range(2):
        trainer.run_step()
    trainer.update_alpha_mask()
    m = trainer.run_step()
    assert np.isfinite(float(m["total_loss"]))
    if trainer.compact_k:
        assert "alpha_volume" in trainer.data
        assert trainer.compact_k <= trainer.n_samples


def test_occupancy_nearest_flat_matches_4d():
    """The production path stores data["alpha_volume"] FLAT (1-D) with dims
    in StepStatics.alpha_shape to avoid a per-step relayout copy of the 4-D
    jit parameter; the flat+shape form must be bit-identical to the 4-D
    form (fields/alpha_mask.occupancy_nearest)."""
    from rodynrf_tpu.fields.alpha_mask import occupancy_nearest

    rng = np.random.default_rng(11)
    D, H, W, T = 6, 5, 7, 3
    vol = jnp.asarray(rng.integers(0, 2, (D, H, W, T)), jnp.uint8)
    aabb = jnp.asarray([[-1.2, -1.0, -0.8], [1.1, 0.9, 1.3]])
    xyz = jnp.asarray(rng.uniform(-1.5, 1.5, (257, 3)), jnp.float32)
    t = jnp.asarray(rng.uniform(-1.2, 1.2, (257,)), jnp.float32)

    a = occupancy_nearest(vol, aabb, xyz, t)
    b = occupancy_nearest(vol.reshape(-1), aabb, xyz, t, shape=(D, H, W, T))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
