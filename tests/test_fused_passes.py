"""Parity: batched multi-pass evaluation == sequential per-pass evaluation.

The fused-pass step (train/step.py _batched_passes) concatenates all render
passes' rays into shared field evaluations. Every op involved is row-wise
independent, so values and gradients must match the sequential path to float
tolerance (the per-pass RNG keys are split identically in both paths).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodynrf_tpu.testing import tiny_trainer
from rodynrf_tpu.train.step import train_loss


def _loss_and_metrics(trainer, fused: bool, key, ray_idx, ray_idx_rand):
    S = dataclasses.replace(trainer._statics(), fused_passes=fused)
    sc = {
        "iteration": jnp.asarray(5, jnp.int32),
        "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
    }
    sc.update(
        {k: jnp.asarray(v, jnp.float32) for k, v in trainer.schedule.scalars(5).items()}
    )

    def lf(p):
        return train_loss(
            p, S, trainer.aabb, trainer.data, ray_idx, ray_idx_rand, key, sc
        )

    (loss, metrics), grads = jax.jit(
        jax.value_and_grad(lf, has_aux=True)
    )(trainer.params)
    return loss, metrics, grads


@pytest.mark.integration
@pytest.mark.parametrize("ray_type,optimize", [("ndc", 1), ("contract", 0)])
def test_fused_matches_sequential(ray_type, optimize):
    trainer = tiny_trainer(ray_type, optimize)
    key = jax.random.PRNGKey(7)
    ray_idx = jnp.asarray(trainer.sampler.nextids())
    ray_idx_rand = jnp.asarray(trainer.sampler2.nextids())
    loss_f, met_f, g_f = _loss_and_metrics(trainer, True, key, ray_idx, ray_idx_rand)
    loss_s, met_s, g_s = _loss_and_metrics(trainer, False, key, ray_idx, ray_idx_rand)

    np.testing.assert_allclose(float(loss_f), float(loss_s), rtol=2e-5)
    for k in met_s:
        np.testing.assert_allclose(
            np.asarray(met_f[k]), np.asarray(met_s[k]), rtol=5e-4, atol=1e-6,
            err_msg=f"metric {k}",
        )
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_s = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_s)
    )
    for path, v in flat_f:
        ks = jax.tree_util.keystr(path)
        r = flat_s[ks]
        scale = max(float(jnp.abs(r).max()), 1e-8)
        # the batched path coalesces every pass's table cotangents in ONE
        # sorted reduction (sequential: per-pass sums added) — float
        # reassociation, not a topology difference; detach-structure bugs
        # show up as O(1) relative errors
        np.testing.assert_allclose(
            np.asarray(v) / scale, np.asarray(r) / scale, atol=5e-4,
            err_msg=f"grad {ks}",
        )


@pytest.mark.integration
def test_chunked_matches_unchunked():
    """pass_chunk=2 (4 chunked dynamic evals) == single batched eval.

    Chunking only re-groups rows across eval instances — values and
    gradients must match to float tolerance (concat order is preserved)."""
    trainer = tiny_trainer("ndc", 1)
    key = jax.random.PRNGKey(11)
    ray_idx = jnp.asarray(trainer.sampler.nextids())
    ray_idx_rand = jnp.asarray(trainer.sampler2.nextids())

    def run(chunk):
        S = dataclasses.replace(
            trainer._statics(), fused_passes=True, pass_chunk=chunk
        )
        sc = {
            "iteration": jnp.asarray(5, jnp.int32),
            "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
        }
        sc.update(
            {k: jnp.asarray(v, jnp.float32)
             for k, v in trainer.schedule.scalars(5).items()}
        )

        def lf(p):
            return train_loss(
                p, S, trainer.aabb, trainer.data, ray_idx, ray_idx_rand, key, sc
            )

        return jax.jit(jax.value_and_grad(lf, has_aux=True))(trainer.params)

    (loss_1, met_1), g_1 = run(0)
    (loss_2, met_2), g_2 = run(2)
    np.testing.assert_allclose(float(loss_2), float(loss_1), rtol=2e-5)
    flat_1 = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_1)
    )
    for path, v in jax.tree_util.tree_leaves_with_path(g_2):
        ks = jax.tree_util.keystr(path)
        r = flat_1[ks]
        scale = max(float(jnp.abs(r).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(v) / scale, np.asarray(r) / scale, atol=5e-4,
            err_msg=f"grad {ks}",
        )


@pytest.mark.integration
@pytest.mark.parametrize("fused", [False, True])
def test_share_forward_exact_in_det_mode(fused):
    """Cross-pass forward sharing (A/B reuse E's static eval) is EXACT when
    sample positions coincide: in golden_det mode (deterministic jitter) the
    shared and unshared paths must agree to float tolerance in loss, metrics,
    and every gradient (the reference's per-pass re-render differs only by
    its fresh jitter draw, train.py:1092/1166/1755)."""
    trainer = tiny_trainer("ndc", 1)
    key = jax.random.PRNGKey(3)
    ray_idx = jnp.asarray(trainer.sampler.nextids())
    ray_idx_rand = jnp.asarray(trainer.sampler2.nextids())

    def run(share):
        S = dataclasses.replace(
            trainer._statics(), golden_det=True, fused_passes=fused,
            share_forward=share,
        )
        sc = {
            "iteration": jnp.asarray(5, jnp.int32),
            "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
        }
        sc.update(
            {k: jnp.asarray(v, jnp.float32)
             for k, v in trainer.schedule.scalars(5).items()}
        )

        def lf(p):
            return train_loss(
                p, S, trainer.aabb, trainer.data, ray_idx, ray_idx_rand, key, sc
            )

        return jax.jit(jax.value_and_grad(lf, has_aux=True))(trainer.params)

    (loss_on, met_on), g_on = run(True)
    (loss_off, met_off), g_off = run(False)
    np.testing.assert_allclose(float(loss_on), float(loss_off), rtol=1e-6)
    for k in met_off:
        np.testing.assert_allclose(
            np.asarray(met_on[k]), np.asarray(met_off[k]), rtol=1e-5, atol=1e-8,
            err_msg=f"metric {k}",
        )
    flat_off = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_off)
    )
    for path, v in jax.tree_util.tree_leaves_with_path(g_on):
        ks = jax.tree_util.keystr(path)
        r = flat_off[ks]
        scale = max(float(jnp.abs(r).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(v) / scale, np.asarray(r) / scale, atol=1e-5,
            err_msg=f"grad {ks}",
        )


@pytest.mark.integration
@pytest.mark.parametrize("fused", [False, True])
def test_debug_nan_fill(fused):
    """Mode-restricted passes fill unconsumed RenderOutputs fields with
    placeholders (zeros in production). Under debug_nan_fill=True those
    placeholders become NaN; a finite loss + finite gradients prove the
    production loss set never reads an unconsumed field (if a loss or a
    mode misassignment ever consumes one, this test goes non-finite)."""
    trainer = tiny_trainer("ndc", 1)
    key = jax.random.PRNGKey(21)
    ray_idx = jnp.asarray(trainer.sampler.nextids())
    ray_idx_rand = jnp.asarray(trainer.sampler2.nextids())
    S = dataclasses.replace(
        trainer._statics(), fused_passes=fused, debug_nan_fill=True
    )
    sc = {
        "iteration": jnp.asarray(5, jnp.int32),
        "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
    }
    sc.update(
        {k: jnp.asarray(v, jnp.float32)
         for k, v in trainer.schedule.scalars(5).items()}
    )

    def lf(p):
        return train_loss(
            p, S, trainer.aabb, trainer.data, ray_idx, ray_idx_rand, key, sc
        )

    (loss, metrics), grads = jax.jit(jax.value_and_grad(lf, has_aux=True))(
        trainer.params
    )
    assert np.isfinite(float(loss)), "a loss consumed an unfilled output field"
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), f"non-finite metric {k}"
    for path, v in jax.tree_util.tree_leaves_with_path(grads):
        assert np.all(np.isfinite(np.asarray(v))), (
            f"non-finite grad {jax.tree_util.keystr(path)}"
        )
