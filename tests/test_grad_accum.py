"""Gradient accumulation (make_train_step S.grad_accum): the scanned
micro-batch gradient average vs the full-batch gradient.

Two assertions:
1. EXACT: the scanned accumulation equals the manual average of per-micro
   gradients (same micro statistics on both sides) — catches scan/init/
   key-split bugs.
2. LOOSE: the accumulated loss tracks the full-batch loss to ~1e-3: the
   batch-STATISTIC terms (monodepth median/MAD normalization, flow
   mask-sum ratios; reference train.py:1635-1658) are evaluated at micro
   sample size, the same estimator at half the sample — on this tiny
   64-ray fixture that shifts those terms by up to a few 1e-3.
golden_det removes the stochastic draws.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rodynrf_tpu.testing import tiny_trainer
from rodynrf_tpu.train.step import make_train_step


def _run_micro(trainer, ri, rr, key):
    """Gradient of one micro-batch via the accum=1 path."""
    S = dataclasses.replace(trainer._statics(), grad_accum=1, golden_det=True)
    step = make_train_step(S, donate=False)
    sc = {
        "iteration": jnp.asarray(5, jnp.int32),
        "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
    }
    sc.update(
        {k: jnp.asarray(v, jnp.float32) for k, v in trainer.schedule.scalars(5).items()}
    )
    grads, _ = jax.jit(step.grads_and_metrics)(
        trainer.params, trainer.aabb, trainer.data, ri, rr, key, sc,
    )
    return grads, None


def _run(trainer, accum, ray_idx, ray_idx_rand):
    S = dataclasses.replace(
        trainer._statics(), grad_accum=accum, golden_det=True
    )
    step = make_train_step(S, donate=False)
    sc = {
        "iteration": jnp.asarray(5, jnp.int32),
        "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
    }
    sc.update(
        {k: jnp.asarray(v, jnp.float32) for k, v in trainer.schedule.scalars(5).items()}
    )
    grads, metrics = jax.jit(step.grads_and_metrics)(
        trainer.params, trainer.aabb, trainer.data,
        ray_idx, ray_idx_rand, jax.random.PRNGKey(3), sc,
    )
    return grads, metrics


def test_grad_accum_matches_full_batch():
    trainer = tiny_trainer("ndc", 1)
    ray_idx = jnp.asarray(trainer.sampler.nextids())
    ray_idx_rand = jnp.asarray(trainer.sampler2.nextids())

    g1, m1 = _run(trainer, 1, ray_idx, ray_idx_rand)
    g2, m2 = _run(trainer, 2, ray_idx, ray_idx_rand)

    # (2) batch-statistic loss terms shift at micro sample size (docstring)
    np.testing.assert_allclose(
        float(m2["total_loss"]), float(m1["total_loss"]), rtol=5e-3
    )

    # (1) exact invariant: scan accumulation == manual micro average
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    halves = []
    for h in range(2):
        tr = trainer
        gh, _ = _run_micro(tr, ray_idx.reshape(2, -1)[h],
                           ray_idx_rand.reshape(2, -1)[h], keys[h])
        halves.append(gh)
    g2m = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *halves)
    flatm = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g2m)
    )
    for path, v in jax.tree_util.tree_leaves_with_path(g2):
        ks = jax.tree_util.keystr(path)
        r = flatm[ks]
        scale = max(float(jnp.abs(r).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(v, np.float32) / scale,
            np.asarray(r, np.float32) / scale,
            atol=1e-5, err_msg=f"grad {ks}",
        )
