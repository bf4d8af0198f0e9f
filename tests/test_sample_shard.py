"""Sample-axis sharding (SURVEY §5.7): the dual-field compositor over a 2-D
(ray x sample) mesh matches the single-device raw2outputs.

Runs on the 8-virtual-CPU-device mesh from conftest (2 ray shards x 4 sample
shards): the distributed exclusive-product transmittance and the psum'd
per-ray reductions must reproduce ops/compositing.py to float tolerance
(product re-association across shard boundaries only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodynrf_tpu.ops.compositing import raw2outputs
from rodynrf_tpu.parallel.sample_shard import (
    make_2d_mesh,
    make_sample_sharded_raw2outputs,
    shard_compositor_inputs,
)

R, S = 16, 24


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    rgb_s = rng.uniform(0, 1, (R, S, 3)).astype(np.float32)
    rgb_d = rng.uniform(0, 1, (R, S, 3)).astype(np.float32)
    sigma_s = rng.uniform(0, 3, (R, S)).astype(np.float32)
    sigma_d = rng.uniform(0, 3, (R, S)).astype(np.float32)
    dists = rng.uniform(0.01, 0.05, (R, S)).astype(np.float32)
    blending = rng.uniform(0, 1, (R, S)).astype(np.float32)
    z_vals = np.sort(rng.uniform(0, 1, (R, S)).astype(np.float32), -1)
    rays = rng.normal(0, 1, (R, 6)).astype(np.float32)
    return rgb_s, sigma_s, rgb_d, sigma_d, dists, blending, z_vals, rays


@pytest.mark.parametrize("ray_type", ["ndc", "contract"])
def test_sample_sharded_matches_dense(ray_type):
    assert len(jax.devices()) >= 8
    mesh = make_2d_mesh(2, 4)
    args = _inputs()
    ref = raw2outputs(*args, is_train=False, ray_type=ray_type)

    fn = make_sample_sharded_raw2outputs(mesh, is_train=False, ray_type=ray_type)
    placed = shard_compositor_inputs(mesh, *args)
    out = jax.jit(fn)(*placed)

    # atol 1e-4: contract/ndc background depth multiplies (1 - acc) by the
    # far plane (256), amplifying ~1e-7 product re-association to ~5e-5 abs
    for name, a, b in zip(ref._fields, ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4, err_msg=name
        )


def test_sample_sharded_white_fill():
    mesh = make_2d_mesh(2, 4)
    args = _inputs(1)
    white = np.asarray([i % 2 == 0 for i in range(R)])
    ref = raw2outputs(*args, is_train=True, ray_type="ndc", white=jnp.asarray(white))

    fn = make_sample_sharded_raw2outputs(mesh, is_train=True, ray_type="ndc")
    placed = shard_compositor_inputs(mesh, *args)
    w = jax.device_put(
        jnp.asarray(white),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("ray")),
    )
    out = jax.jit(fn)(*placed, w)
    for name, a, b in zip(ref._fields, ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4, err_msg=name
        )


def test_sample_sharded_gradients():
    """The distributed prefix product is differentiable: grads w.r.t. the
    sigma inputs match the dense compositor's."""
    mesh = make_2d_mesh(2, 4)
    args = _inputs(2)

    def loss_dense(sigma_s, sigma_d):
        out = raw2outputs(
            args[0], sigma_s, args[2], sigma_d, *args[4:], is_train=False, ray_type="ndc"
        )
        return jnp.sum(out.rgb_full) + jnp.sum(out.depth_full * 0.1)

    fn = make_sample_sharded_raw2outputs(mesh, is_train=False, ray_type="ndc")
    placed = shard_compositor_inputs(mesh, *args)

    def loss_sharded(sigma_s, sigma_d):
        out = fn(placed[0], sigma_s, placed[2], sigma_d, *placed[4:])
        return jnp.sum(out.rgb_full) + jnp.sum(out.depth_full * 0.1)

    g_ref = jax.grad(loss_dense, (0, 1))(args[1], args[3])
    g_sh = jax.jit(jax.grad(loss_sharded, (0, 1)))(placed[1], placed[3])
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6)
