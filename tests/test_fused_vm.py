"""Parity of the fused mega-table sampler vs the per-take reference sampler.

The fused path (ops/fused_vm.py) must reproduce ops/grid_sample.sample_vm /
sample_vm_sum bit-for-bit (same f32 arithmetic order), including multiscale
strides, out-of-range zero padding, and gradient flow to planes, lines, and
coordinates. grid_sample itself is golden-tested against torch F.grid_sample
(tests/test_grid_sample.py), so equality here extends that chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodynrf_tpu.ops.fused_vm import (
    pack_vm,
    sample_vm_fused,
    sample_vm_sum_fused_static,
)
from rodynrf_tpu.ops.grid_sample import sample_vm, sample_vm_sum


def make_grid(key, n_comp, grid_size):
    from rodynrf_tpu.fields.static import init_vm

    return init_vm(key, n_comp, grid_size)


def rand_xyz(key, n, pad=0.0):
    # include out-of-range samples to exercise the zero-padding bands
    return jax.random.uniform(key, (n, 3), jnp.float32, -1.0 - pad, 1.0 + pad)


@pytest.mark.parametrize("strides", [(1,), (1, 2, 4)])
def test_fused_matches_sample_vm(strides):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    gs = (13, 17, 11)
    g1 = make_grid(keys[0], [5, 2, 3], gs)
    g2 = make_grid(keys[1], [4, 4, 2], gs)
    xyz = rand_xyz(keys[2], 257, pad=0.3)

    packed = pack_vm([g1, g2], strides=strides)
    f1, f2 = sample_vm_fused(packed, xyz)

    r1 = sample_vm(g1[0], g1[1], xyz, strides=strides)
    r2 = sample_vm(g2[0], g2[1], xyz, strides=strides)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(r1), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(r2), rtol=0, atol=1e-6)


def test_fused_sum_matches_sample_vm_sum():
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    g = make_grid(keys[0], [6, 3, 3], (9, 15, 12))
    xyz = rand_xyz(keys[1], 301, pad=0.2)
    packed = pack_vm([g], strides=(1,))
    got = sample_vm_sum_fused_static(packed, xyz)
    want = sample_vm_sum(g[0], g[1], xyz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-5)


def test_fused_bf16_matches_bf16_gather_dtype():
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    g = make_grid(keys[0], [4, 2, 2], (8, 10, 9))
    xyz = rand_xyz(keys[1], 129)
    packed = pack_vm([g], strides=(1, 2), gather_dtype=jnp.bfloat16)
    got = sample_vm_fused(packed, xyz)[0]
    want = sample_vm(g[0], g[1], xyz, strides=(1, 2), gather_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-6)


def test_fused_gradients_match():
    """Gradients wrt planes, lines AND coordinates must match the reference
    sampler (pose optimization differentiates through xyz)."""
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    gs = (7, 9, 8)
    g = make_grid(keys[0], [3, 2, 2], gs)
    xyz = rand_xyz(keys[1], 65, pad=0.1)
    cot = jax.random.normal(keys[2], (65, sum([3, 2, 2]) * 2), jnp.float32)

    def loss_ref(planes, lines, xyz):
        return jnp.sum(sample_vm(planes, lines, xyz, strides=(1, 2)) * cot)

    def loss_fused(planes, lines, xyz):
        packed = pack_vm([(planes, lines)], strides=(1, 2))
        return jnp.sum(sample_vm_fused(packed, xyz)[0] * cot)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(g[0], g[1], xyz)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(g[0], g[1], xyz)
    for a, b in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_fused_jit_and_pytree():
    """PackedVM must cross jit boundaries as a pytree with static meta."""
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    g = make_grid(keys[0], [2, 2, 2], (6, 6, 6))
    xyz = rand_xyz(keys[1], 33)
    packed = pack_vm([g], strides=(1,))

    @jax.jit
    def f(packed, xyz):
        return sample_vm_fused(packed, xyz)[0]

    out = f(packed, xyz)
    want = sample_vm(g[0], g[1], xyz)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=0, atol=1e-6)
