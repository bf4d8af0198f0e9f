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


def test_fused_bf16_close_to_f32():
    """bf16 mode is approximate by design (bf16 plane AND line tables, bf16
    hat-matrix line matmul with f32 accumulation); it must stay within bf16
    quantization error (~2^-8 relative) of the f32 reference path."""
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    g = make_grid(keys[0], [4, 2, 2], (8, 10, 9))
    xyz = rand_xyz(keys[1], 129)
    packed = pack_vm([g], strides=(1, 2), gather_dtype=jnp.bfloat16)
    got = np.asarray(sample_vm_fused(packed, xyz)[0])
    want = np.asarray(sample_vm(g[0], g[1], xyz, strides=(1, 2)))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=0.02 * scale)


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


def test_merged_layout_bitmatches_strided():
    """Merged-stride rows (one gather per sample) must reproduce the strided
    layout exactly: same corner values, same weight products, same add order."""
    keys = jax.random.split(jax.random.PRNGKey(11), 3)
    for gs in [(8, 10, 9), (9, 13, 17), (5, 4, 6)]:
        g = make_grid(keys[0], [4, 2, 2], gs)
        xyz = rand_xyz(keys[1], 257, pad=0.15)
        p_str = pack_vm([g], strides=(1, 2, 4), layout="strided")
        p_mrg = pack_vm([g], strides=(1, 2, 4), layout="merged")
        assert p_mrg.meta["layout"] == "merged"
        a = sample_vm_fused(p_str, xyz)[0]
        b = sample_vm_fused(p_mrg, xyz)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merged_layout_gradients_match():
    """Gradients wrt planes, lines and xyz must match the strided layout
    (the merge VJP's bounded take-sum vs XLA's scatter — same sums)."""
    keys = jax.random.split(jax.random.PRNGKey(12), 3)
    gs = (7, 9, 8)
    g = make_grid(keys[0], [3, 2, 2], gs)
    xyz = rand_xyz(keys[1], 65, pad=0.1)
    cot = jax.random.normal(keys[2], (65, sum([3, 2, 2]) * 3), jnp.float32)

    def loss(planes, lines, xyz, layout):
        p = pack_vm([(planes, lines)], strides=(1, 2, 4), layout=layout)
        return jnp.sum(sample_vm_fused(p, xyz)[0] * cot)

    gs_str = jax.grad(loss, argnums=(0, 1, 2))(g[0], g[1], xyz, "strided")
    gs_mrg = jax.grad(loss, argnums=(0, 1, 2))(g[0], g[1], xyz, "merged")
    for a, b in zip(jax.tree_util.tree_leaves(gs_str), jax.tree_util.tree_leaves(gs_mrg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_axis_seg_maps_consistency():
    """The static per-axis merge maps must agree with _axis_lerp on random
    coordinates: maps[s][Σ(i_s+1)] == i_s + 1 for every stride."""
    from rodynrf_tpu.ops.fused_vm import _axis_lerp, _axis_seg_maps

    rng = np.random.default_rng(3)
    for n in (5, 7, 9, 12, 31, 220, 331, 368):
        strides = (1, 2, 4)
        maps, starts, counts = _axis_seg_maps(n, strides)
        u = jnp.asarray(rng.uniform(-1.2, 1.2, 4096), jnp.float32)
        seg = jnp.zeros(4096, jnp.int32)
        i0s = []
        from rodynrf_tpu.ops.grid_sample import _strided_len

        for si, s in enumerate(strides):
            ns = _strided_len(n, s)
            i0, _, _ = _axis_lerp(u, ns)
            i0s.append(np.asarray(i0))
            seg = seg + i0 + 1
        seg = np.asarray(seg)
        for si in range(len(strides)):
            np.testing.assert_array_equal(maps[si][seg], i0s[si] + 1)
        # reverse maps: starts/counts cover each index contiguously
        for si in range(len(strides)):
            m = maps[si]
            for h in range(m.max() + 1):
                idx = np.where(m == h)[0]
                if idx.size:
                    assert starts[si][h] == idx[0]
                    assert counts[si][h] == idx.size


@pytest.mark.parametrize("grad_impl", ["csum", "xla"])
def test_merged_grad_impl_parity(grad_impl):
    """grad_impl='csum'/'xla' through the merged layout: forward bit-identical
    to autodiff packing, gradients numerically equal (the custom VJP only
    changes HOW table cotangents accumulate, not what they sum to)."""
    keys = jax.random.split(jax.random.PRNGKey(21), 3)
    gs = (7, 9, 8)
    g = make_grid(keys[0], [3, 2, 2], gs)
    xyz = rand_xyz(keys[1], 97, pad=0.1)
    cot = jax.random.normal(keys[2], (97, sum([3, 2, 2]) * 3), jnp.float32)

    def fwd(layoutkw):
        p = pack_vm([g], strides=(1, 2, 4), layout="merged", **layoutkw)
        return sample_vm_fused(p, xyz)[0]

    np.testing.assert_array_equal(
        np.asarray(fwd({"grad_impl": grad_impl})), np.asarray(fwd({}))
    )

    def loss(planes, lines, xyz, gi):
        p = pack_vm([(planes, lines)], strides=(1, 2, 4), layout="merged",
                    grad_impl=gi)
        return jnp.sum(sample_vm_fused(p, xyz)[0] * cot)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(g[0], g[1], xyz, "autodiff")
    g_new = jax.grad(loss, argnums=(0, 1, 2))(g[0], g[1], xyz, grad_impl)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
