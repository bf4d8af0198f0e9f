"""Ops tests: compositing identities, distortion-loss forms, regularizers."""

import numpy as np
import jax
import jax.numpy as jnp

from rodynrf_tpu.ops import raw2alpha, raw2outputs, eff_distloss
from rodynrf_tpu.ops.distortion import distloss_naive
from rodynrf_tpu.ops.regularizers import tv_loss_plane, tv_loss_line, vm_outer_l1, line_orthogonality

RNG = np.random.default_rng(2)


@jax.jit
def _raw2alpha_j(sigma, dist):
    return raw2alpha(sigma, dist)


def test_raw2alpha_weights_sum_le_one():
    sigma = jnp.asarray(np.abs(RNG.standard_normal((16, 32))) * 5, jnp.float32)
    dist = jnp.full((16, 32), 0.05, jnp.float32)
    alpha, weights, bg = _raw2alpha_j(sigma, dist)
    total = np.asarray(weights.sum(-1) + bg[:, 0])
    np.testing.assert_allclose(total, np.ones(16), atol=1e-4)
    assert np.all(np.asarray(weights) >= 0)


def test_raw2alpha_torch_reference_form():
    """Match the exact cumprod-with-epsilon form (tensorBase.py:22-34)."""
    sigma = np.abs(RNG.standard_normal((4, 8))).astype(np.float32)
    dist = np.full((4, 8), 0.1, np.float32)
    alpha_np = (1.0 - np.exp(-sigma * dist)).astype(np.float64)
    T = np.cumprod(np.concatenate([np.ones((4, 1)), 1.0 - alpha_np + 1e-10], -1), -1)
    w_ref = alpha_np * T[:, :-1]
    bg_ref = T[:, -1:]
    alpha, weights, bg = _raw2alpha_j(jnp.asarray(sigma), jnp.asarray(dist))
    np.testing.assert_allclose(np.asarray(alpha), alpha_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(weights), w_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bg), bg_ref, atol=1e-5)


def _make_dual_inputs(R=8, S=16):
    rgb_s = RNG.uniform(0, 1, (R, S, 3)).astype(np.float32)
    rgb_d = RNG.uniform(0, 1, (R, S, 3)).astype(np.float32)
    sigma_s = np.abs(RNG.standard_normal((R, S))).astype(np.float32) * 3
    sigma_d = np.abs(RNG.standard_normal((R, S))).astype(np.float32) * 3
    dists = np.full((R, S), 0.08, np.float32)
    z_vals = np.cumsum(dists, -1).astype(np.float32)
    rays = RNG.standard_normal((R, 6)).astype(np.float32)
    return rgb_s, sigma_s, rgb_d, sigma_d, dists, z_vals, rays


def test_raw2outputs_static_equals_full_when_blending_zero():
    rgb_s, sigma_s, rgb_d, sigma_d, dists, z_vals, rays = _make_dual_inputs()
    blending = np.zeros_like(sigma_s)
    out = raw2outputs(
        jnp.asarray(rgb_s), jnp.asarray(sigma_s), jnp.asarray(rgb_d), jnp.asarray(sigma_d),
        jnp.asarray(dists), jnp.asarray(blending), jnp.asarray(z_vals), jnp.asarray(rays),
        is_train=False, ray_type="ndc",
    )
    # with blending == 0 the full render reduces to the static render
    np.testing.assert_allclose(np.asarray(out.rgb_full), np.asarray(out.rgb_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth_full), np.asarray(out.depth_s), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.dynamicness), np.zeros(8), atol=1e-6)


def test_raw2outputs_dynamic_dominates_when_blending_one():
    rgb_s, sigma_s, rgb_d, sigma_d, dists, z_vals, rays = _make_dual_inputs()
    blending = np.ones_like(sigma_s)
    out = raw2outputs(
        jnp.asarray(rgb_s), jnp.asarray(sigma_s), jnp.asarray(rgb_d), jnp.asarray(sigma_d),
        jnp.asarray(dists), jnp.asarray(blending), jnp.asarray(z_vals), jnp.asarray(rays),
        is_train=False, ray_type="ndc",
    )
    # full transmittance sees only dynamic alpha; weights_full = alpha_d * T_d
    alpha_d = 1 - np.exp(-sigma_d * dists)
    T = np.cumprod(np.concatenate([np.ones((8, 1)), 1 - alpha_d[:, :-1] + 1e-10], -1), -1)
    np.testing.assert_allclose(np.asarray(out.weights_full), alpha_d * T, atol=1e-5)


def test_raw2outputs_weights_normalized_dynamic():
    rgb_s, sigma_s, rgb_d, sigma_d, dists, z_vals, rays = _make_dual_inputs()
    blending = RNG.uniform(0, 1, sigma_s.shape).astype(np.float32)
    out = raw2outputs(
        jnp.asarray(rgb_s), jnp.asarray(sigma_s), jnp.asarray(rgb_d), jnp.asarray(sigma_d),
        jnp.asarray(dists), jnp.asarray(blending), jnp.asarray(z_vals), jnp.asarray(rays),
        is_train=False, ray_type="ndc",
    )
    np.testing.assert_allclose(np.asarray(out.weights_d.sum(-1)), np.ones(8), atol=1e-3)


def test_eff_distloss_matches_naive():
    w = RNG.uniform(0, 1, (6, 24)).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    m = np.sort(RNG.uniform(0, 1, (6, 24)).astype(np.float32), -1)
    fast = float(eff_distloss(jnp.asarray(w), jnp.asarray(m), 1.0 / 24))
    naive = float(distloss_naive(jnp.asarray(w), jnp.asarray(m), 1.0 / 24))
    np.testing.assert_allclose(fast, naive, rtol=1e-4)


def test_tv_losses_positive_and_zero_for_constant():
    plane = jnp.ones((4, 8, 8))
    assert float(tv_loss_plane(plane)) == 0.0
    line = jnp.ones((4, 16))
    assert float(tv_loss_line(line)) == 0.0
    plane2 = jnp.asarray(RNG.standard_normal((4, 8, 8)), jnp.float32)
    assert float(tv_loss_plane(plane2)) > 0.0


def test_vm_outer_l1_matches_dense():
    gs = (5, 6, 7)
    n_comp = (3, 2, 2)
    mat_mode = ((0, 1), (0, 2), (1, 2))
    vec_mode = (2, 1, 0)
    planes = [
        jnp.asarray(RNG.standard_normal((n_comp[i], gs[mat_mode[i][1]], gs[mat_mode[i][0]])), jnp.float32)
        for i in range(3)
    ]
    lines = [jnp.asarray(RNG.standard_normal((n_comp[i], gs[vec_mode[i]])), jnp.float32) for i in range(3)]
    f2d = lambda x: jax.nn.relu(x)
    got = float(vm_outer_l1(planes, lines, f2d))
    # dense check
    dense = np.zeros(gs, np.float32)
    p, l = np.asarray(planes[0]), np.asarray(lines[0])
    for c in range(n_comp[0]):
        dense += p[c].T[:, :, None] * l[c][None, None, :]  # plane[c, y, x] -> [x, y] x line z
    p, l = np.asarray(planes[1]), np.asarray(lines[1])
    for c in range(n_comp[1]):
        dense += p[c].T[:, None, :] * l[c][None, :, None]  # plane[c, z, x] -> [x, z] x line y
    p, l = np.asarray(planes[2]), np.asarray(lines[2])
    for c in range(n_comp[2]):
        dense += p[c].T[None, :, :] * l[c][:, None, None]  # plane[c, z, y] -> [y, z] x line x
    want = float(np.mean(np.abs(np.maximum(dense, 0))))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_line_orthogonality_zero_for_orthogonal():
    lines = [jnp.eye(4) * 3.0]
    assert float(line_orthogonality(lines)) < 1e-6


def test_sample_vm_sum_fused_matches_unfused():
    from rodynrf_tpu.ops import sample_vm_sum_fused
    from rodynrf_tpu.ops.grid_sample import sample_vm

    gs = (7, 9, 11)
    n_comp = (4, 2, 2)
    mat_mode = ((0, 1), (0, 2), (1, 2))
    vec_mode = (2, 1, 0)
    planes = [
        jnp.asarray(RNG.standard_normal((n_comp[i], gs[mat_mode[i][1]], gs[mat_mode[i][0]])), jnp.float32)
        for i in range(3)
    ]
    lines = [jnp.asarray(RNG.standard_normal((n_comp[i], gs[vec_mode[i]])), jnp.float32) for i in range(3)]
    xyz = jnp.asarray(RNG.uniform(-1.1, 1.1, (64, 3)), jnp.float32)
    fused = sample_vm_sum_fused(planes, lines, xyz, strides=(1, 2))
    ref = jnp.sum(sample_vm(planes, lines, xyz, strides=(1, 2)), axis=-1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)
