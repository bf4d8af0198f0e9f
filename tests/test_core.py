"""Unit tests: camera/Lie round-trips, PE, NDC/contraction inverses, rays."""

import numpy as np
import jax
import jax.numpy as jnp

from rodynrf_tpu.core import (
    positional_encoding,
    pose_to_mtx,
    mtx_to_pose,
    make_pose,
    pose_invert,
    pose_compose_pair,
    so3_to_SO3,
    SO3_to_so3,
    se3_to_SE3,
    SE3_to_se3,
    q_to_R,
    R_to_q,
    cam2world,
    world2cam,
    procrustes_analysis,
    rotation_distance,
    ndc2world,
    world2ndc,
    contract,
    contract2world,
    ids2pixel,
    get_ray_directions_lean,
    get_rays_lean,
    ndc_rays_blender,
)

RNG = np.random.default_rng(1)


def test_positional_encoding_shape_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = positional_encoding(x, 4)
    assert out.shape == (1, 2 * 4 * 3)
    # ordering: dim-major — first 4 entries are sin(x0 * 2^k)
    expected = np.sin(0.5 * 2.0 ** np.arange(4))
    np.testing.assert_allclose(np.asarray(out[0, :4]), expected, rtol=1e-6)


def test_pose_to_mtx_orthonormal():
    p = jnp.asarray(RNG.standard_normal((8, 9)), jnp.float32)
    m = pose_to_mtx(p)
    R = m[..., :3]
    eye = jnp.eye(3)
    gram = R @ jnp.swapaxes(R, -1, -2)
    np.testing.assert_allclose(np.asarray(gram), np.tile(eye, (8, 1, 1)), atol=1e-5)
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, np.ones(8), atol=1e-5)


def test_pose_to_mtx_roundtrip():
    p = jnp.asarray(RNG.standard_normal((5, 9)), jnp.float32)
    m = pose_to_mtx(p)
    m2 = pose_to_mtx(mtx_to_pose(m))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_so3_roundtrip():
    w = jnp.asarray(RNG.uniform(-1.5, 1.5, (16, 3)), jnp.float32)
    R = so3_to_SO3(w)
    w2 = SO3_to_so3(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-4)


def test_se3_roundtrip():
    wu = jnp.asarray(RNG.uniform(-1.0, 1.0, (16, 6)), jnp.float32)
    Rt = se3_to_SE3(wu)
    wu2 = SE3_to_se3(Rt)
    np.testing.assert_allclose(np.asarray(wu), np.asarray(wu2), atol=1e-4)


def test_so3_small_angle_stable():
    w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = so3_to_SO3(w)
    assert np.all(np.isfinite(np.asarray(R)))
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)


def test_quaternion_roundtrip():
    w = jnp.asarray(RNG.uniform(-1.0, 1.0, (8, 3)), jnp.float32)
    R = so3_to_SO3(w)
    q = R_to_q(R)
    R2 = q_to_R(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_pose_invert_compose():
    w = jnp.asarray(RNG.uniform(-1.0, 1.0, (4, 3)), jnp.float32)
    t = jnp.asarray(RNG.standard_normal((4, 3)), jnp.float32)
    pose = make_pose(so3_to_SO3(w), t)
    ident = pose_compose_pair(pose, pose_invert(pose))
    np.testing.assert_allclose(np.asarray(ident[..., :3]), np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident[..., 3]), np.zeros((4, 3)), atol=1e-5)


def test_world2cam_cam2world_roundtrip():
    w = jnp.asarray(RNG.uniform(-1.0, 1.0, (4, 3)), jnp.float32)
    t = jnp.asarray(RNG.standard_normal((4, 3)), jnp.float32)
    pose = make_pose(so3_to_SO3(w), t)
    X = jnp.asarray(RNG.standard_normal((4, 10, 3)), jnp.float32)
    X2 = world2cam(cam2world(X, pose), pose)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X2), atol=1e-4)


def test_procrustes_recovers_sim3():
    X0 = jnp.asarray(RNG.standard_normal((50, 3)), jnp.float32)
    R = so3_to_SO3(jnp.array([0.3, -0.2, 0.5]))
    X1 = 2.5 * X0 @ R.T + jnp.array([1.0, -2.0, 0.5])
    sim3 = procrustes_analysis(X0, X1)
    X1to0 = (X1 - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"] + sim3["t0"]
    np.testing.assert_allclose(np.asarray(X1to0), np.asarray(X0), atol=1e-4)


def test_rotation_distance_zero_for_same():
    R = so3_to_SO3(jnp.array([[0.1, 0.2, 0.3]]))
    d = rotation_distance(R, R)
    assert float(d[0]) < 1e-3


def test_ndc_world_roundtrip():
    H, W, f = 120.0, 160.0, 140.0
    pts_world = jnp.asarray(
        np.stack(
            [RNG.uniform(-1, 1, 100), RNG.uniform(-1, 1, 100), RNG.uniform(-6, -1.1, 100)], -1
        ),
        jnp.float32,
    )
    ndc = world2ndc(pts_world, H, W, f)
    back = ndc2world(ndc, H, W, f)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts_world), atol=1e-3, rtol=1e-3)


def test_contract_roundtrip_and_range():
    pts = jnp.asarray(RNG.uniform(-10, 10, (200, 3)), jnp.float32)
    c = contract(pts)
    assert float(jnp.max(jnp.abs(c))) <= 2.0 + 1e-5
    back = contract2world(c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3, rtol=1e-3)
    # identity inside unit cube
    inner = jnp.asarray(RNG.uniform(-0.99, 0.99, (50, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(contract(inner)), np.asarray(inner), atol=1e-6)


def test_ids2pixel():
    W, H = 7, 5
    ids = jnp.arange(W * H * 3)
    i, j, v = ids2pixel(W, H, ids)
    assert int(i[8]) == 1 and int(j[8]) == 1 and int(v[8]) == 0
    assert int(v[W * H]) == 1


def test_ndc_rays_origin_on_near_plane():
    # rays through pixel centers; after NDC projection o2 = 1 + 2*near/oz
    i = jnp.arange(10)
    j = jnp.arange(10)
    dirs = get_ray_directions_lean(i, j, (100.0, 100.0), (50.0, 50.0))
    c2w = jnp.tile(make_pose(jnp.eye(3), jnp.zeros(3))[None], (10, 1, 1))
    rays_o, rays_d = get_rays_lean(dirs, c2w)
    o_ndc, d_ndc = ndc_rays_blender(100, 100, (100.0, 100.0), 1.0, rays_o, rays_d)
    assert np.all(np.isfinite(np.asarray(o_ndc)))
    # z-component of origin: 1 + 2*1/oz with oz = -1 (shifted to near plane) -> -1
    np.testing.assert_allclose(np.asarray(o_ndc[:, 2]), -np.ones(10), atol=1e-5)


def test_get_center_and_ray_and_convert_ndc():
    from rodynrf_tpu.core import get_center_and_ray, convert_ndc, make_pose

    intr = jnp.asarray(np.array([[[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]]], np.float32))
    pose = make_pose(jnp.eye(3), jnp.zeros(3))[None]
    c, r = get_center_and_ray(24, 32, pose, intr)
    assert c.shape == (1, 24 * 32, 3) and r.shape == c.shape
    # center is the camera origin (identity pose -> 0)
    np.testing.assert_allclose(np.asarray(c), np.zeros_like(c), atol=1e-5)
    # rays through the principal point are +z
    center_ray = np.asarray(r[0]).reshape(24, 32, 3)[12, 16]
    np.testing.assert_allclose(center_ray[:2], [0, 0], atol=0.02)
    # convert_ndc maps near-plane origins to z = -1
    c2 = c + jnp.array([0.0, 0.0, 2.0])
    cn, rn = convert_ndc(c2, r, intr, near=1.0)
    np.testing.assert_allclose(np.asarray(cn[..., 2]), -np.ones((1, 24 * 32)), atol=1e-5)


def test_get_3d_points_from_depth():
    from rodynrf_tpu.core import get_3d_points_from_depth

    center = jnp.zeros((2, 4, 3))
    ray = jnp.ones((2, 4, 3))
    pts = get_3d_points_from_depth(center, ray, 2.5 * jnp.ones((2, 4, 1)))
    np.testing.assert_allclose(np.asarray(pts), 2.5 * np.ones((2, 4, 3)))
