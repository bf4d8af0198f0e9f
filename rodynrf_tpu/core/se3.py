"""SE(3)/SO(3)/6D-rotation camera pose math, pure JAX.

Functional equivalents of the reference's camera utilities
(reference: camera.py:8-15 pose_to_mtx, 18-70 Pose, 73-164 Lie,
167-266 Quaternion, 274-297 world/cam transforms, 366-394 Procrustes).
Everything here is shape-polymorphic and differentiable; poses are
``[..., 3, 4]`` matrices of the form ``[R | t]`` mapping world->camera
(same convention as the reference: ``X_cam = X_world @ R^T + t``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def f32_matmul(fn):
    """Run a function's matmuls at full f32 precision.

    Camera math is all tiny 3x3/3x4 products where reduced-precision MXU
    accumulation (the JAX default) visibly corrupts poses; full precision
    costs nothing at these shapes.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


# ---------------------------------------------------------------------------
# 6D rotation + translation -> [3,4] camera-to-world matrix
# ---------------------------------------------------------------------------

@f32_matmul
def pose_to_mtx(pose9: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt 2-vector (6D) rotation + translation -> ``[..., 3, 4]``.

    ``pose9[..., 0:3]`` and ``[..., 3:6]`` span the rotation; ``[..., 6:9]``
    is the translation column. Columns of the output are (b1, b2, b3, t)
    (reference: camera.py:8-15).
    """
    b1 = pose9[..., 0:3]
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = pose9[..., 3:6] - jnp.sum(b1 * pose9[..., 3:6], axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3, pose9[..., 6:9]], axis=-1)


def mtx_to_pose(mtx: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pose_to_mtx` (columns 0,1 and t)."""
    return jnp.concatenate([mtx[..., :, 0], mtx[..., :, 1], mtx[..., :, 3]], axis=-1)


# ---------------------------------------------------------------------------
# [R|t] pose algebra
# ---------------------------------------------------------------------------

def make_pose(R: jnp.ndarray | None = None, t: jnp.ndarray | None = None) -> jnp.ndarray:
    if R is None:
        t = jnp.asarray(t, jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), (*t.shape[:-1], 3, 3))
    elif t is None:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.zeros(R.shape[:-1], R.dtype)
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


@f32_matmul
def pose_invert(pose: jnp.ndarray) -> jnp.ndarray:
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = (-R_inv @ t)[..., 0]
    return make_pose(R_inv, t_inv)


@f32_matmul
def pose_compose_pair(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """pose_new(x) = pose_b o pose_a(x)."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    return make_pose(R_b @ R_a, (R_b @ t_a + t_b)[..., 0])


def pose_compose(pose_list) -> jnp.ndarray:
    out = pose_list[0]
    for p in pose_list[1:]:
        out = pose_compose_pair(out, p)
    return out


# ---------------------------------------------------------------------------
# Lie algebra: closed-form exp/log maps (the reference uses 10-term Taylor
# series; we use the exact trig forms with Taylor fallbacks near 0, which are
# numerically superior and XLA-friendly).
# ---------------------------------------------------------------------------

def skew(w: jnp.ndarray) -> jnp.ndarray:
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([zeros, -w2, w1], axis=-1),
            jnp.stack([w2, zeros, -w0], axis=-1),
            jnp.stack([-w1, w0, zeros], axis=-1),
        ],
        axis=-2,
    )


def _sinc_A(theta):
    """sin(x)/x, Taylor-safe at 0."""
    small = theta * theta < 1e-8
    return jnp.where(small, 1.0 - theta**2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))


def _sinc_B(theta):
    """(1-cos(x))/x^2, Taylor-safe at 0."""
    small = theta * theta < 1e-8
    t2 = jnp.where(small, 1.0, theta * theta)
    return jnp.where(small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(theta)) / t2)


def _sinc_C(theta):
    """(x-sin(x))/x^3, Taylor-safe at 0."""
    small = theta * theta < 1e-8
    t3 = jnp.where(small, 1.0, theta**3)
    return jnp.where(small, 1.0 / 6.0 - theta**2 / 120.0, (theta - jnp.sin(theta)) / t3)


@f32_matmul
def so3_to_SO3(w: jnp.ndarray) -> jnp.ndarray:
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + _sinc_A(theta) * wx + _sinc_B(theta) * (wx @ wx)


@f32_matmul
def SO3_to_so3(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))[..., None, None]
    lnR = 1 / (2 * _sinc_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


@f32_matmul
def se3_to_SE3(wu: jnp.ndarray) -> jnp.ndarray:
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    R = eye + _sinc_A(theta) * wx + _sinc_B(theta) * (wx @ wx)
    V = eye + _sinc_B(theta) * wx + _sinc_C(theta) * (wx @ wx)
    return jnp.concatenate([R, V @ u[..., None]], axis=-1)


@f32_matmul
def SE3_to_se3(Rt: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    A, B = _sinc_A(theta), _sinc_B(theta)
    invV = eye - 0.5 * wx + (1 - A / (2 * B)) / (theta**2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

@f32_matmul
def q_to_R(q: jnp.ndarray) -> jnp.ndarray:
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (qc**2 + qd**2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)], -1),
            jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb**2 + qd**2), 2 * (qc * qd - qa * qb)], -1),
            jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb**2 + qc**2)], -1),
        ],
        axis=-2,
    )


def R_to_q(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    row0, row1, row2 = R[..., 0, :], R[..., 1, :], R[..., 2, :]
    R00, R01, R02 = row0[..., 0], row0[..., 1], row0[..., 2]
    R10, R11, R12 = row1[..., 0], row1[..., 1], row1[..., 2]
    R20, R21, R22 = row2[..., 0], row2[..., 1], row2[..., 2]
    t = R00 + R11 + R22
    r = jnp.sqrt(1 + t + eps)
    qa = 0.5 * r
    qb = jnp.sign(R21 - R12) * 0.5 * jnp.sqrt(jnp.maximum(1 + R00 - R11 - R22, 0) + eps)
    qc = jnp.sign(R02 - R20) * 0.5 * jnp.sqrt(jnp.maximum(1 - R00 + R11 - R22, 0) + eps)
    qd = jnp.sign(R10 - R01) * 0.5 * jnp.sqrt(jnp.maximum(1 - R00 - R11 + R22, 0) + eps)
    return jnp.stack([qa, qb, qc, qd], axis=-1)


def q_invert(q: jnp.ndarray) -> jnp.ndarray:
    norm2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype) / norm2


def q_product(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
            a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
            a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
            a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# World/camera transforms & alignment
# ---------------------------------------------------------------------------

def to_hom(X: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


@f32_matmul
def world2cam(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


@f32_matmul
def cam2world(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    return to_hom(X) @ jnp.swapaxes(pose_invert(pose), -1, -2)


@f32_matmul
def cam2img(X: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    return X @ jnp.swapaxes(intr, -1, -2)


@f32_matmul
def rotation_distance(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


@f32_matmul
def procrustes_analysis(X0: jnp.ndarray, X1: jnp.ndarray) -> dict:
    """Similarity (sim3) alignment of point sets ``X1`` to ``X0`` ([N,3]).

    Returns a dict with keys t0, t1, s0, s1, R, matching the reference's
    edict layout (reference: camera.py:376-394).
    """
    t0 = X0.mean(axis=0, keepdims=True)
    t1 = X1.mean(axis=0, keepdims=True)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = jnp.sqrt((X0c**2).sum(axis=-1).mean())
    s1 = jnp.sqrt((X1c**2).sum(axis=-1).mean())
    M = (X0c / s0).T @ (X1c / s1)
    U, _, Vt = jnp.linalg.svd(M.astype(jnp.float64), full_matrices=False)
    R = (U @ Vt).astype(X0.dtype)
    # reflection fix: flip last row of R if det < 0
    det = jnp.linalg.det(R)
    R = R.at[2].multiply(jnp.where(det < 0, -1.0, 1.0))
    return {"t0": t0[0], "t1": t1[0], "s0": s0, "s1": s1, "R": R}


@f32_matmul
def prealign_cameras(pose_in: jnp.ndarray, pose_GT: jnp.ndarray):
    """Procrustes-align predicted camera centers to GT (reference: train.py:740-756)."""
    center = jnp.zeros((1, 1, 3), pose_in.dtype)
    center_pred = cam2world(center, pose_in)[:, 0]
    center_GT = cam2world(center, pose_GT)[:, 0]
    sim3 = procrustes_analysis(center_GT, center_pred)
    center_aligned = (center_pred - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"] + sim3["t0"]
    R_aligned = pose_in[..., :3] @ sim3["R"].T
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    return make_pose(R_aligned, t_aligned), sim3


@f32_matmul
def evaluate_camera_alignment(pose_aligned: jnp.ndarray, pose_GT: jnp.ndarray):
    R_aligned, t_aligned = pose_aligned[..., :3], pose_aligned[..., 3:]
    R_GT, t_GT = pose_GT[..., :3], pose_GT[..., 3:]
    R_error = rotation_distance(R_aligned, R_GT)
    t_error = jnp.linalg.norm((t_aligned - t_GT)[..., 0], axis=-1)
    return R_error, t_error


def angle_to_rotation_matrix(a: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Euler rotation about a named axis (reference: camera.py:300-314)."""
    roll = dict(X=1, Y=2, Z=0)[axis]
    zeros, ones = jnp.zeros_like(a), jnp.ones_like(a)
    M = jnp.stack(
        [
            jnp.stack([jnp.cos(a), -jnp.sin(a), zeros], axis=-1),
            jnp.stack([jnp.sin(a), jnp.cos(a), zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return jnp.roll(M, shift=(roll, roll), axis=(-2, -1))


@f32_matmul
def get_novel_view_poses(pose_anchor: jnp.ndarray, N: int = 60, scale: float = 1.0) -> jnp.ndarray:
    """Circular oscillation novel-view path (reference: camera.py:397-407)."""
    theta = jnp.arange(N) / N * 4 * jnp.pi
    R_x = angle_to_rotation_matrix(jnp.arcsin(-jnp.sin(theta) * 0.05 / 3), "X")
    R_y = angle_to_rotation_matrix(jnp.arcsin(-jnp.cos(theta) * 0.05), "Y")
    pose_rot = make_pose(R=R_y @ R_x)
    pose_shift = make_pose(t=jnp.array([0.0, 0.0, 4.0 * scale]))
    pose_shift2 = make_pose(t=jnp.array([0.0, 0.0, -4.0 * scale]))
    pose_oscil = pose_compose([pose_shift, pose_rot, pose_shift2])
    return pose_compose([pose_oscil, pose_anchor[None]])


@f32_matmul
def img2cam(X: jnp.ndarray, cam_intr: jnp.ndarray) -> jnp.ndarray:
    """(reference: camera.py:290-291)."""
    return X @ jnp.swapaxes(jnp.linalg.inv(cam_intr), -1, -2)


@f32_matmul
def get_center_and_ray(H: int, W: int, pose: jnp.ndarray, intr: jnp.ndarray):
    """Camera centers + per-pixel rays in world space for a batch of poses
    (reference: camera.py:317-335). pose [B,3,4], intr [B,3,3] ->
    (center [B,HW,3], ray [B,HW,3])."""
    y = jnp.arange(H, dtype=jnp.float32) + 0.5
    x = jnp.arange(W, dtype=jnp.float32) + 0.5
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    xy = jnp.stack([X, Y], -1).reshape(-1, 2)  # [HW, 2]
    B = pose.shape[0]
    xy = jnp.broadcast_to(xy[None], (B, *xy.shape))
    grid_3d = img2cam(to_hom(xy), intr)
    center_3d = jnp.zeros_like(grid_3d)
    grid_3d = cam2world(grid_3d, pose)
    center_3d = cam2world(center_3d, pose)
    return center_3d, grid_3d - center_3d


def get_3d_points_from_depth(center, ray, depth, multi_samples: bool = False):
    """x = c + d*v (reference: camera.py:338-343)."""
    if multi_samples:
        center, ray = center[:, :, None], ray[:, :, None]
    return center + ray * depth


def convert_ndc(center, ray, intr, near: float = 1.0):
    """Shift ray origins to the near plane and project to NDC — the +z-facing
    convention variant (reference: camera.py:346-363)."""
    center = center + (near - center[..., 2:]) / ray[..., 2:] * ray
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]
    scale_x = intr[:, 0, 0] / intr[:, 0, 2]
    scale_y = intr[:, 1, 1] / intr[:, 1, 2]
    cnx = scale_x[:, None] * (cx / cz)
    cny = scale_y[:, None] * (cy / cz)
    cnz = 1.0 - 2.0 * near / cz
    rnx = scale_x[:, None] * (rx / rz - cx / cz)
    rny = scale_y[:, None] * (ry / rz - cy / cz)
    rnz = 2.0 * near / cz
    return jnp.stack([cnx, cny, cnz], -1), jnp.stack([rnx, rny, rnz], -1)
