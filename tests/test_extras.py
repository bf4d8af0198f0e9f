"""Tests for secondary surface: COLMAP IO, PDF sampling, DDA, pfm, paths."""

import os
import struct

import numpy as np
import jax
import jax.numpy as jnp

from rodynrf_tpu.core.rays_extra import dda, ndc_bbox, ray_marcher, read_pfm, sample_pdf
from rodynrf_tpu.data.colmap import (
    colmap_to_poses_bounds,
    colmap_to_transforms,
    qvec2rotmat,
    read_model,
)
from rodynrf_tpu.eval.paths import generate_follow_spiral, generate_path


def _write_fake_colmap(d):
    os.makedirs(d, exist_ok=True)
    # one PINHOLE camera
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<4d", 500.0, 500.0, 320.0, 240.0))
    # two images, no 2D points
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in ((1, b"a.jpg"), (2, b"b.jpg")):
            f.write(struct.pack("<i", i))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
            f.write(struct.pack("<3d", 0.1 * i, 0.0, 1.0))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 0))
    # two 3D points
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for pid in (1, 2):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", 0.0, 0.0, float(pid + 2)))
            f.write(struct.pack("<3B", 255, 0, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


def test_colmap_roundtrip(tmp_path):
    d = str(tmp_path / "sparse")
    _write_fake_colmap(d)
    cameras, images, points = read_model(d)
    assert cameras[1].model == "PINHOLE" and cameras[1].width == 640
    assert len(images) == 2 and images[1].name == "a.jpg"
    assert len(points) == 2 and points[1].xyz[2] == 3.0

    out = colmap_to_transforms(d, str(tmp_path / "transforms.json"))
    assert len(out["frames"]) == 2
    assert abs(out["fl_x"] - 500.0) < 1e-9
    m = np.asarray(out["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)

    pb = colmap_to_poses_bounds(d)
    assert pb.shape == (2, 17)
    assert np.all(pb[:, -2] < pb[:, -1])  # near < far


def test_qvec_identity():
    np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3))


def test_sample_pdf_concentrates_on_heavy_bins():
    bins = jnp.linspace(0, 1, 9)[None].repeat(4, 0)  # [4, 9]
    weights = jnp.zeros((4, 8)).at[:, 6].set(1.0)  # all mass in bin 6
    samples = sample_pdf(bins, weights, 16, det=True)
    s = np.asarray(samples)
    assert ((s > 0.7) & (s < 0.9)).mean() > 0.8


def test_dda_hits_unit_box():
    bbox = jnp.array([[-1.0, -1, -1], [1, 1, 1]])
    rays_o = jnp.array([[0.0, 0, -5]])
    rays_d = jnp.array([[0.0, 0, 1]])
    t_near, t_far = dda(rays_o, rays_d, bbox)
    np.testing.assert_allclose(np.asarray(t_near)[0, 0], 4.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_far)[0, 0], 6.0, atol=1e-4)


def test_ray_marcher_shapes():
    rays = jnp.concatenate(
        [jnp.zeros((5, 3)), jnp.tile(jnp.array([[0.0, 0, 1]]), (5, 1)),
         jnp.ones((5, 1)), 4 * jnp.ones((5, 1))], -1,
    )
    xyz, ro, rd, z = ray_marcher(rays, n_samples=8)
    assert xyz.shape == (5, 8, 3) and z.shape == (5, 8)
    assert float(z.min()) >= 1.0 and float(z.max()) <= 4.0


def test_ndc_bbox():
    rays = jnp.concatenate([jnp.zeros((10, 3)), jnp.ones((10, 3))], -1)
    box = ndc_bbox(rays)
    np.testing.assert_allclose(np.asarray(box[0]), np.zeros(3))
    np.testing.assert_allclose(np.asarray(box[1]), np.ones(3))


def test_read_pfm(tmp_path):
    path = str(tmp_path / "x.pfm")
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    with open(path, "wb") as f:
        f.write(b"Pf\n4 3\n-1.0\n")
        np.flipud(data).astype("<f4").tofile(f)
    out, scale = read_pfm(path)
    np.testing.assert_allclose(out, data)
    assert scale == 1.0


def test_generate_path_families():
    c2w = np.eye(4)[:3]
    paths = generate_path(c2w, 500.0, 1.0, length=10)
    assert set(paths) == {"dolly", "zoom", "spiral", "fix_view", "change_view_time"}
    assert paths["dolly"][0].shape == (30, 3, 4)
    assert paths["fix_view"][0].shape == (10, 3, 4)
    # dolly zoom reduces focal
    assert paths["dolly"][1][-1] < paths["dolly"][1][0]
    sp = generate_follow_spiral(np.tile(np.eye(4)[:3][None], (5, 1, 1)), 500.0, 1.0)
    assert len(sp) == 10
