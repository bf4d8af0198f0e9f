"""Render/eval/checkpoint integration on tiny shapes."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from rodynrf_tpu.fields.alpha_mask import AlphaGridMask, pack_alpha, unpack_alpha, update_alpha_mask
from rodynrf_tpu.render.renderer import make_chunk_renderer, render_image
from rodynrf_tpu.testing import TINY, tiny_trainer
from rodynrf_tpu.train.checkpoints import load_checkpoint, save_checkpoint


import pytest

pytestmark = pytest.mark.integration


def _trainer():
    return tiny_trainer("ndc", 1)


def test_render_image_and_eval(tmp_path):
    tr = _trainer()
    from rodynrf_tpu.core.se3 import pose_to_mtx
    from rodynrf_tpu.eval.evaluation import evaluate, export_poses_bounds

    poses = np.asarray(pose_to_mtx(tr.params["pose"]))
    chunk_fn = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples,
        tr.static_cfg.step_size(np.asarray(tr.scene.scene_bbox)),
    )
    params = {"static": tr.params["static"], "dynamic": tr.params["dynamic"]}
    maps = render_image(
        chunk_fn, params, tr.aabb, poses[0], tr.focal_fixed, -1.0,
        TINY["H"], TINY["W"], "ndc", chunk=256,
    )
    assert maps["rgb"].shape == (TINY["H"], TINY["W"], 3)
    assert np.all(np.isfinite(maps["rgb"])) and np.all(np.isfinite(maps["depth"]))

    psnrs, near_fars, _ = evaluate(
        chunk_fn, params, tr.aabb, poses, tr.focal_fixed, tr.scene, "ndc",
        save_path=str(tmp_path / "imgs"), n_vis=-1, chunk=256,
    )
    assert len(psnrs) == TINY["T"] and all(np.isfinite(psnrs))
    assert os.path.exists(tmp_path / "imgs" / "000.png")
    assert os.path.exists(tmp_path / "imgs" / "mean.txt")

    out = export_poses_bounds(
        str(tmp_path / "pb.npy"), poses, tr.focal_fixed, TINY["H"], TINY["W"], 2.0, near_fars
    )
    assert out.shape == (TINY["T"], 17)


def test_checkpoint_roundtrip(tmp_path):
    tr = _trainer()
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(
        path, tr.params, tr.static_cfg, tr.dynamic_cfg, np.asarray(tr.aabb),
        extra={"focal": 42.0, "iteration": 7},
    )
    params2, scfg, dcfg, aabb, extra = load_checkpoint(path)
    assert scfg == tr.static_cfg and dcfg == tr.dynamic_cfg
    assert extra["focal"] == 42.0
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_alpha_mask_roundtrip_and_sampling():
    rng = np.random.default_rng(0)
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    alpha = (rng.uniform(size=(6, 7, 8, 3)) > 0.5).astype(np.float32)
    mask, new_aabb = update_alpha_mask(jnp.asarray(alpha), aabb, 0.5)
    assert mask.alpha_volume.shape == (8, 7, 6, 3)
    assert np.all(np.asarray(new_aabb[0]) <= np.asarray(new_aabb[1]))

    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (50, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-1, 1, 50).astype(np.float32))
    vals = mask.sample_alpha(xyz, t)
    assert vals.shape == (50,)
    eps = 1e-5  # trilinear lerp of {0,1} can overshoot by float rounding
    assert np.all((np.asarray(vals) >= -eps) & (np.asarray(vals) <= 1 + eps))

    packed = pack_alpha(mask)
    mask2 = unpack_alpha(packed)
    np.testing.assert_array_equal(
        np.asarray(mask.alpha_volume), np.asarray(mask2.alpha_volume)
    )


def test_mesh_export(tmp_path):
    from rodynrf_tpu.eval.mesh import marching_tetrahedra, write_ply

    # sphere SDF-ish field
    g = np.mgrid[0:16, 0:16, 0:16].astype(np.float32)
    d = np.sqrt(((g - 7.5) ** 2).sum(0))
    vol = (d < 5).astype(np.float32)
    verts, faces = marching_tetrahedra(vol, 0.5)
    assert len(verts) > 50 and len(faces) > 50
    # all verts near radius 5 (within a voxel)
    r = np.sqrt(((verts - 7.5) ** 2).sum(-1))
    assert abs(float(r.mean()) - 5.0) < 1.0
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, faces)
    head = open(path, "rb").read(64)
    assert head.startswith(b"ply")
