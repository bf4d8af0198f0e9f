"""Alpha-grid-mask checkpoint interop (VERDICT item 6).

The reference packs the binary alpha volume into its `.th` files
(reference: tensorBase.py:465-469) and reconstructs it at load (472-484,
modulo its own missing-tSize crash). Both directions must carry the mask:
  * export_th writes the exact reference format (shape/mask/aabb keys,
    bit-packed bools, [1, 1, D, H, W, T] module-view shape);
  * import_th reconstructs an equal AlphaGridMask;
  * the native .npz carries it too;
  * the eval renderer honors a mask when given one.
"""

import os

import jax.numpy as jnp
import numpy as np

from rodynrf_tpu.fields.alpha_mask import AlphaGridMask
from rodynrf_tpu.fields.config import FieldConfig
from rodynrf_tpu.fields.dynamic import init_dynamic_field
from rodynrf_tpu.fields.static import init_static_field
from rodynrf_tpu.train.checkpoints import (
    export_th,
    import_th,
    load_checkpoint,
    save_checkpoint,
)

import jax


import pytest

pytestmark = pytest.mark.integration


def _tiny_cfgs():
    common = dict(
        grid_size=(6, 7, 5), t_size=3, density_n_comp=(2, 2, 2), app_n_comp=(2, 2, 2),
        app_dim=6, near_far=(0.0, 1.0),
    )
    return (
        FieldConfig(shading_mode="MLP_Fea", fea_pe=2, **common),
        FieldConfig(shading_mode="MLP_Fea_late_view", fea_pe=0, **common),
    )


def _nontrivial_mask():
    rng = np.random.default_rng(3)
    vol = (rng.random((5, 7, 6, 3)) > 0.6).astype(np.float32)  # [Z, Y, X, T]
    aabb = np.array([[-1.5, -1.67, -1.0], [1.5, 1.67, 1.0]], np.float32)
    return AlphaGridMask(aabb=jnp.asarray(aabb), alpha_volume=jnp.asarray(vol))


def test_alpha_mask_th_roundtrip(tmp_path):
    import torch

    st_cfg, dy_cfg = _tiny_cfgs()
    params = init_dynamic_field(jax.random.PRNGKey(0), dy_cfg)
    mask = _nontrivial_mask()
    aabb = np.asarray(mask.aabb)
    poses = np.tile(np.eye(3, 4, dtype=np.float32)[None], (3, 1, 1))

    path = os.path.join(tmp_path, "with_alpha.th")
    export_th(path, params, dy_cfg, aabb, poses, 30.0, dynamic=True, alpha_mask=mask)

    # raw reference format check (tensorBase.py:465-469 keys)
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert tuple(raw["alphaMask.shape"]) == (1, 1, 5, 7, 6, 3)
    assert raw["alphaMask.mask"].dtype == np.uint8
    np.testing.assert_allclose(raw["alphaMask.aabb"].numpy(), aabb)
    unpacked = np.unpackbits(raw["alphaMask.mask"])[: 5 * 7 * 6 * 3].reshape(5, 7, 6, 3)
    np.testing.assert_array_equal(unpacked, np.asarray(mask.alpha_volume) > 0.5)

    # import reconstructs an equal mask
    params2, meta = import_th(path)
    assert "alpha_mask" in meta
    m2 = meta["alpha_mask"]
    np.testing.assert_array_equal(
        np.asarray(m2.alpha_volume), np.asarray(mask.alpha_volume)
    )
    np.testing.assert_allclose(np.asarray(m2.aabb), aabb)

    # sampling through the reconstructed mask matches the original
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 3)).astype(np.float32))
    t = jnp.asarray(np.linspace(-1, 1, 32), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mask.sample_alpha(xyz, t)), np.asarray(m2.sample_alpha(xyz, t)),
        atol=1e-6,
    )


def test_alpha_mask_native_roundtrip(tmp_path):
    st_cfg, dy_cfg = _tiny_cfgs()
    params = {
        "static": init_static_field(jax.random.PRNGKey(1), st_cfg),
        "dynamic": init_dynamic_field(jax.random.PRNGKey(2), dy_cfg),
        "pose": jnp.zeros((3, 9)),
        "fov": jnp.full((1, 1), 0.5),
    }
    mask = _nontrivial_mask()
    path = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(
        path, params, st_cfg, dy_cfg, np.asarray(mask.aabb), alpha_mask=mask
    )
    *_, alpha = load_checkpoint(path, return_alpha=True)
    assert alpha is not None
    np.testing.assert_array_equal(
        np.asarray(alpha.alpha_volume), np.asarray(mask.alpha_volume)
    )
    # without the flag the legacy 5-tuple shape is preserved
    out = load_checkpoint(path)
    assert len(out) == 5


def test_trainer_update_alpha_mask_hook(tmp_path):
    """update_AlphaMask_list is FUNCTIONAL here (the reference parses it but
    never reads it, opt.py:211): Trainer.update_alpha_mask builds the
    dual-field mask at the current params, checkpoints carry it, and the
    loaded mask reproduces it."""
    from rodynrf_tpu.testing import tiny_trainer
    from rodynrf_tpu.train.checkpoints import load_checkpoint, save_checkpoint

    tr = tiny_trainer("ndc", 0)
    for _ in range(2):
        tr.run_step()
    occ = tr.update_alpha_mask()
    assert tr.alpha_mask is not None
    assert tr.alpha_mask.alpha_volume.shape[-1] == tr.scene.n_frames
    assert 0.0 <= occ <= 1.0

    path = str(tmp_path / "ck.npz")
    save_checkpoint(
        path,
        {k: tr.params[k] for k in ("static", "dynamic", "pose", "fov")},
        tr.static_cfg, tr.dynamic_cfg, np.asarray(tr.aabb),
        alpha_mask=tr.alpha_mask,
    )
    _, _, _, _, _, mask2 = load_checkpoint(path, return_alpha=True)
    assert mask2 is not None
    np.testing.assert_array_equal(
        np.asarray(mask2.alpha_volume), np.asarray(tr.alpha_mask.alpha_volume)
    )
