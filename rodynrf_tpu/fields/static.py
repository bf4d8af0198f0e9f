"""Static VM-decomposed tensorial radiance field.

Functional equivalent of the reference's `TensorVMSplit`
(reference: models/tensoRF.py:11-274): 3 density plane/line pairs, 3
appearance plane/line pairs, an appearance basis matrix, and a shading MLP.
Time-invariant (the reference variant ignores its t argument).

State layout (a pytree of arrays):
  params = {
    'density_plane': [3 x (C_i, H, W)], 'density_line': [3 x (C_i, L)],
    'app_plane':     [3 x (C_i, H, W)], 'app_line':     [3 x (C_i, L)],
    'basis_mat':     (sum(app_n_comp), app_dim),
    'shading':       shading-MLP params,
  }
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.grid_sample import (
    MAT_MODE,
    VEC_MODE,
    resize_bilinear_align_corners,
    resize_line_align_corners,
    sample_vm,
    sample_vm_sum,
)
from ..ops.regularizers import line_orthogonality, tv_loss_vm, vm_outer_l1
from .config import FieldConfig
from .mlps import init_shading

VM_SCALE = 0.1  # init scale (reference: tensoRF.py:17-21)


def init_vm(key, n_comp, grid_size, scale=VM_SCALE):
    """Init one plane/line stack (reference: tensoRF.py:26-47 init_one_svd)."""
    planes, lines = [], []
    keys = jax.random.split(key, 6)
    for i in range(3):
        vec_id = VEC_MODE[i]
        m0, m1 = MAT_MODE[i]
        planes.append(scale * jax.random.normal(keys[2 * i], (n_comp[i], grid_size[m1], grid_size[m0])))
        lines.append(scale * jax.random.normal(keys[2 * i + 1], (n_comp[i], grid_size[vec_id])))
    return planes, lines


def init_static_field(key: jax.Array, cfg: FieldConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    density_plane, density_line = init_vm(k1, cfg.density_n_comp, cfg.grid_size)
    app_plane, app_line = init_vm(k2, cfg.app_n_comp, cfg.grid_size)
    bound = 1.0 / jnp.sqrt(sum(cfg.app_n_comp))
    basis = jax.random.uniform(k3, (sum(cfg.app_n_comp), cfg.app_dim), jnp.float32, -bound, bound)
    shading = init_shading(
        k4, cfg.shading_mode, cfg.app_dim, cfg.view_pe, cfg.fea_pe, cfg.pos_pe, cfg.featureC
    )
    return {
        "density_plane": density_plane,
        "density_line": density_line,
        "app_plane": app_plane,
        "app_line": app_line,
        "basis_mat": basis,
        "shading": shading,
    }


def density_feature(params, xyz_n: jnp.ndarray, gather_dtype=None) -> jnp.ndarray:
    """Σ plane⊙line density (reference: tensoRF.py:118-154). xyz_n [N,3]->[N]."""
    return sample_vm_sum(
        params["density_plane"], params["density_line"], xyz_n, gather_dtype=gather_dtype
    )


def app_feature(params, xyz_n: jnp.ndarray, gather_dtype=None) -> jnp.ndarray:
    """Appearance features via basis matrix (reference: tensoRF.py:156-196)."""
    feats = sample_vm(
        params["app_plane"], params["app_line"], xyz_n, strides=(1,), gather_dtype=gather_dtype
    )
    return feats @ params["basis_mat"]


def pack_tables(params, cfg: FieldConfig):
    """Fused gather tables for the static field (see dynamic.pack_tables).

    With appearance compaction (cfg.app_frac > 0) density and appearance
    pack separately: density rows are gathered for every sample, appearance
    rows only for the per-ray top-K bucket (render/pipeline.py)."""
    from ..ops.fused_vm import pack_vm

    if cfg.app_frac > 0.0:
        return {
            "db": pack_vm(
                [(params["density_plane"], params["density_line"])],
                strides=(1,),
                gather_dtype=cfg.gather_dtype,
                grad_impl=cfg.grad_impl,
            ),
            "app": pack_vm(
                [(params["app_plane"], params["app_line"])],
                strides=(1,),
                gather_dtype=cfg.gather_dtype,
                grad_impl=cfg.grad_impl,
            ),
        }
    return pack_vm(
        [
            (params["density_plane"], params["density_line"]),
            (params["app_plane"], params["app_line"]),
        ],
        strides=(1,),
        gather_dtype=cfg.gather_dtype,
        grad_impl=cfg.grad_impl,
    )


def all_features_fused(params, cfg: FieldConfig, xyz_n, packed=None):
    """Density (Σ plane⊙line) and appearance features in one fused take
    (ops/fused_vm.py; reference semantics tensoRF.py:118-196).

    Returns (sigma_feat [N], app [N, app_dim]) bit-identical to
    density_feature/app_feature.
    """
    if packed is None:
        packed = pack_tables(params, cfg)
    if isinstance(packed, dict):  # split (compaction) pack, dense evaluation
        return density_fused(params, cfg, xyz_n, packed), app_fused(
            params, cfg, xyz_n, packed
        )
    from ..ops.fused_vm import sample_vm_fused

    dens_f, app_f = sample_vm_fused(packed, xyz_n)
    # Σ_axes Σ_c with sample_vm_sum's per-axis add order
    n_comp = [p.shape[0] for p in params["density_plane"]]
    sigma = jnp.zeros(xyz_n.shape[0], xyz_n.dtype)
    c0 = 0
    for c in n_comp:
        sigma = sigma + jnp.sum(dens_f[:, c0 : c0 + c], axis=-1)
        c0 += c
    return sigma, app_f @ params["basis_mat"]


def density_fused(params, cfg: FieldConfig, xyz_n, packed):
    """Phase-1 of the compacted static evaluation: Σ_axes Σ_c plane⊙line
    density feature on every sample. Returns [N]."""
    from ..ops.fused_vm import sample_vm_fused

    (dens_f,) = sample_vm_fused(packed["db"], xyz_n)
    n_comp = [p.shape[0] for p in params["density_plane"]]
    sigma = jnp.zeros(xyz_n.shape[0], xyz_n.dtype)
    c0 = 0
    for c in n_comp:
        sigma = sigma + jnp.sum(dens_f[:, c0 : c0 + c], axis=-1)
        c0 += c
    return sigma


def app_fused(params, cfg: FieldConfig, xyz_n, packed):
    """Phase-2 of the compacted static evaluation: appearance features at
    the (compacted) coordinates [M, 3] -> [M, app_dim]."""
    from ..ops.fused_vm import sample_vm_fused

    (app_f,) = sample_vm_fused(packed["app"], xyz_n)
    return app_f @ params["basis_mat"]


def feature2density(feat: jnp.ndarray, cfg: FieldConfig) -> jnp.ndarray:
    """(reference: tensorBase.py:678-682)."""
    if cfg.fea2dense_act == "softplus":
        return jax.nn.softplus(feat + cfg.density_shift)
    if cfg.fea2dense_act == "relu":
        return jax.nn.relu(feat)
    raise ValueError(cfg.fea2dense_act)


def density_l1(params, cfg: FieldConfig) -> jnp.ndarray:
    """(reference: tensoRF.py:80-98)."""
    return vm_outer_l1(
        params["density_plane"], params["density_line"], lambda f: feature2density(f, cfg)
    )


def tv_density(params) -> jnp.ndarray:
    return tv_loss_vm(params["density_plane"], params["density_line"])


def tv_app(params) -> jnp.ndarray:
    return tv_loss_vm(params["app_plane"], params["app_line"])


def vector_comp_diffs(params) -> jnp.ndarray:
    """(reference: tensoRF.py:63-78)."""
    return line_orthogonality(params["density_line"]) + line_orthogonality(params["app_line"])


def upsample_vm(planes, lines, res_target):
    """align_corners bilinear grid upsample (reference: tensoRF.py:198-220)."""
    new_planes, new_lines = [], []
    for i in range(3):
        vec_id = VEC_MODE[i]
        m0, m1 = MAT_MODE[i]
        new_planes.append(
            resize_bilinear_align_corners(planes[i], (res_target[m1], res_target[m0]))
        )
        new_lines.append(resize_line_align_corners(lines[i], res_target[vec_id]))
    return new_planes, new_lines


def upsample_static_field(params, res_target):
    """(reference: tensoRF.py:222-232)."""
    out = dict(params)
    out["density_plane"], out["density_line"] = upsample_vm(
        params["density_plane"], params["density_line"], res_target
    )
    out["app_plane"], out["app_line"] = upsample_vm(
        params["app_plane"], params["app_line"], res_target
    )
    return out
