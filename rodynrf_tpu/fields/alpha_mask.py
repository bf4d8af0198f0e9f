"""Alpha-grid occupancy mask with a time axis.

Functional equivalent of the reference's `AlphaGridMask` + dense-alpha
machinery (reference: models/tensorBase.py:42-78 sample_alpha,
564-589 getDenseAlpha, 591-629 updateAlphaMask). The volume is stored
dense [D, H, W, T]; queries trilinearly sample space and one-hot select the
nearest time slice, exactly like the reference's grid_sample + one_hot.

Note: the shipped reference configs never trigger the update
(update_AlphaMask_list = [3e8]); this exists for full API parity and for
the ray-filtering / compute-alpha paths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import sample_grid3d
from .dynamic import normalize_coord


class AlphaGridMask(NamedTuple):
    aabb: jnp.ndarray  # [2, 3]
    alpha_volume: jnp.ndarray  # [D, H, W, T] uint8 {0, 1}

    @property
    def t_size(self) -> int:
        return self.alpha_volume.shape[-1]

    def sample_alpha(self, xyz: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """xyz [N, 3] world coords, t [N] in [-1, 1] -> alpha [N]
        (reference: tensorBase.py:56-73)."""
        xyz_n = normalize_coord(xyz, self.aabb)
        vals = sample_grid3d(self.alpha_volume, xyz_n)  # [N, T]
        t_int = jnp.round((t + 1.0) / 2.0 * (self.t_size - 1)).astype(jnp.int32)
        return jnp.take_along_axis(vals, t_int[:, None], axis=1)[:, 0]


def dilate_occupancy(alpha_volume: jnp.ndarray) -> jnp.ndarray:
    """One extra spatial 3^3 max-pool over a {0,1} [D, H, W, T] volume.

    Pre-dilation makes the single-gather nearest-voxel test below a SUPERSET
    of the reference's trilinear>0 test on the original volume: trilinear>0
    at x means some corner c of x's enclosing cell is occupied; the nearest
    voxel n is also a corner of that cell, so |n - c| <= 1 per axis and the
    dilated volume has vol_d[n] >= vol[c] = 1. Asserted by
    tests/test_compact_train.py::test_nearest_occupancy_superset."""
    return (max_pool3d_same(alpha_volume.astype(jnp.float32), 3) > 0.5).astype(
        jnp.uint8
    )


def occupancy_nearest(
    alpha_volume: jnp.ndarray, mask_aabb: jnp.ndarray, xyz: jnp.ndarray,
    t: jnp.ndarray, shape=None,
) -> jnp.ndarray:
    """Nearest-voxel occupancy bit at (xyz, t): ONE gathered byte per sample.

    The train step's occupancy test runs at [R*S] scale for ~7 pass
    geometries per iteration; TPU takes serialize per INDEX (~50-76 Midx/s
    regardless of row width, PERF.md §1/§13), so the 8-corner trilinear test
    costs 8x this one. Soundness comes from pre-dilation (dilate_occupancy):
    on the dilated volume this keeps a superset of the samples the
    reference's trilinear early-out would keep (tensorBase.py:56-73) —
    extra kept samples contribute their true field values, never an
    approximation. Out-of-aabb samples test unoccupied (the trilinear
    zero-padding contract).

    alpha_volume: [D, H, W, T] uint8 (pre-dilated) — or FLAT [D*H*W*T] with
    the dims in `shape` (the train step stores the volume 1-D: a 4-D jit
    parameter gets an XLA-chosen tiled layout that costs a full-volume
    relayout copy + reshape EVERY step before the flat gather, ~6.6 ms at
    192^3x12, profile_step_compact.json); xyz [N, 3] world; t [N] in
    [-1, 1]. Returns bool [N].
    """
    if alpha_volume.ndim == 1:
        D, H, W, T = shape
        flat_vol = alpha_volume
    else:
        D, H, W, T = alpha_volume.shape
        flat_vol = alpha_volume.reshape(-1)
    xyz_n = normalize_coord(xyz, mask_aabb)

    def near(u, n):
        # support matches the zero-padded trilinear's: g in (-1, n) can still
        # touch an in-bounds corner with nonzero weight (sample_grid3d's
        # per-corner masks); the clipped-round nearest voxel is then within
        # one cell of every such corner, which the pre-dilation covers
        g = (u + 1.0) * 0.5 * (n - 1)
        i = jnp.clip(jnp.round(g), 0, n - 1).astype(jnp.int32)
        return i, (g > -1.0) & (g < float(n))

    gx, ibx = near(xyz_n[:, 0], W)
    gy, iby = near(xyz_n[:, 1], H)
    gz, ibz = near(xyz_n[:, 2], D)
    inb = ibx & iby & ibz
    t_int = jnp.clip(jnp.round((t + 1.0) / 2.0 * (T - 1)).astype(jnp.int32), 0, T - 1)
    idx = ((gz * H + gy) * W + gx) * T + t_int
    v = flat_vol.at[idx].get(mode="promise_in_bounds")
    return (v > 0) & inb


def max_pool3d_same(vol: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """3D max pool, stride 1, same padding, over [D, H, W, T]
    (reference: tensorBase.py:599-600 F.max_pool3d(ks=3, pad=1, stride=1))."""
    pad = k // 2
    return jax.lax.reduce_window(
        vol,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(k, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(pad, pad)] * 3 + [(0, 0)],
    )


def update_alpha_mask(alpha: jnp.ndarray, aabb, thres: float):
    """Dense alpha [X, Y, Z, T] -> (AlphaGridMask, shrunken aabb)
    (reference: tensorBase.py:591-629).

    The volume axes are transposed X,Y,Z -> Z,Y,X to match the reference's
    grid_sample layout (alpha.transpose(0, 2)), then max-pooled and
    thresholded; the new aabb bounds the union of per-time occupied voxels.
    """
    gs = alpha.shape[:3]
    vol = jnp.clip(alpha, 0, 1).transpose(2, 1, 0, 3)  # [Z, Y, X, T]
    vol = max_pool3d_same(vol, 3)
    # uint8 storage: the volume holds only {0, 1}; f32 quadruples its HBM
    # footprint (a 192^3 x 12 volume is 340 MB f32 vs 85 MB u8) for no
    # precision — sample_alpha's trilinear weights promote to f32 anyway
    vol = (vol >= thres).astype(jnp.uint8)

    aabb = jnp.asarray(aabb)
    xs = jnp.linspace(aabb[0, 0], aabb[1, 0], gs[0])
    ys = jnp.linspace(aabb[0, 1], aabb[1, 1], gs[1])
    zs = jnp.linspace(aabb[0, 2], aabb[1, 2], gs[2])
    grid = jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"), -1)  # [X, Y, Z, 3]
    occupied = jnp.any(vol.transpose(2, 1, 0, 3) > 0.5, axis=-1)  # [X, Y, Z]

    big = jnp.where(occupied[..., None], grid, jnp.inf)
    small = jnp.where(occupied[..., None], grid, -jnp.inf)
    xyz_min = jnp.min(big.reshape(-1, 3), axis=0)
    xyz_max = jnp.max(small.reshape(-1, 3), axis=0)
    new_aabb = jnp.stack([xyz_min, xyz_max])

    return AlphaGridMask(aabb=aabb, alpha_volume=vol), new_aabb


def pack_alpha(mask: AlphaGridMask):
    """Bit-packed serialization (reference: tensorBase.py:465-469)."""
    vol = np.asarray(mask.alpha_volume) > 0.5
    return {
        "alphaMask.shape": vol.shape,
        "alphaMask.mask": np.packbits(vol.reshape(-1)),
        "alphaMask.aabb": np.asarray(mask.aabb),
    }


def unpack_alpha(d) -> AlphaGridMask:
    shape = tuple(d["alphaMask.shape"])
    length = int(np.prod(shape))
    vol = np.unpackbits(d["alphaMask.mask"])[:length].reshape(shape)  # uint8 {0,1}
    return AlphaGridMask(aabb=jnp.asarray(d["alphaMask.aabb"]), alpha_volume=jnp.asarray(vol))


def load_alpha_npz(path: str) -> AlphaGridMask:
    """Load a standalone packed-mask .npz (scripts/export_alpha.py output;
    npz keys replace '.' with '_')."""
    with np.load(path, allow_pickle=False) as f:
        return unpack_alpha(
            {
                "alphaMask.shape": f["alphaMask_shape"],
                "alphaMask.mask": f["alphaMask_mask"],
                "alphaMask.aabb": f["alphaMask_aabb"],
            }
        )


def dual_dense_alpha(
    params, static_cfg, dynamic_cfg, aabb, t_values, grid_size, chunk: int = 262144
) -> np.ndarray:
    """[X, Y, Z, T] dense alpha = max over the two fields, per time slice.

    The reference's getDenseAlpha (tensorBase.py:564-589) is single-field;
    for the DUAL model a sample is skippable only when BOTH fields are
    transparent there, so the mask volume takes max(alpha_static,
    alpha_dynamic(t)). Used by the update_AlphaMask_list training hook and
    scripts/export_alpha.py."""
    from ..ops.grid_sample import sample_vm_sum
    from . import dynamic as dyn
    from .static import feature2density

    xs = np.linspace(0, 1, grid_size[0], dtype=np.float32)
    ys = np.linspace(0, 1, grid_size[1], dtype=np.float32)
    zs = np.linspace(0, 1, grid_size[2], dtype=np.float32)
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)
    aabb_np = np.asarray(aabb)
    pts = aabb_np[0] * (1 - pts) + aabb_np[1] * pts
    step_s = static_cfg.step_size(aabb_np)
    step_d = dynamic_cfg.step_size(aabb_np)
    aabb_j = jnp.asarray(aabb_np)

    @jax.jit
    def alpha_static(p, xyz):
        xyz_n = dyn.normalize_coord(xyz, aabb_j)
        feat = sample_vm_sum(p["density_plane"], p["density_line"], xyz_n)
        return 1.0 - jnp.exp(-feature2density(feat, static_cfg) * step_s)

    @jax.jit
    def alpha_dynamic(p, xyz, t_value):
        xyz_n = dyn.normalize_coord(xyz, aabb_j)
        t = jnp.full(xyz.shape[0], t_value, jnp.float32)
        xyz_p = dyn.warp_coordinate(p, xyz, t, aabb_j)
        feat = dyn.density_feature(
            p, dynamic_cfg, xyz_n, t, dyn.normalize_coord(xyz_p, aabb_j)
        )
        return 1.0 - jnp.exp(-feature2density(feat, dynamic_cfg) * step_d)

    N = pts.shape[0]
    out = np.zeros((N, len(t_values)), np.float32)
    for s in range(0, N, chunk):
        e = min(s + chunk, N)
        block = pts[s:e]
        pad = chunk - block.shape[0]
        if pad:
            block = np.pad(block, ((0, pad), (0, 0)))
        xb = jnp.asarray(block)
        a_s = np.asarray(alpha_static(params["static"], xb))[: e - s]
        for ti, tv in enumerate(t_values):
            a_d = np.asarray(alpha_dynamic(params["dynamic"], xb, float(tv)))[: e - s]
            out[s:e, ti] = np.maximum(a_s, a_d)
    return out.reshape(tuple(grid_size) + (len(t_values),))


def build_dual_alpha_mask(
    params, static_cfg, dynamic_cfg, aabb, n_frames: int, thres: float,
    max_dim: int = 192,
) -> AlphaGridMask:
    """Dense dual-field alpha at the current grid (capped at max_dim per
    axis) -> thresholded AlphaGridMask (reference updateAlphaMask contract,
    tensorBase.py:591-629; aabb shrink is NOT applied — the dual model's
    static scene legitimately fills the NDC box)."""
    gs = [min(int(g), max_dim) for g in dynamic_cfg.grid_size]
    t_values = np.linspace(-1.0, 1.0, n_frames)
    alpha = dual_dense_alpha(params, static_cfg, dynamic_cfg, aabb, t_values, gs)
    mask, _ = update_alpha_mask(jnp.asarray(alpha), jnp.asarray(np.asarray(aabb)), thres)
    return mask
