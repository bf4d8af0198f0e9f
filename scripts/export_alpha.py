#!/usr/bin/env python
"""Export a dual-field occupancy (alpha) mask from a converged checkpoint.

The reference's eval renderer skips samples whose AlphaGridMask bit is 0
(tensorBase.py:745-765); its mask is built from the dense alpha volume
(getDenseAlpha/updateAlphaMask, tensorBase.py:564-629). For the DUAL model a
sample is skippable only when BOTH fields are transparent there, so this
export takes max(alpha_static, alpha_dynamic(t)) per time slice before
thresholding.

The packed mask (a few MB) is the honest occupancy source for the
masked-render benchmark (bench.py): it comes from a real converged scene,
not a hand-picked sparsity number.

Usage: python scripts/export_alpha.py golden/out_quality/no_poses/ckpt.npz \
           [out.npz] [max_dim=192] [thres=1e-4]
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax

# the axon TPU plugin takes precedence over the JAX_PLATFORMS env var;
# apply it through the config API so `JAX_PLATFORMS=cpu ...` works
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rodynrf_tpu.fields import dynamic as dyn  # noqa: E402
from rodynrf_tpu.fields.alpha_mask import pack_alpha, update_alpha_mask  # noqa: E402
from rodynrf_tpu.fields.static import feature2density  # noqa: E402
from rodynrf_tpu.ops.grid_sample import sample_vm_sum  # noqa: E402
from rodynrf_tpu.train.checkpoints import load_checkpoint  # noqa: E402


def dual_dense_alpha(params, static_cfg, dynamic_cfg, aabb, t_values, grid_size, chunk=262144):
    """[X, Y, Z, T] alpha = max over the two fields, per time slice."""
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
        feat = dyn.density_feature(p, dynamic_cfg, xyz_n, t, dyn.normalize_coord(xyz_p, aabb_j))
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


def main():
    ckpt = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(ckpt), "alpha_mask.npz"
    )
    max_dim = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    thres = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-4

    params, static_cfg, dynamic_cfg, aabb, extra = load_checkpoint(ckpt)
    n_t = int(extra.get("n_frames", 12)) if isinstance(extra, dict) else 12
    gs = [min(int(g), max_dim) for g in dynamic_cfg.grid_size]
    t_values = np.linspace(-1.0, 1.0, n_t)

    alpha = dual_dense_alpha(params, static_cfg, dynamic_cfg, aabb, t_values, gs)
    mask, new_aabb = update_alpha_mask(jnp.asarray(alpha), aabb, thres)
    occ = float(np.asarray(mask.alpha_volume).mean())
    packed = pack_alpha(mask)
    np.savez_compressed(
        out_path,
        **{k.replace(".", "_"): v for k, v in packed.items()},
        occupancy=np.float32(occ),
        meta=json.dumps({"ckpt": os.path.basename(ckpt), "grid": gs, "thres": thres}),
    )
    print(json.dumps({"out": out_path, "grid": gs, "occupancy": round(occ, 4),
                      "new_aabb": np.asarray(new_aabb).tolist()}))


if __name__ == "__main__":
    main()
