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

from rodynrf_tpu.fields.alpha_mask import (  # noqa: E402
    dual_dense_alpha,
    pack_alpha,
    update_alpha_mask,
)
from rodynrf_tpu.train.checkpoints import load_checkpoint  # noqa: E402


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
