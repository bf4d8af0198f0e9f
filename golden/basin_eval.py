#!/usr/bin/env python
"""Basin experiment (round-2 VERDICT #6): does the skewed-mask double-well
divergence change FINAL quality?

The 260-iteration golden trajectory showed the two implementations settling
into different basins of the skewed-mask objective (reference dynamicness
→1e-6, ours →1e-2) with gradients identical at 2.3e-05. This script settles
the question empirically: after 2,000 deterministic-identical iterations
(same recorded ray batches, same determinized draws, same init —
golden/run_reference.py + run_ours.py with golden/basin.txt), it renders
BOTH final checkpoints' test views through the SAME native renderer and
compares eval PSNR/SSIM plus the rendered dynamicness statistics.

Usage (after the two runs):
    GOLDEN_OUT=golden/out_basin python golden/basin_eval.py
Writes golden/out_basin/basin_metrics.json.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

OUT = os.environ.get("GOLDEN_OUT", os.path.join(HERE, "out_basin"))


def _metrics_for(tag, params, static_cfg, dynamic_cfg, aabb, poses_mtx, focal,
                 scene, n_samples, step_size):
    from rodynrf_tpu.eval.metrics import rgb_ssim
    from rodynrf_tpu.render.renderer import make_chunk_renderer, render_image

    render_chunk = make_chunk_renderer(
        static_cfg, dynamic_cfg, "ndc", n_samples, step_size
    )
    W, H = scene.img_wh
    T = poses_mtx.shape[0]
    ts = np.linspace(-1.0, 1.0, scene.n_frames) if scene.n_frames > 1 else [0.0]
    gt = scene.rgbs.reshape(T, H, W, 3)
    psnrs, ssims, dyn_means, dyn_fracs = [], [], [], []
    for i in range(T):
        maps = render_image(
            render_chunk, params, aabb, poses_mtx[i], focal, float(ts[i]),
            H, W, "ndc", chunk=4096,
        )
        mse = float(np.mean((maps["rgb"] - gt[i]) ** 2))
        psnrs.append(-10.0 * np.log10(mse))
        ssims.append(rgb_ssim(maps["rgb"], gt[i], 1.0))
        dyn_means.append(float(np.mean(maps["blending"])))
        dyn_fracs.append(float(np.mean(maps["blending"] > 0.5)))
    res = {
        "psnr_mean": float(np.mean(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
        "psnr_per_view": [round(p, 3) for p in psnrs],
        "dynamicness_mean": float(np.mean(dyn_means)),
        "dynamicness_frac_gt_0.5": float(np.mean(dyn_fracs)),
    }
    print(tag, json.dumps({k: round(v, 4) for k, v in res.items()
                           if not isinstance(v, list)}), flush=True)
    return res


def main():
    sys.path.insert(0, REPO)
    import importlib

    train_mod = importlib.import_module("train")
    from rodynrf_tpu.data.video_dataset import load_nvidia_scene
    from rodynrf_tpu.fields.config import cal_n_samples
    from rodynrf_tpu.train.checkpoints import load_checkpoint
    from rodynrf_tpu.core.se3 import pose_to_mtx

    scene = load_nvidia_scene(
        os.path.join(HERE, "out", "fixture"),
        downsample=1.0, use_disp=True, use_foreground_mask="motion_masks",
        with_gt_poses=True, ray_type="ndc",
    )

    results = {}

    # reference final checkpoint (its own training, rendered by OUR renderer)
    ref_th = os.path.join(OUT, "ref_log", "golden_basin", "golden_basin.th")
    params_r, scfg_r, dcfg_r, aabb_r, poses_r, focal_r = (
        train_mod._load_reference_th_pair(ref_th)
    )
    n_samples = cal_n_samples(scfg_r.grid_size, 2.0)
    step_size = scfg_r.step_size(aabb_r)
    results["reference"] = _metrics_for(
        "reference", params_r, scfg_r, dcfg_r, aabb_r, poses_r, focal_r,
        scene, n_samples, step_size,
    )

    # ours
    ours_npz = os.path.join(OUT, "ours_final.npz")
    params_o, scfg_o, dcfg_o, aabb_o, extra = load_checkpoint(ours_npz)
    poses_o = np.asarray(pose_to_mtx(np.asarray(params_o["pose"])))
    focal_o = extra.get("focal", focal_r)
    results["ours"] = _metrics_for(
        "ours", {"static": params_o["static"], "dynamic": params_o["dynamic"]},
        scfg_o, dcfg_o, aabb_o, poses_o, focal_o, scene,
        cal_n_samples(scfg_o.grid_size, 2.0), scfg_o.step_size(np.asarray(aabb_o)),
    )

    results["delta"] = {
        "psnr": round(results["ours"]["psnr_mean"] - results["reference"]["psnr_mean"], 4),
        "ssim": round(results["ours"]["ssim_mean"] - results["reference"]["ssim_mean"], 5),
    }
    with open(os.path.join(OUT, "basin_metrics.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print("delta", json.dumps(results["delta"]))


if __name__ == "__main__":
    main()
