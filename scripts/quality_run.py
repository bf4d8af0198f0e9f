#!/usr/bin/env python
"""Extended mixed-regime quality run (VERDICT r1 item 10).

Crosses ALL upsample stages on BOTH ray types with pose+focal optimization
enabled, thousands of iterations, so the schedule interactions the 14-iter
smoke can't see (focal activation at upsamp_list[3], half-time pose freeze,
TV decay, per-stage optimizer resets) are exercised; asserts final
full-evaluation PSNR floors and writes QUALITY.md.

Run on the TPU: python scripts/quality_run.py [n_iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
# floors chosen ~5 dB under the observed results so regressions trip, noise
# doesn't (round-1 smoke: 36.3 dB @2000 iters ndc on this scene family)
PSNR_FLOOR = {"ndc": 28.0, "contract": 24.0}


def run(ray_type: str):
    from rodynrf_tpu.data import make_synthetic_scene
    from rodynrf_tpu.eval.evaluation import evaluate
    from rodynrf_tpu.render.renderer import make_chunk_renderer
    from rodynrf_tpu.train import Trainer, parse_cmd

    T, H, W = 8, 96, 128
    up = [N_ITERS // 6, N_ITERS // 3, N_ITERS // 2, 2 * N_ITERS // 3]
    args = parse_cmd(
        f"--expname quality_{ray_type} --datadir none --dataset_name synthetic "
        f"--n_iters {N_ITERS} --batch_size 1024 --N_voxel_t {T} "
        f"--N_voxel_init {32**3} --N_voxel_final {128**3} "
        + " ".join(f"--upsamp_list {u}" for u in up)
        + f" --step_ratio 2.0 --ray_type {ray_type} "
        f"--model_name TensorVMSplit_TimeEmbedding --shadingMode MLP_Fea_late_view "
        f"--shadingModeStatic MLP_Fea "
        f"--n_lamb_sigma 16 --n_lamb_sigma 4 --n_lamb_sigma 4 "
        f"--n_lamb_sh 48 --n_lamb_sh 12 --n_lamb_sh 12 "
        f"--fea2denseAct relu --view_pe 0 --fea_pe 0 "
        f"--TV_weight_density 1.0 --TV_weight_app 1.0 --L1_weight_inital 8e-5 "
        f"--distortion_weight_static 0.01 --distortion_weight_dynamic 0.01 "
        f"--optimize_poses 1 --optimize_focal_length 1 --use_disp 1"
    )
    scene = make_synthetic_scene(T=T, H=H, W=W, ray_type=ray_type)
    tr = Trainer(args, scene)

    t0 = time.time()
    psnr_curve = []
    for it in range(N_ITERS):
        m = tr.run_step()
        if (it + 1) % max(N_ITERS // 20, 1) == 0:
            p = float(m["psnr"])
            psnr_curve.append((it + 1, round(p, 2)))
            print(f"[{ray_type}] iter {it+1}/{N_ITERS} train psnr {p:.2f}", flush=True)
    wall = time.time() - t0

    from rodynrf_tpu.core.se3 import pose_to_mtx

    poses_mtx = np.asarray(pose_to_mtx(tr.params["pose"]))
    fov = float(np.asarray(tr.params["fov"])[0, 0])
    focal = max(H, W) / 2.0 / np.tan(fov)
    render_chunk = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, ray_type, tr.n_samples,
        tr.static_cfg.step_size(np.asarray(scene.scene_bbox)),
    )
    save_path = f"/tmp/quality_{ray_type}/imgs_test_all"
    PSNRs, _, _ = evaluate(
        render_chunk, tr.params, tr.aabb, poses_mtx, focal, scene, ray_type,
        save_path=save_path, n_vis=-1, compute_extra_metrics=True,
    )
    stats = np.loadtxt(f"{save_path}/mean.txt")  # [psnr, ssim, lpips_a, lpips_v]
    stats = np.atleast_1d(stats)
    out = {
        "ray_type": ray_type,
        "n_iters": N_ITERS,
        "grid_final": list(tr.static_cfg.grid_size),
        "train_psnr_curve": psnr_curve,
        "eval_psnr_mean": round(float(np.mean(PSNRs)), 2),
        "eval_ssim_mean": round(float(stats[1]), 4) if stats.size > 1 else None,
        "wall_s": round(wall, 1),
        "floor": PSNR_FLOOR[ray_type],
    }
    print(json.dumps(out))
    assert out["eval_psnr_mean"] >= PSNR_FLOOR[ray_type], (
        f"{ray_type} eval PSNR {out['eval_psnr_mean']} below floor {PSNR_FLOOR[ray_type]}"
    )
    return out


def main():
    results = [run("ndc"), run("contract")]
    lines = [
        "# QUALITY — extended mixed-regime runs",
        "",
        f"Synthetic dynamic scene (8 frames, 96x128), {N_ITERS} iterations,",
        "full objective, pose+focal optimization, 32^3 -> 128^3 across 4",
        "upsamples (focal activation at upsamp_list[3], half-time pose freeze",
        "crossed). Full-evaluation metrics on all frames:",
        "",
        "| ray type | eval PSNR | eval SSIM | final grid | wall |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['ray_type']} | **{r['eval_psnr_mean']} dB** (floor {r['floor']}) "
            f"| {r['eval_ssim_mean']} | {'x'.join(map(str, r['grid_final']))} "
            f"| {r['wall_s']}s |"
        )
    lines += [
        "",
        f"Device: {jax.devices()[0]}. Reproduce: `python scripts/quality_run.py {N_ITERS}`.",
        "",
    ]
    with open(os.path.join(REPO, "QUALITY.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote QUALITY.md")


if __name__ == "__main__":
    main()
