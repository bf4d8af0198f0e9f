#!/usr/bin/env python
"""Quality at the production operating point (VERDICT r3 item 4).

Two convergence runs on a 480x270 synthetic dynamic scene (12 frames) with
the PRODUCTION flags (bf16 tables, grad-accum auto, merged/auto layout,
sequential store):

  * "no_poses": the full 16^3 -> 640^3 voxel schedule of
    configs/Nvidia_no_poses.txt (reference train.py:2582-2606), upsample
    list scaled to the iteration budget, pose+focal optimization ON;
  * "gt_poses": the Nvidia.txt recipe's 128^3 -> 300^3 schedule with GT
    poses (optimize_poses=0), TV regularizers on.

Each run ends with a full evaluation over all frames (PSNR/SSIM/LPIPS via
eval/evaluation.py, the reference's final-eval contract train.py:2624-2638)
plus rgb/depth/dynamicness strips under golden/out_quality/. Writes
QUALITY.md and scripts/quality_full.json incrementally so a partial run
still records finished stages.

Run on the TPU:  python scripts/quality_full.py [n_iters=10000] [which]
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

N_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
WHICH = sys.argv[2] if len(sys.argv) > 2 else "both"
JSON_PATH = os.path.join(HERE, "quality_full.json")
OUT_ROOT = os.path.join(REPO, "golden", "out_quality")

T, H, W = 12, 270, 480

RUNS = {
    # full no-poses schedule: 16^3 -> 640^3 over 7 upsamples
    # (configs/Nvidia_no_poses.txt; fractions of n_iters chosen so the
    # late phases get enough steps to converge within the budget)
    "no_poses": dict(
        n_voxel_init=4096,
        n_voxel_final=262144000,
        upsamp_frac=[0.15, 0.30, 0.45, 0.60, 0.70, 0.80, 0.90],
        optimize=1,
        tv_density=0.0,
        tv_app=0.0,
        dist_static=0.01,
        psnr_floor=26.0,
    ),
    # GT-pose recipe: 128^3 -> 300^3 (configs/Nvidia.txt)
    "gt_poses": dict(
        n_voxel_init=2097156,
        n_voxel_final=27000000,
        upsamp_frac=[0.08, 0.12, 0.16, 0.22],
        optimize=0,
        tv_density=1.0,
        tv_app=1.0,
        dist_static=0.0,
        psnr_floor=28.0,
    ),
    # PRODUCTION-FEATURE run (VERDICT r4 item 8): the gt_poses recipe with
    # update_AlphaMask_list firing mid-run (0.3/0.6 of the budget, after the
    # last upsample so the dual-field mask is built at the final 300^3 grid)
    # and --compact_train ON — the occupancy-compacted [R, K] train step
    # (train/step.py) carries the remainder of the run, and the final eval
    # renders through the flat-compacted masked path (PERF.md §14). Gates
    # compaction's quality: the PSNR trajectory and final eval must match
    # the dense gt_poses run.
    "gt_poses_compact": dict(
        n_voxel_init=2097156,
        n_voxel_final=27000000,
        upsamp_frac=[0.08, 0.12, 0.16, 0.22],
        optimize=0,
        tv_density=1.0,
        tv_app=1.0,
        dist_static=0.0,
        psnr_floor=28.0,
        alpha_frac=[0.3, 0.6],
        compact_train=1,
    ),
}


def _save_json(out):
    with open(JSON_PATH, "w") as fh:
        json.dump(out, fh, indent=1)


def _strip(maps_list, key, path, norm=False):
    """Save a horizontal strip of per-frame maps as one PNG."""
    from PIL import Image

    imgs = []
    for m in maps_list:
        a = m[key]
        if norm:
            a = (a - a.min()) / max(a.max() - a.min(), 1e-6)
        if a.ndim == 2:
            a = np.stack([a] * 3, -1)
        imgs.append((np.clip(a, 0, 1) * 255).astype(np.uint8))
    Image.fromarray(np.concatenate(imgs, axis=1)).save(path)


def run(name: str, out: dict):
    from rodynrf_tpu.core.se3 import pose_to_mtx
    from rodynrf_tpu.data import make_synthetic_scene
    from rodynrf_tpu.eval.evaluation import evaluate
    from rodynrf_tpu.render.renderer import make_chunk_renderer, render_image
    from rodynrf_tpu.train import Trainer, parse_cmd

    cfg = RUNS[name]
    up = [max(1, int(N_ITERS * f)) for f in cfg["upsamp_frac"]]
    alpha_up = [max(1, int(N_ITERS * f)) for f in cfg.get("alpha_frac", [])]
    args = parse_cmd(
        f"--expname q_{name} --datadir none --dataset_name synthetic "
        f"--n_iters {N_ITERS} --batch_size 1024 --N_voxel_t {T} "
        f"--N_voxel_init {cfg['n_voxel_init']} --N_voxel_final {cfg['n_voxel_final']} "
        + " ".join(f"--upsamp_list {u}" for u in up)
        + "".join(f" --update_AlphaMask_list {u}" for u in alpha_up)
        + f" --compact_train {cfg.get('compact_train', 0)}"
        + f" --step_ratio 2.0 --ray_type ndc "
        f"--model_name TensorVMSplit_TimeEmbedding --shadingMode MLP_Fea_late_view "
        f"--shadingModeStatic MLP_Fea "
        f"--n_lamb_sigma 16 --n_lamb_sigma 4 --n_lamb_sigma 4 "
        f"--n_lamb_sh 48 --n_lamb_sh 12 --n_lamb_sh 12 "
        f"--fea2denseAct relu --view_pe 0 --fea_pe 0 "
        f"--TV_weight_density {cfg['tv_density']} --TV_weight_app {cfg['tv_app']} "
        f"--distortion_weight_static {cfg['dist_static']} "
        f"--distortion_weight_dynamic 0.01 "
        f"--optimize_poses {cfg['optimize']} "
        f"--optimize_focal_length {cfg['optimize']} --use_disp 1 --bf16 1"
    )
    scene = make_synthetic_scene(T=T, H=H, W=W)
    tr = Trainer(args, scene)

    t0 = time.time()
    psnr_curve = []
    alpha_set = set(alpha_up)
    for it in range(N_ITERS):
        m = tr.run_step()
        if (it + 1) in alpha_set:  # mirrors the train.py loop's firing
            tr.update_alpha_mask()
        if (it + 1) % 100 == 0:
            # bound the enqueue backlog: run_step does not block, and a
            # single fetch waiting behind >~4 min of enqueued device work
            # wedges this tunneled attachment (observed twice at the 300^3
            # dense phase with the 625-iter print cadence of a 25k budget)
            float(m["total_loss"])
        if (it + 1) % max(N_ITERS // 40, 1) == 0:
            p = float(m["psnr"])
            psnr_curve.append((it + 1, round(p, 2)))
            print(
                f"[{name}] iter {it+1}/{N_ITERS} grid "
                f"{'x'.join(map(str, tr.static_cfg.grid_size))} "
                f"train psnr {p:.2f} ({time.time()-t0:.0f}s)",
                flush=True,
            )
            out.setdefault(name, {})["psnr_curve"] = psnr_curve
            _save_json(out)
    wall = time.time() - t0

    # converged checkpoint (NOT committed — ~GB; the bench's masked-render
    # occupancy export scripts/export_alpha.py reads it)
    from rodynrf_tpu.train.checkpoints import save_checkpoint

    save_checkpoint(
        os.path.join(OUT_ROOT, name, "ckpt.npz"),
        tr.params, tr.static_cfg, tr.dynamic_cfg, np.asarray(tr.aabb),
        extra={"n_iters": N_ITERS, "run": name},
    )

    poses_mtx = np.asarray(pose_to_mtx(tr.params["pose"]))
    fov = float(np.asarray(tr.params["fov"])[0, 0])
    focal = max(H, W) / 2.0 / np.tan(fov) if cfg["optimize"] else tr.focal_fixed
    # production eval: when the run built an occupancy mask, the final eval
    # renders through the flat-compacted masked path (--compact_eval)
    render_chunk = make_chunk_renderer(
        tr.static_cfg, tr.dynamic_cfg, "ndc", tr.n_samples,
        tr.static_cfg.step_size(np.asarray(scene.scene_bbox)),
        alpha_mask=tr.alpha_mask, compact=tr.alpha_mask is not None,
    )
    save_path = os.path.join(OUT_ROOT, name, "imgs_test_all")
    PSNRs, _, _ = evaluate(
        render_chunk, tr.params, tr.aabb, poses_mtx, focal, scene, "ndc",
        save_path=save_path, n_vis=-1, compute_extra_metrics=True,
    )
    stats = np.atleast_1d(np.loadtxt(f"{save_path}/mean.txt"))

    # rgb / depth / dynamicness strips over 6 evenly-spaced frames
    ts_per_frame = np.linspace(-1.0, 1.0, T)
    frame_ids = np.linspace(0, T - 1, 6).astype(int)
    maps_list = [
        render_image(
            render_chunk, tr.params, tr.aabb, poses_mtx[i], focal,
            float(ts_per_frame[i]), H, W, "ndc",
        )
        for i in frame_ids
    ]
    strip_dir = os.path.join(OUT_ROOT, name)
    _strip(maps_list, "rgb", os.path.join(strip_dir, "strip_rgb.png"))
    _strip(maps_list, "depth", os.path.join(strip_dir, "strip_depth.png"), norm=True)
    _strip(maps_list, "blending", os.path.join(strip_dir, "strip_dynamicness.png"))

    res = {
        "n_iters": N_ITERS,
        "grid_final": list(tr.static_cfg.grid_size),
        "n_samples": int(tr.n_samples),
        "compact_k": int(tr.compact_k),
        "mask_occupancy": (
            round(float(np.asarray(tr.alpha_mask.alpha_volume).mean()), 4)
            if tr.alpha_mask is not None else None
        ),
        "grad_accum": int(tr._grad_accum()),
        "psnr_curve": psnr_curve,
        "eval_psnr": round(float(np.mean(PSNRs)), 2),
        # NaN -> None: lpips columns are NaN when no weights exist in the
        # environment (eval/metrics.py), and NaN is not valid JSON
        "eval_ssim": round(float(stats[1]), 4)
        if stats.size > 1 and np.isfinite(stats[1]) else None,
        "eval_lpips_alex": round(float(stats[2]), 4)
        if stats.size > 2 and np.isfinite(stats[2]) else None,
        "eval_lpips_vgg": round(float(stats[3]), 4)
        if stats.size > 3 and np.isfinite(stats[3]) else None,
        "wall_s": round(wall, 1),
        "floor": cfg["psnr_floor"],
    }
    out[name] = res
    _save_json(out)
    print(f"[{name}] {json.dumps(res)[:300]}", flush=True)
    return res


def write_md(out):
    lines = [
        "# QUALITY — production operating point (480x270, full schedules)",
        "",
        f"Synthetic dynamic scene, {T} frames at {W}x{H} (the Nvidia recipes'",
        "training resolution), trained with the PRODUCTION configuration:",
        "bf16 tables, sequential store, merged/auto gather layout, grad-accum",
        "auto. Full evaluation over all frames (PSNR/SSIM/LPIPS,",
        "eval/evaluation.py; reference final-eval contract train.py:2624-2638).",
        "",
        "| run | schedule | final grid | iters | eval PSNR | SSIM | LPIPS(alex) | wall |",
        "|---|---|---|---|---|---|---|---|",
    ]
    sched = {
        "no_poses": "16^3->640^3 (Nvidia_no_poses, 7 upsamples, pose+focal optim)",
        "gt_poses": "128^3->300^3 (Nvidia, GT poses, TV on)",
        "gt_poses_compact": (
            "128^3->300^3 + update_AlphaMask_list @0.3/0.6 + --compact_train "
            "(masked flat-compacted final eval)"
        ),
    }
    for name, r in out.items():
        if name not in RUNS or "eval_psnr" not in r:
            continue
        lines.append(
            f"| {name} | {sched[name]} | {'x'.join(map(str, r['grid_final']))} "
            f"| {r['n_iters']} | **{r['eval_psnr']} dB** (floor {r['floor']}) "
            f"| {r['eval_ssim']} | {r['eval_lpips_alex']} | {r['wall_s']}s |"
        )
    lines += [
        "",
        "Artifacts: per-frame renders + `strip_rgb.png` / `strip_depth.png` /",
        "`strip_dynamicness.png` under `golden/out_quality/<run>/`; curves in",
        "`scripts/quality_full.json`.",
        "",
        f"Device: {jax.devices()[0]}. Reproduce: `python scripts/quality_full.py {N_ITERS}`.",
        "",
    ]
    with open(os.path.join(REPO, "QUALITY.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote QUALITY.md")


def main():
    out = {}
    if os.path.exists(JSON_PATH):
        with open(JSON_PATH) as fh:
            out = json.load(fh)
    names = ["no_poses", "gt_poses"] if WHICH == "both" else [WHICH]
    for name in names:
        run(name, out)
    write_md(out)
    for name in names:
        assert out[name]["eval_psnr"] >= RUNS[name]["psnr_floor"], (
            f"{name} eval PSNR {out[name]['eval_psnr']} below floor"
        )


if __name__ == "__main__":
    main()
