#!/usr/bin/env python
"""CLI entry point — surface-compatible with the reference's train.py.

    python train.py --config configs/DAVIS.txt
    python train.py --config ... --render_only 1 --render_test 1 --render_path 1
    python train.py --config ... --export_mesh 1 --ckpt log/exp/exp.npz

Dispatch mirrors reference train.py:2661-2675 (export_mesh | render_only |
reconstruction).
"""

from __future__ import annotations

import os
import sys

# JAX setup must precede jax import side effects in library code.
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import numpy as np

# The axon TPU plugin takes precedence over the JAX_PLATFORMS env var; apply
# it through the config API so `JAX_PLATFORMS=cpu python train.py ...`
# actually forces the CPU backend on TPU-attached machines.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rodynrf_tpu.data.video_dataset import load_scene
from rodynrf_tpu.eval.evaluation import evaluate, export_poses_bounds
from rodynrf_tpu.eval.paths import evaluation_path, generate_path
from rodynrf_tpu.render.renderer import make_chunk_renderer
from rodynrf_tpu.train.checkpoints import export_th, load_checkpoint, save_checkpoint
from rodynrf_tpu.train.config import config_parser
from rodynrf_tpu.train.trainer import Trainer
from rodynrf_tpu.core.se3 import pose_to_mtx
from rodynrf_tpu.fields.config import cal_n_samples


def _tb_writer(logfolder, disabled):
    if disabled:
        class Dummy:
            def add_scalar(self, *a, **k): ...
            def add_images(self, *a, **k): ...
            def close(self): ...
        return Dummy()
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(logfolder)
    except Exception:
        class Dummy:
            def add_scalar(self, *a, **k): ...
            def add_images(self, *a, **k): ...
            def close(self): ...
        return Dummy()


def _current_cameras(trainer):
    poses_mtx = np.asarray(pose_to_mtx(trainer.params["pose"]))
    if trainer.args.optimize_focal_length:
        fov = float(np.asarray(trainer.params["fov"])[0, 0])
        focal = max(trainer.H, trainer.W) / 2.0 / np.tan(fov)
    else:
        focal = trainer.focal_fixed
    return poses_mtx, float(focal)


def _save_ckpts(trainer, logfolder, expname):
    poses_mtx, focal = _current_cameras(trainer)
    save_checkpoint(
        f"{logfolder}/{expname}.npz",
        {k: trainer.params[k] for k in ("static", "dynamic", "pose", "fov")},
        trainer.static_cfg,
        trainer.dynamic_cfg,
        np.asarray(trainer.aabb),
        extra={"focal": focal, "iteration": trainer.iteration},
        alpha_mask=trainer.alpha_mask,
    )
    if trainer.args.export_th:
        try:
            export_th(
                f"{logfolder}/{expname}.th", trainer.params["dynamic"],
                trainer.dynamic_cfg, np.asarray(trainer.aabb), poses_mtx, focal,
                dynamic=True, alpha_mask=trainer.alpha_mask,
            )
            export_th(
                f"{logfolder}/{expname}_static.th", trainer.params["static"],
                trainer.static_cfg, np.asarray(trainer.aabb), poses_mtx, focal,
                dynamic=False,
            )
        except Exception as e:  # torch optional
            print(f"[warn] .th export skipped: {e}")


def _tb_vis_images(trainer, scene, args, writer, it):
    """Render test views into TensorBoard with the reference's full image
    families (reference: train.py:2428-2580 + renderer.py:318-657):
    rgb/depth full+static+dynamic, blending, GT rgb/flow/mask, induced
    dynamic & static fwd/bwd flows, Δxyz map, monodepth."""
    from rodynrf_tpu.eval.metrics import visualize_depth_numpy
    from rodynrf_tpu.render.renderer import make_vis_chunk_renderer, render_image_vis
    from rodynrf_tpu.utils.flow_viz import flow_to_image

    H, W = trainer.H, trainer.W
    poses_mtx, focal = _current_cameras(trainer)
    render_chunk_vis = make_vis_chunk_renderer(
        trainer.static_cfg, trainer.dynamic_cfg, args.ray_type, trainer.n_samples,
        trainer.static_cfg.step_size(np.asarray(scene.scene_bbox)), H, W,
    )

    n_vis = min(args.N_vis if args.N_vis > 0 else scene.n_frames, scene.n_frames)
    idxs = np.linspace(0, scene.n_frames - 1, n_vis).astype(int)
    ts = np.linspace(-1, 1, scene.n_frames) if scene.n_frames > 1 else np.zeros(1)
    params = {"static": trainer.params["static"], "dynamic": trainer.params["dynamic"]}
    T = scene.n_frames

    frames = []
    for i in idxs:
        pose_f = poses_mtx[min(i + 1, T - 1)]
        pose_b = poses_mtx[max(i - 1, 0)]
        frames.append(
            render_image_vis(
                render_chunk_vis, params, trainer.aabb, poses_mtx[i], pose_f, pose_b,
                focal, float(ts[i]), H, W, args.ray_type,
            )
        )

    def grid(key):
        return np.stack([f[key] for f in frames])

    def images(tag, arr):
        writer.add_images(f"test/{tag}", arr, global_step=it, dataformats="NHWC")

    images("rgb_maps", np.clip(grid("rgb"), 0, 1))
    images("rgb_maps_s", np.clip(grid("rgb_s"), 0, 1))
    images("rgb_maps_d", np.clip(grid("rgb_d"), 0, 1))
    images("blending_maps", np.repeat(np.clip(grid("blending"), 0, 1)[..., None], 3, -1))

    # depth families share one global min/max (reference: renderer.py:617-640)
    depth_fams = {k: grid(k) for k in ("depth", "depth_s", "depth_d")}
    all_depth = np.stack(list(depth_fams.values()))
    minmax = (float(all_depth.min()), float(all_depth.max()))
    for tag, fam in zip(("depth_map", "depth_map_s", "depth_map_d"), depth_fams.values()):
        images(tag, np.stack([visualize_depth_numpy(d, minmax)[0] / 255.0 for d in fam]))

    # induced flows (reference: renderer.py:585-611)
    for tag in ("induced_flow_f", "induced_flow_b", "induced_flow_s_f", "induced_flow_s_b"):
        images(tag, np.stack([flow_to_image(f[tag]) / 255.0 for f in frames]))

    # weighted scene-flow displacement, normalized (reference: renderer.py:612-615)
    deltas = grid("delta_xyz_sum")
    delta_imgs = [(d / max(np.abs(d).max(), 1e-12) + 1.0) / 2.0 for d in deltas]
    images("delta_xyz_tb", np.stack(delta_imgs))

    # GT families (reference: train.py:2540-2580 + renderer.py:641-643)
    if scene.rgbs_stack is not None:
        images("gt_maps", scene.rgbs_stack[idxs])
    if scene.flows_f is not None and scene.flows_b is not None:
        gt_flows_f = scene.flows_f.reshape(T, H, W, 2)
        gt_flows_b = scene.flows_b.reshape(T, H, W, 2)
        images("gt_flow_f", np.stack([flow_to_image(f) / 255.0 for f in gt_flows_f[idxs]]))
        images("gt_flow_b", np.stack([flow_to_image(f) / 255.0 for f in gt_flows_b[idxs]]))
    else:
        print("[vis] scene has no GT flows; skipping gt_flow_f/gt_flow_b")
    if scene.fg_masks is not None:
        gt_masks = scene.fg_masks.reshape(T, H, W)[idxs]
        images("gt_blending_maps", np.repeat(gt_masks[..., None], 3, -1))
    else:
        print("[vis] scene has no GT masks; skipping gt_blending_maps")
    if scene.disps is not None:
        disps = scene.disps.reshape(T, H, W)[idxs]
        images(
            "monodepth_tb",
            np.stack([visualize_depth_numpy(d)[0] / 255.0 for d in disps]),
        )
    else:
        print("[vis] scene has no monodepth; skipping monodepth_tb")


def reconstruction(args):
    scene = load_scene(args)
    logfolder = f"{args.basedir}/{args.expname}"
    os.makedirs(logfolder, exist_ok=True)
    writer = _tb_writer(args.tblogdir or logfolder, args.no_tensorboard)

    trainer = Trainer(args, scene)
    print(f"grid {trainer.static_cfg.grid_size}, nSamples {trainer.n_samples}, "
          f"rays {scene.n_rays}, devices {jax.device_count()}")

    import time

    t0 = time.time()
    window = []
    update_alpha_iters = set(args.update_AlphaMask_list)
    for it in range(args.n_iters):
        metrics = trainer.run_step()
        # occupancy-mask refresh (the reference parses update_AlphaMask_list
        # but never reads it, opt.py:211; functional here — the mask feeds
        # the eval/render early-out, checkpoints, and, with --compact_train,
        # the train step's [R, K] sample compaction)
        if (it + 1) in update_alpha_iters:
            trainer.update_alpha_mask()
        if (it + 1) % args.progress_refresh_rate == 0:
            host = {k: float(v) for k, v in metrics.items()}
            window.append(host["psnr"])
            dt = time.time() - t0
            rays_s = args.batch_size * (it + 1) / dt
            print(
                f"iter {it+1:06d} loss {host['total_loss']:.4f} "
                f"psnr {np.mean(window[-10:]):.2f} rays/s {rays_s:,.0f}"
            )
            for k, v in host.items():
                writer.add_scalar(f"train/{k}", v, it)
            # pose diagnostics vs GT (reference: train.py:2365-2415 logs
            # Procrustes-aligned camera errors)
            if args.with_GT_poses and args.optimize_poses and scene.poses is not None:
                from rodynrf_tpu.core.se3 import evaluate_camera_alignment, prealign_cameras

                poses_now = pose_to_mtx(trainer.params["pose"])
                aligned, _ = prealign_cameras(poses_now, np.asarray(scene.poses))
                R_err, t_err = evaluate_camera_alignment(aligned, np.asarray(scene.poses))
                writer.add_scalar("train/pose_R_error_deg", float(np.mean(R_err)) * 180 / np.pi, it)
                writer.add_scalar("train/pose_t_error", float(np.mean(t_err)), it)
                # camera wireframe figure (reference: train.py:2365-2415)
                try:
                    from rodynrf_tpu.utils.camera_vis import camera_pose_figure

                    img = camera_pose_figure(np.asarray(aligned), np.asarray(scene.poses))
                    writer.add_images(
                        "camera_poses", img[None] / 255.0, global_step=it, dataformats="NHWC"
                    )
                except ImportError:
                    pass  # matplotlib optional; all other vis paths stay hard-failing
        if (it + 1) % 10000 == 0:
            _save_ckpts(trainer, logfolder, args.expname)

        # train-time TB visualization (reference: train.py:2428-2580).
        # Failures propagate: a broken vis path must fail the run, not warn.
        if args.N_vis != 0 and (it + 1) % args.vis_train_every == 0:
            _tb_vis_images(trainer, scene, args, writer, it)

    _save_ckpts(trainer, logfolder, args.expname)

    # final evaluation (train.py:2623-2641)
    poses_mtx, focal = _current_cameras(trainer)
    render_chunk = make_chunk_renderer(
        trainer.static_cfg, trainer.dynamic_cfg, args.ray_type, trainer.n_samples,
        trainer.static_cfg.step_size(np.asarray(scene.scene_bbox)),
        alpha_mask=trainer.alpha_mask, compact=bool(args.compact_eval),
    )
    PSNRs, near_fars, _ = evaluate(
        render_chunk, trainer.params, trainer.aabb, poses_mtx, focal, scene,
        args.ray_type, save_path=f"{logfolder}/imgs_test_all", n_vis=-1,
        compute_extra_metrics=True,  # PSNR+SSIM(+LPIPS if available), train.py:2624
    )
    if PSNRs:
        print(f"======> {args.expname} train all psnr: {np.mean(PSNRs)} <========")
    export_poses_bounds(
        os.path.join(args.datadir, "poses_bounds_RoDynRF.npy")
        if os.path.isdir(args.datadir)
        else f"{logfolder}/poses_bounds_RoDynRF.npy",
        poses_mtx, focal, trainer.H, trainer.W, args.downsample_train, near_fars,
    )


def _load_reference_th_pair(ckpt_path):
    """Load a reference-format checkpoint pair ({exp}.th + {exp}_static.th)
    into our params/configs (the reference render path, train.py:435-449).

    The optimized poses/focal travel inside the kwargs of both files
    (tensorBase.py:460-463)."""
    from rodynrf_tpu.train.checkpoints import import_th
    from rodynrf_tpu.fields.config import FieldConfig

    dyn_params, dyn_meta = import_th(ckpt_path)
    static_path = ckpt_path.replace(".th", "_static.th")
    stat_params, stat_meta = import_th(static_path)
    alpha_mask = dyn_meta.get("alpha_mask")

    def cfg_from_kwargs(kw):
        return FieldConfig(
            grid_size=tuple(int(g) for g in kw["gridSize"]),
            t_size=int(kw["tSize"]),
            density_n_comp=tuple(kw["density_n_comp"]),
            app_n_comp=tuple(kw["appearance_n_comp"]),
            app_dim=int(kw["app_dim"]),
            shading_mode=kw["shadingMode"],
            density_shift=float(kw["density_shift"]),
            alpha_mask_thres=float(kw["alphaMask_thres"]),
            distance_scale=float(kw["distance_scale"]),
            ray_march_weight_thres=float(kw["rayMarch_weight_thres"]),
            fea2dense_act=kw["fea2denseAct"],
            near_far=tuple(float(x) for x in kw["near_far"]),
            step_ratio=float(kw["step_ratio"]),
            pos_pe=int(kw["pos_pe"]),
            view_pe=int(kw["view_pe"]),
            fea_pe=int(kw["fea_pe"]),
            featureC=int(kw["featureC"]),
        )

    kw = dyn_meta["kwargs"]
    aabb = np.asarray(kw["aabb"], np.float32)
    poses_mtx = np.asarray(kw["se3_poses"], np.float32)
    focal = float(np.asarray(kw["focal_ratio_refine"]))
    params = {"static": stat_params, "dynamic": dyn_params}
    return (params, cfg_from_kwargs(stat_meta["kwargs"]), cfg_from_kwargs(kw), aabb,
            poses_mtx, focal, alpha_mask)


def render_test(args, logfolder):
    scene = load_scene(args)
    ckpt_path = args.ckpt or f"{logfolder}/{args.expname}.npz"
    if ckpt_path.endswith(".th"):
        (params, static_cfg, dynamic_cfg, aabb, poses_mtx, focal,
         alpha_mask) = _load_reference_th_pair(ckpt_path)
    else:
        params, static_cfg, dynamic_cfg, aabb, extra, alpha_mask = load_checkpoint(
            ckpt_path, return_alpha=True
        )
        poses_mtx = np.asarray(pose_to_mtx(np.asarray(params["pose"])))
        focal = extra.get("focal")
    if args.alpha_mask:
        from rodynrf_tpu.fields.alpha_mask import load_alpha_npz

        alpha_mask = load_alpha_npz(args.alpha_mask)
    n_samples = min(args.nSamples, cal_n_samples(static_cfg.grid_size, args.step_ratio))
    step_size = static_cfg.step_size(aabb)
    render_chunk = make_chunk_renderer(
        static_cfg, dynamic_cfg, args.ray_type, n_samples, step_size,
        alpha_mask=alpha_mask, compact=bool(args.compact_eval),
    )

    near_fars = None
    if args.render_test or args.render_train:
        os.makedirs(f"{logfolder}/imgs_test_all", exist_ok=True)
        PSNRs, near_fars, _ = evaluate(
            render_chunk, params, aabb, poses_mtx, focal, scene, args.ray_type,
            save_path=f"{logfolder}/imgs_test_all", n_vis=-1,
            compute_extra_metrics=True,
        )
        if PSNRs:
            print(f"test psnr: {np.mean(PSNRs):.3f}")

    if args.render_path:
        # pick center-most pose (train.py:499-507)
        centers = poses_mtx[:, :, 3]
        mean_c = centers.mean(0)
        idx_center = int(np.argmin(np.sum((centers - mean_c) ** 2, -1)))
        if near_fars is None:
            _, near_fars, _ = evaluate(
                render_chunk, params, aabb, poses_mtx, focal, scene, args.ray_type,
                save_path=None, n_vis=-1,
            )
        # scene scale from rendered near bound (train.py:509)
        sc = float(near_fars[idx_center][0]) * 0.75
        paths = generate_path(poses_mtx[idx_center], focal, sc, scene.n_frames)
        for name, (poses_p, focals_p) in paths.items():
            change_time = "change" if name in ("fix_view", "change_view_time") else 0.0
            evaluation_path(
                render_chunk, params, aabb, poses_p, focals_p, scene, args.ray_type,
                f"{logfolder}/{name}", change_time=change_time,
            )


def export_mesh(args):
    from rodynrf_tpu.eval.mesh import export_mesh_from_ckpt

    export_mesh_from_ckpt(args.ckpt, args.ckpt.rsplit(".", 1)[0] + ".ply")


if __name__ == "__main__":
    args = config_parser()
    np.random.seed(args.seed)
    print(args)

    if args.export_mesh:
        export_mesh(args)

    if args.render_only and (args.render_test or args.render_path):
        render_test(args, os.path.join(args.basedir, args.expname))
    elif not args.export_mesh:
        reconstruction(args)
