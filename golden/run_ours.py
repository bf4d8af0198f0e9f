"""Run rodynrf_tpu on the same fixture/config/initialization/random-streams
as the recorded reference run (golden/run_reference.py), producing directly
comparable per-iteration loss trajectories.

Parity wiring:
  * same config file parsed by our reference-compatible parser
  * both fields' params imported from the reference's OWN initial state dicts
    (init_static.th / init_dynamic.th) — import_th exercises .th interop
  * ray batches replayed from the reference's recorded sampler streams
  * StepStatics.golden_det=True: constant 0.5 z-jitter, white-fill coin off —
    matching the torch.rand patch applied to the reference
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np

from rodynrf_tpu.data.video_dataset import load_nvidia_scene
from rodynrf_tpu.train.checkpoints import import_th
from rodynrf_tpu.train.config import config_parser
from rodynrf_tpu.train.step import init_opt_state
from rodynrf_tpu.train.trainer import Trainer

# our metric name -> reference TB tag
TAG_MAP = {
    "mse": "train/mse",
    "psnr": "train/PSNR",
    "img_d_loss": "train/img_d_loss",
    "img_s_loss": "train/img_s_loss",
    "mask_loss": "train/mask_loss",
    "skewed_mask_loss": "train/skewed_mask_loss",
    "mask_L1_reg_loss": "train/mask_L1_reg_loss",
    "skewed_mask_loss_rand": "train/skewed_mask_loss_rand",
    "novel_view_time_mask_loss": "train/novel_view_time_mask_loss",
    "novel_order_loss": "train/novel_order_loss",
    "order_loss": "train/order_loss",
    "flow_f_loss": "train/flow_f_loss",
    "flow_b_loss": "train/flow_b_loss",
    "disp_f_loss": "train/disp_f_loss",
    "disp_b_loss": "train/disp_b_loss",
    "small_scene_flow_loss": "train/small_scene_flow_loss",
    "smooth_scene_flow_loss": "train/smooth_scene_flow_loss",
    "total_mono_depth_loss_dynamic": "train/total_mono_depth_loss_dynamic",
    "total_mono_depth_loss_static": "train/total_mono_depth_loss_static",
    "loss_distortion": "train/loss_distortion",
    "loss_distortion_rand": "train/loss_distortion_rand",
    "loss_distortion_static": "train/loss_distortion_static",
    "flow_f_s_loss": "train/flow_f_s_loss",
    "flow_b_s_loss": "train/flow_b_s_loss",
    "disp_f_s_loss": "train/disp_f_s_loss",
    "disp_b_s_loss": "train/disp_b_s_loss",
    "disp_smooth_loss": "train/disp_smooth_loss",
    "focal": "train/focal_ratio_refine",
}


def inject_reference_init(trainer: Trainer):
    """Replace our random init with the reference's initial state dicts."""
    for name, cfg in (("static", trainer.static_cfg), ("dynamic", trainer.dynamic_cfg)):
        params, meta = import_th(os.path.join(HERE, "out", f"init_{name}.th"))
        mine = trainer.params[name]
        for key in params:
            assert key in mine, f"{name}: unknown param {key}"
        # shape check on the grids
        for i in range(3):
            a = np.asarray(params["density_plane"][i]).shape
            b = np.asarray(mine["density_plane"][i]).shape
            assert a == b, f"{name} density_plane[{i}]: ref {a} vs ours {b}"
        new = dict(mine)
        new.update(jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params))
        trainer.params = dict(trainer.params)
        trainer.params[name] = new
    trainer.params = jax.tree_util.tree_map(
        lambda x: jax.numpy.asarray(x), trainer.params
    )
    trainer.opt_state = init_opt_state(trainer.params)


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "tiny.txt")
    n_iters_cap = int(sys.argv[2]) if len(sys.argv) > 2 else None

    out_dir = os.environ.get("GOLDEN_OUT", os.path.join(HERE, "out"))
    args = config_parser(
        [
            "--config",
            cfg,
            "--datadir",
            os.path.join(HERE, "out", "fixture"),
            "--basedir",
            os.path.join(out_dir, "ours_log"),
        ]
    )
    args.golden_det = 1

    rec = np.load(os.path.join(out_dir, "ref_record.npz"))
    ray_idx, ray_idx_rand = rec["ray_idx"], rec["ray_idx_rand"]

    scene = load_nvidia_scene(
        args.datadir,
        downsample=args.downsample_train,
        use_disp=bool(args.use_disp),
        use_foreground_mask=args.use_foreground_mask,
        with_gt_poses=bool(args.with_GT_poses),
        ray_type=args.ray_type,
    )
    trainer = Trainer(args, scene)
    inject_reference_init(trainer)
    trainer.sampler_override = lambda i: (ray_idx[i], ray_idx_rand[i])

    n = min(args.n_iters, len(ray_idx))
    if n_iters_cap:
        n = min(n, n_iters_cap)
    scalars = {}
    for i in range(n):
        metrics = trainer.run_step()
        for k, v in metrics.items():
            tag = TAG_MAP.get(k, f"ours/{k}")
            scalars.setdefault(tag, []).append([i, float(v)])
        if (i + 1) % 50 == 0:
            print(f"iter {i + 1}/{n} total={float(metrics['total_loss']):.4f}")

    out = os.path.join(out_dir, "ours_scalars.json")
    with open(out, "w") as fh:
        json.dump(scalars, fh)
    print(f"ran {n} iterations -> {out}")

    # final params for the rendered-frame comparison
    from rodynrf_tpu.train.checkpoints import save_checkpoint

    save_checkpoint(
        os.path.join(out_dir, "ours_final.npz"),
        trainer.params,
        trainer.static_cfg,
        trainer.dynamic_cfg,
        np.asarray(trainer.aabb),
        extra={"iteration": trainer.iteration, "focal": float(trainer.focal_fixed)},
    )


if __name__ == "__main__":
    main()
