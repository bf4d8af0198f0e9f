"""CLI/config-file surface — flag-parity with the reference's opt.py.

Reads the same flat ``key = value`` config files the reference ships
(reference: opt.py:6-242, configs/*.txt) including ``--config`` + CLI
overrides and ``[a, b, c]`` list syntax, without the configargparse
dependency. Known-dead reference flags (`update_AlphaMask_list`, the
unimplemented model names — SURVEY.md §2.1) are accepted for compatibility.
"""

from __future__ import annotations

import argparse
import shlex
from typing import List, Optional, Sequence


def _strip_comment(line: str) -> str:
    out = []
    for part in line.split("#"):
        out.append(part)
        break
    return out[0]


def _parse_config_file(path: str) -> List[str]:
    """Flat `key = value` file -> argv fragments (reference config format)."""
    argv: List[str] = []
    with open(path) as f:
        for raw in f:
            line = _strip_comment(raw).strip()
            if not line or "=" not in line:
                continue
            key, val = line.split("=", 1)
            key, val = key.strip(), val.strip()
            if val.startswith("[") and val.endswith("]"):
                items = [v.strip() for v in val[1:-1].split(",") if v.strip()]
                for item in items:
                    argv += [f"--{key}", item]
            else:
                argv += [f"--{key}", val]
    return argv


def config_parser(cmd: Optional[Sequence[str]] = None) -> argparse.Namespace:
    """Argument surface mirroring reference opt.py:6-242."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None, help="config file path")
    parser.add_argument("--expname", type=str)
    parser.add_argument("--basedir", type=str, default="./log")
    parser.add_argument("--tblogdir", type=str, default=None)
    parser.add_argument("--add_timestamp", type=int, default=0)
    parser.add_argument("--datadir", type=str, default="./data/llff/fern")
    parser.add_argument("--progress_refresh_rate", type=int, default=10)

    parser.add_argument("--with_depth", action="store_true")
    parser.add_argument("--downsample_train", type=float, default=1.0)
    parser.add_argument("--downsample_test", type=float, default=1.0)

    parser.add_argument(
        "--model_name",
        type=str,
        default="TensorVMSplit",
        choices=["TensorVMSplit", "TensorCP", "TensorVMVt", "TensorMMt", "TensorVMSplit_TimeEmbedding"],
    )

    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--n_iters", type=int, default=30000)
    parser.add_argument("--dataset_name", type=str, default="nvidia",
                        choices=["nvidia", "davis", "synthetic"])

    parser.add_argument("--lr_init", type=float, default=0.02)
    parser.add_argument("--lr_basis", type=float, default=1e-3)
    parser.add_argument("--lr_decay_iters", type=int, default=-1)
    parser.add_argument("--lr_decay_target_ratio", type=float, default=0.1)
    parser.add_argument("--lr_upsample_reset", type=int, default=1)

    parser.add_argument("--L1_weight_inital", type=float, default=0.0)
    parser.add_argument("--L1_weight_rest", type=float, default=0.0)
    parser.add_argument("--Ortho_weight", type=float, default=0.0)
    parser.add_argument("--TV_weight_density", type=float, default=0.0)
    parser.add_argument("--TV_weight_app", type=float, default=0.0)
    parser.add_argument("--distortion_weight_static", type=float, default=0.0)
    parser.add_argument("--distortion_weight_dynamic", type=float, default=0.0)
    parser.add_argument("--monodepth_weight_static", type=float, default=0.04)
    parser.add_argument("--monodepth_weight_dynamic", type=float, default=0.04)
    parser.add_argument("--smooth_scene_flow_weight", type=float, default=0.1)
    parser.add_argument("--small_scene_flow_weight", type=float, default=0.1)

    parser.add_argument("--n_lamb_sigma", type=int, action="append")
    parser.add_argument("--n_lamb_sh", type=int, action="append")
    parser.add_argument("--data_dim_color", type=int, default=27)

    parser.add_argument("--rm_weight_mask_thre", type=float, default=0.0001)
    parser.add_argument("--alpha_mask_thre", type=float, default=0.0001)
    parser.add_argument("--distance_scale", type=float, default=25.0)
    parser.add_argument("--density_shift", type=float, default=-10.0)

    parser.add_argument("--shadingMode", type=str, default="MLP_PE")
    parser.add_argument("--shadingModeStatic", type=str, default="MLP_Fea_TimeEmbedding")
    parser.add_argument("--pos_pe", type=int, default=6)
    parser.add_argument("--view_pe", type=int, default=6)
    parser.add_argument("--fea_pe", type=int, default=6)
    parser.add_argument("--featureC", type=int, default=128)

    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--render_only", type=int, default=0)
    parser.add_argument("--render_test", type=int, default=0)
    parser.add_argument("--render_train", type=int, default=0)
    parser.add_argument("--render_path", type=int, default=0)
    parser.add_argument("--export_mesh", type=int, default=0)
    parser.add_argument("--no_tensorboard", type=int, default=0)

    parser.add_argument("--lindisp", default=False, action="store_true")
    parser.add_argument("--perturb", type=float, default=1.0)
    parser.add_argument("--accumulate_decay", type=float, default=0.998)
    parser.add_argument("--fea2denseAct", type=str, default="softplus")
    parser.add_argument("--ray_type", type=str, default="ndc", choices=["ndc", "contract"])
    parser.add_argument("--nSamples", type=int, default=int(1e6))
    parser.add_argument("--step_ratio", type=float, default=0.5)

    parser.add_argument("--white_bkgd", action="store_true")
    parser.add_argument("--N_voxel_init", type=int, default=100**3)
    parser.add_argument("--N_voxel_final", type=int, default=300**3)
    parser.add_argument("--N_voxel_t", type=int, default=12)
    parser.add_argument("--upsamp_list", type=int, action="append")
    parser.add_argument("--update_AlphaMask_list", type=int, action="append")

    parser.add_argument("--idx_view", type=int, default=0)
    parser.add_argument("--N_vis", type=int, default=5)
    parser.add_argument("--vis_every", type=int, default=10000)
    parser.add_argument("--vis_train_every", type=int, default=2000)
    parser.add_argument("--optimize_poses", type=int, default=0)
    parser.add_argument("--optimize_focal_length", type=int, default=0)
    parser.add_argument("--with_GT_poses", type=int, default=0)
    parser.add_argument("--multiview_dataset", type=int, default=0)
    parser.add_argument("--use_disp", type=int, default=0)
    parser.add_argument(
        "--use_foreground_mask", type=str, default="motion_masks",
        choices=["motion_masks", "epipolar_motion_masks", "epipolar_error_png"],
    )
    parser.add_argument("--use_time_embedding", type=int, default=0)
    parser.add_argument("--time_embedding_size", type=int, default=4)
    parser.add_argument("--save_poses_bounds", type=int, default=0)

    # new (TPU framework-only) flags; absent from the reference
    parser.add_argument("--n_devices", type=int, default=0,
                        help="data-parallel devices (0 = all available)")
    parser.add_argument("--seed", type=int, default=20211202)
    # production default (VERDICT r3 item 5): bf16 gather tables measured
    # fastest at every grid scale (PERF.md §3/§5/§9) with quantization-level
    # output deltas (tests/test_fused_vm.py). Golden/parity harnesses pin
    # --bf16 0 explicitly (f32 bit-parity vs the torch reference).
    parser.add_argument("--bf16", type=int, default=1,
                        help="bfloat16 gather tables (0 = f32 bit-parity mode)")
    parser.add_argument("--shard_grids", type=int, default=0,
                        help="FSDP-lite: shard [C,H,W] plane grids + their Adam "
                        "moments along H over the data mesh (frees ~2/3 of the "
                        "param HBM per chip at 640^3; parallel/mesh.py)")
    parser.add_argument("--vm_layout", type=str, default="auto",
                        choices=["auto", "merged", "strided"],
                        help="multiscale gather-table layout (ops/fused_vm.py)")
    parser.add_argument("--grad_impl", type=str, default="autodiff",
                        choices=["autodiff", "xla", "csum"],
                        help="plane-table gradient implementation: 'autodiff' "
                        "plain XLA scatter, 'xla' custom-VJP scatter, 'csum' "
                        "gather-only sorted prefix-sum-diff "
                        "(ops/coalesced.csum_grad; PERF.md §11)")
    parser.add_argument("--share_forward", type=int, default=1,
                        help="cross-pass forward sharing: passes A/B/E share "
                        "one sample set and A/B reuse E's static field eval "
                        "detached (exact; eliminates 2 static evals/step; "
                        "train/step.py PassSpec.static_from)")
    parser.add_argument("--fused_passes", type=int, default=0,
                        help="batch all render passes into shared field evals "
                        "(one dynamic + two static instances per step instead "
                        "of 7+2; identical math, train/step.py)")
    parser.add_argument("--app_frac", type=float, default=0.0,
                        help="fixed-bucket appearance compaction: run the "
                        "appearance gather + shading MLP on the top "
                        "ceil(app_frac*n_samples) samples per ray only "
                        "(reference app_mask semantics, tensorBase.py:774-804; "
                        "ops/compaction.py). 0 = dense (default: the dense "
                        "path currently measures FASTER on TPU — narrow-row "
                        "compaction gathers/scatters are index-rate bound, "
                        "PERF.md §8)")
    parser.add_argument("--app_start", type=int, default=-1,
                        help="iteration from which appearance compaction is "
                        "active; -1 = at the first voxel upsample (density is "
                        "concentrated by then, so the top-K bucket covers the "
                        "reference's above-threshold samples), 0 = immediately")
    parser.add_argument("--grad_accum", type=int, default=0,
                        help="gradient-accumulation micro-batches per step "
                        "(0 = auto: 1, or 2 on 640^3-class grids where the "
                        "full batch exceeds HBM; exact full-batch gradient, "
                        "make_train_step)")
    parser.add_argument("--remat", type=str, default="auto", choices=["auto", "on", "off"],
                        help="rematerialize field evals in backward: 'auto' stores "
                        "activations when the grid schedule fits HBM (faster), "
                        "remats on the 640^3-class schedules")
    parser.add_argument("--export_th", type=int, default=1,
                        help="also export torch-compatible .th checkpoints")
    parser.add_argument("--compact_eval", type=int, default=1,
                        help="render/eval paths: when an occupancy mask is "
                        "available (embedded in the checkpoint or via "
                        "--alpha_mask), compact each ray's occupied samples "
                        "into a fixed [R, K] bucket before the field evals "
                        "(the TPU form of the reference's xyz[ray_valid] "
                        "early-out, tensorBase.py:745-804; exact to ~1e-8, "
                        "tests/test_render_compact.py). 0 = dense masked")
    parser.add_argument("--alpha_mask", type=str, default="",
                        help="path to a packed occupancy mask .npz "
                        "(scripts/export_alpha.py) to use for eval/render "
                        "early-out; overrides any checkpoint-embedded mask")
    parser.add_argument("--compact_train", type=int, default=0,
                        help="TRAIN-time occupancy compaction: once "
                        "update_AlphaMask_list fires, mask each pass's "
                        "samples with the occupancy grid and compact them to "
                        "a per-ray [R, K] bucket before the field evals "
                        "(K sized by a measured probe). Deviates from the "
                        "reference, whose mask flag is dead (opt.py:211): "
                        "sub-threshold samples are treated as empty during "
                        "training — exact vs the dense-masked step while "
                        "every ray's occupied count <= K "
                        "(tests/test_compact_train.py). 0 = off (default)")
    parser.add_argument("--compact_flat", type=int, default=1,
                        help="with --compact_train: run the field evals' "
                        "per-sample work (gathers + warp + shading) on a "
                        "FLAT bucket of only the occupied samples (sized by "
                        "the batch-mean occupancy + 4 batch-sigma), "
                        "scattered back to the [R, K] layout — work scales "
                        "with the MEAN occupancy instead of the p99.5 "
                        "(render/pipeline.py flat_n; exact vs the [R, K] "
                        "step while the batch total fits, "
                        "tests/test_compact_train.py). 0 = [R, K] evals")
    parser.add_argument("--compact_quantile", type=float, default=0.995,
                        help="per-ray occupancy quantile sizing the train "
                        "compaction bucket K (Trainer._probe_compact_k): "
                        "occupancy is heavily skewed (measured mean 37 / "
                        "max 199 of 270), so max-based K forfeits the win "
                        "to a sliver of long rays; rays above K drop their "
                        "farthest occupied samples. 1.0 = exact max")

    cmd = list(cmd) if cmd is not None else None
    # pre-pass: expand --config file into defaults, CLI overrides win
    pre, _ = parser.parse_known_args(cmd)
    if pre.config:
        file_argv = _parse_config_file(pre.config)
        merged = file_argv + (cmd if cmd is not None else __import__("sys").argv[1:])
        args = parser.parse_args(merged)
    else:
        args = parser.parse_args(cmd)

    if args.n_lamb_sigma is None:
        args.n_lamb_sigma = [16, 4, 4]
    if args.n_lamb_sh is None:
        args.n_lamb_sh = [48, 12, 12]
    if args.upsamp_list is None:
        args.upsamp_list = [2000, 4000, 6000, 8000, 12000, 16000, 22000]
    if args.update_AlphaMask_list is None:
        args.update_AlphaMask_list = [300000000]
    return args


def parse_cmd(cmd: str) -> argparse.Namespace:
    return config_parser(shlex.split(cmd))
