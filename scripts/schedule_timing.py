#!/usr/bin/env python
"""Honest per-phase timing of the full 640³ no-poses schedule (PERF.md §7).

Measures the train step at every voxel phase of configs/Nvidia_no_poses.txt
(16³→640³ over 7 upsamples, reference train.py:2582-2606), value-forced
timing, plus remat/bf16 variants at the 640³ endpoint. Resumable: phases
already in schedule_timing.json are skipped (remote compiles are slow).

Usage: python scripts/schedule_timing.py [iters=10]
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

OUT = os.path.join(HERE, "schedule_timing.json")


def measure(n_voxel: int, bf16: bool, remat: str, iters: int, app_frac: float = 0.25):
    from rodynrf_tpu.data import make_synthetic_scene
    from rodynrf_tpu.train import Trainer, parse_cmd

    T, H, W = 12, 270, 480
    args = parse_cmd(
        f"--expname sched --datadir none --dataset_name synthetic "
        f"--n_iters 100000 --batch_size 1024 --N_voxel_t {T} "
        f"--N_voxel_init {n_voxel} --N_voxel_final {n_voxel} "
        f"--upsamp_list 2000 --upsamp_list 4000 --upsamp_list 6000 "
        f"--upsamp_list 8000 --upsamp_list 12000 --upsamp_list 16000 "
        f"--upsamp_list 22000 "
        f"--step_ratio 2.0 --ray_type ndc "
        f"--model_name TensorVMSplit_TimeEmbedding --shadingMode MLP_Fea_late_view "
        f"--shadingModeStatic MLP_Fea "
        f"--n_lamb_sigma 16 --n_lamb_sigma 4 --n_lamb_sigma 4 "
        f"--n_lamb_sh 48 --n_lamb_sh 12 --n_lamb_sh 12 "
        f"--fea2denseAct relu --view_pe 0 --fea_pe 0 "
        f"--TV_weight_density 1.0 --TV_weight_app 1.0 "
        f"--distortion_weight_dynamic 0.01 "
        f"--optimize_poses 0 --optimize_focal_length 0 --use_disp 1 "
        # compaction active from the first upsample in a real run
        # (--app_start -1); each phase here starts AT its grid, so pass the
        # effective state explicitly: off for phase 0, on afterwards
        f"--bf16 {int(bf16)} --remat {remat} --app_frac {app_frac} --app_start 0"
    )
    scene = make_synthetic_scene(T=T, H=H, W=W)
    tr = Trainer(args, scene)
    for _ in range(3):
        m = tr.run_step()
    float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        m = tr.run_step()
    assert np.isfinite(float(m["total_loss"]))
    dt = (time.perf_counter() - t0) / iters
    from rodynrf_tpu.ops.fused_vm import MERGED_BYTES_LIMIT  # noqa: F401

    return {
        "grid": list(tr.static_cfg.grid_size),
        "n_samples": tr.n_samples,
        "remat": tr._remat_policy(),
        "app_frac": app_frac,
        "vm_layout_auto": "merged" if _merged(tr) else "strided",
        "step_ms": round(dt * 1e3, 1),
        "rays_per_sec": round(1024 / dt, 1),
    }


def _merged(tr):
    from rodynrf_tpu.fields import dynamic as dyn
    from rodynrf_tpu.ops.fused_vm import merged_table_bytes, MERGED_BYTES_LIMIT

    p = tr.params["dynamic"]
    grids = [
        (p["density_plane"], p["density_line"]),
        (p["blending_plane"], p["blending_line"]),
        (p["app_plane"], p["app_line"]),
    ]
    return (
        merged_table_bytes(grids, (1, 2, 4), tr.dynamic_cfg.gather_dtype)
        <= MERGED_BYTES_LIMIT
    )


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from rodynrf_tpu.train.schedule import n_voxel_schedule

    phases = n_voxel_schedule(4096, 262144000, 7)
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)

    cases = [(f"phase{i}_{round(v ** (1 / 3))}", int(v), True, "auto", 0.0)
             for i, v in enumerate(list(phases))]
    cases += [
        ("640_bf16_remat_off", 262144000, True, "off", 0.0),
        ("640_f32_remat_auto", 262144000, False, "auto", 0.0),
        ("640_bf16_compact_app", 262144000, True, "auto", 0.25),
    ]
    for name, v, bf16, remat, app in cases:
        if name in results:
            continue
        try:
            results[name] = measure(v, bf16, remat, iters, app_frac=app)
        except Exception as e:  # OOM etc. — record honestly
            results[name] = {"error": str(e)[:300]}
        print(name, json.dumps(results[name]), flush=True)
        with open(OUT, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
