#!/usr/bin/env python
"""Honest train-step timing: chained steps + one value fetch.

On this TPU attachment `block_until_ready` returns before execution, so the
only trustworthy wall-clock is enqueue-N-steps-then-fetch: step N's params
depend on step N-1's, so fetching the last loss forces the whole chain.

Usage: python scripts/step_time.py [n_voxel_exp=300] [iters=50] [--bf16]
           [--batched] [--remat on|off|auto]

--batched enables the chunked batched multi-pass evaluation (fused_passes=1
A/B; sequential is the measured-fastest default, PERF.md section 3).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    n_voxel_side = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 300
    iters = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 50
    bf16 = "--bf16" in sys.argv
    fused = 1 if "--batched" in sys.argv else 0
    remat = sys.argv[sys.argv.index("--remat") + 1] if "--remat" in sys.argv else "auto"
    accum = int(sys.argv[sys.argv.index("--accum") + 1]) if "--accum" in sys.argv else 0
    # default 0.0 = production default (dense app); pass --app_frac for A/B
    app_frac = 0.0 if "--dense-app" in sys.argv else (
        float(sys.argv[sys.argv.index("--app_frac") + 1]) if "--app_frac" in sys.argv else 0.0
    )
    grad_impl = (
        sys.argv[sys.argv.index("--grad_impl") + 1]
        if "--grad_impl" in sys.argv else "autodiff"
    )
    # --batch N: throughput at a larger ray batch (amortizes the per-step
    # table-sized costs: pack + cotangent buffers + Adam, ~40-50 ms at
    # 300^3 regardless of batch; reference default is 1024)
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 1024

    from rodynrf_tpu.data import make_synthetic_scene
    from rodynrf_tpu.train import Trainer, parse_cmd

    T, H, W = 12, 270, 480
    args = parse_cmd(
        f"--expname steptime --datadir none --dataset_name synthetic "
        f"--n_iters 100000 --batch_size {batch} --N_voxel_t {T} "
        f"--N_voxel_init {n_voxel_side**3} --N_voxel_final {n_voxel_side**3} "
        f"--upsamp_list 8000 --upsamp_list 12000 --upsamp_list 16000 --upsamp_list 22000 "
        f"--step_ratio 2.0 --ray_type ndc "
        f"--model_name TensorVMSplit_TimeEmbedding --shadingMode MLP_Fea_late_view "
        f"--shadingModeStatic MLP_Fea "
        f"--n_lamb_sigma 16 --n_lamb_sigma 4 --n_lamb_sigma 4 "
        f"--n_lamb_sh 48 --n_lamb_sh 12 --n_lamb_sh 12 "
        f"--fea2denseAct relu --view_pe 0 --fea_pe 0 "
        f"--TV_weight_density 1.0 --TV_weight_app 1.0 "
        f"--distortion_weight_dynamic 0.01 "
        f"--optimize_poses 1 --optimize_focal_length 1 --use_disp 1 "
        f"--bf16 {int(bf16)} --fused_passes {fused} --remat {remat} "
        f"--app_frac {app_frac} --app_start 0 --grad_accum {accum} "
        f"--grad_impl {grad_impl}"
    )
    scene = make_synthetic_scene(T=T, H=H, W=W)
    t0 = time.perf_counter()
    tr = Trainer(args, scene)
    print(f"trainer built {time.perf_counter()-t0:.1f}s", flush=True)

    if "--compact" in sys.argv:
        # train-time occupancy compaction against the committed
        # converged-scene mask (38.8% occupancy at 192^3, QUALITY.md);
        # COMPACT_K env overrides the probe's K for A/B sweeps
        from rodynrf_tpu.fields.alpha_mask import load_alpha_npz

        tr.alpha_mask = load_alpha_npz(
            os.path.join(REPO, "golden", "out_quality", "no_poses", "alpha_mask.npz")
        )
        k_env = int(os.environ.get("COMPACT_K", 0))
        if k_env:
            tr.compact_k = k_env
            tr.data = dict(tr.data)
            vol_d = tr._dilated_volume()
            tr.alpha_shape = tuple(int(s) for s in vol_d.shape)
            tr.data["alpha_volume"] = vol_d.reshape(-1)
            tr.data["alpha_aabb"] = tr.alpha_mask.aabb
            tr._build_step()
            print(f"compaction forced: K={k_env}", flush=True)
        else:
            tr._enable_train_compaction()

    t0 = time.perf_counter()
    for _ in range(3):
        m = tr.run_step()
    print(f"warm: loss {float(m['total_loss']):.4f} ({time.perf_counter()-t0:.1f}s incl compile)", flush=True)

    for n in (10, iters):
        t0 = time.perf_counter()
        for _ in range(n):
            m = tr.run_step()
        v = float(m["total_loss"])
        dt = time.perf_counter() - t0
        print(
            f"iters={n}: per-step {dt/n*1e3:.2f} ms, {batch*n/dt:,.0f} rays/s "
            f"(loss {v:.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
