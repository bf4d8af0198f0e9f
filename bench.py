#!/usr/bin/env python
"""Benchmark: steady-state training throughput in rays/sec/chip.

Protocol (BASELINE.md): one "ray" = one sampled pixel per iteration,
including ALL per-step field evaluations attributable to it (the full
multi-pass train step — 7 static+dynamic render passes with pose/focal
optimization enabled, the reference's heaviest configuration,
reference train.py:1032-2351).

Reference baseline: the PyTorch reference publishes no throughput numbers
(BASELINE.md). REF_RAYS_PER_SEC_A100 below is an *estimate* of the eager
PyTorch reference on A100 at the Nvidia config (batch 1024; ~2-5 it/s for
~7-pass eager training at 128³-300³ grids); replace with a measured value
when an A100 run is available. vs_baseline = ours / estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REF_RAYS_PER_SEC_A100 = 3500.0  # estimated eager-PyTorch reference (see module docstring)


def main():
    from rodynrf_tpu.data import make_synthetic_scene
    from rodynrf_tpu.train import Trainer, parse_cmd

    # Nvidia-config steady state: batch 1024, 300^3 grid (the schedule's
    # final resolution, where >75% of the reference's 100k iterations run),
    # full pose+focal optimization.
    T, H, W = 12, 270, 480
    batch = 1024
    args = parse_cmd(
        f"--expname bench --datadir none --dataset_name synthetic "
        f"--n_iters 100000 --batch_size {batch} --N_voxel_t {T} "
        f"--N_voxel_init {300**3} --N_voxel_final {300**3} "
        f"--upsamp_list 8000 --upsamp_list 12000 --upsamp_list 16000 --upsamp_list 22000 "
        f"--step_ratio 2.0 --ray_type ndc "
        f"--model_name TensorVMSplit_TimeEmbedding --shadingMode MLP_Fea_late_view "
        f"--shadingModeStatic MLP_Fea "
        f"--n_lamb_sigma 16 --n_lamb_sigma 4 --n_lamb_sigma 4 "
        f"--n_lamb_sh 48 --n_lamb_sh 12 --n_lamb_sh 12 "
        f"--fea2denseAct relu --view_pe 0 --fea_pe 0 "
        f"--TV_weight_density 1.0 --TV_weight_app 1.0 "
        f"--distortion_weight_dynamic 0.01 "
        f"--optimize_poses 1 --optimize_focal_length 1 --use_disp 1"
    )
    scene = make_synthetic_scene(T=T, H=H, W=W)
    trainer = Trainer(args, scene)

    warmup = int(os.environ.get("BENCH_WARMUP", 5))
    iters = int(os.environ.get("BENCH_ITERS", 30))

    for _ in range(warmup):
        m = trainer.run_step()
    jax.block_until_ready(m["total_loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        m = trainer.run_step()
    jax.block_until_ready(m["total_loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = iters / dt
    rays_per_sec = steps_per_sec * batch

    # render-path throughput (BASELINE.md metric (b)): eval-mode dual-field
    # chunk renderer, chunk 8192 (reference renders eval at chunk 512,
    # renderer.py:732)
    import jax.numpy as jnp
    from rodynrf_tpu.render.renderer import make_chunk_renderer

    chunk = 8192
    render_chunk = jax.jit(
        make_chunk_renderer(
            trainer.static_cfg, trainer.dynamic_cfg, args.ray_type, trainer.n_samples,
            trainer.static_cfg.step_size(np.asarray(scene.scene_bbox)),
        )
    )
    params_r = {"static": trainer.params["static"], "dynamic": trainer.params["dynamic"]}
    rng = np.random.default_rng(0)
    rays = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-0.5, 0.5, (chunk, 3)),
                rng.uniform(0.3, 1.0, (chunk, 3)) * np.array([0.3, 0.3, 1.0]),
            ],
            -1,
        ),
        jnp.float32,
    )
    ts = jnp.asarray(rng.uniform(-1, 1, (chunk,)), jnp.float32)
    out = render_chunk(params_r, trainer.aabb, rays, ts)
    jax.block_until_ready(out.rgb)
    t0 = time.perf_counter()
    for _ in range(10):
        out = render_chunk(params_r, trainer.aabb, rays, ts)
    jax.block_until_ready(out.rgb)
    render_rays_per_sec = 10 * chunk / (time.perf_counter() - t0)

    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REF_RAYS_PER_SEC_A100, 3),
        "steps_per_sec": round(steps_per_sec, 3),
        "render_rays_per_sec": round(render_rays_per_sec, 1),
        "batch_size": batch,
        "n_samples": trainer.n_samples,
        "grid": list(trainer.static_cfg.grid_size),
        "device": str(jax.devices()[0]).split(":")[0],
        "baseline_note": "vs estimated PyTorch reference on A100 (3500 rays/s, unmeasured)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
