#!/usr/bin/env python
"""TPU performance measurement: roofline evidence for PERF.md.

Measures, on the real chip (VERDICT r1 items 2b + 3):
  1. full train-step throughput at the 300^3 steady state and the 640^3
     no-poses schedule (grid ~706x786x471, 578 samples/ray);
  2. the plane-gather primitive in isolation at the 640^3 app-plane shapes
     -> achieved HBM bandwidth vs peak (the "is a Pallas compaction kernel
     needed?" question of ops/pallas_vm.py item 3);
  3. XLA's own cost analysis (bytes accessed / FLOPs) for the step;
  4. a jax.profiler trace (--trace) for offline inspection.

Writes perf_tpu.json next to this script; PERF.md quotes it.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# v5e (TPU v5 lite) peaks
HBM_PEAK_GBS = 819.0
BF16_PEAK_TFLOPS = 394.0
F32_GATHER_BYTES = 4


def timed(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_plane_gather(C: int, H: int, W: int, n_samples: int, strides=(1, 2, 4), dtype=None):
    """Achieved gather bandwidth of sample_plane at given shapes."""
    from rodynrf_tpu.ops.grid_sample import sample_plane

    key = jax.random.PRNGKey(0)
    plane = jax.random.normal(key, (C, H, W), jnp.float32)
    xy = jax.random.uniform(jax.random.PRNGKey(1), (n_samples, 2), jnp.float32, -1, 1)

    @jax.jit
    def multi(plane, xy):
        return sum(
            jnp.sum(sample_plane(plane, xy, stride=s, gather_dtype=dtype)) for s in strides
        )

    dt = timed(multi, plane, xy)
    bpe = 2 if dtype is not None else 4
    gathered = n_samples * 4 * C * bpe * len(strides)
    return {
        "plane": [C, H, W],
        "dtype": "bf16" if dtype is not None else "f32",
        "n_samples": n_samples,
        "strides": list(strides),
        "time_ms": round(dt * 1e3, 4),
        "gathered_GB": round(gathered / 1e9, 4),
        "achieved_GBps": round(gathered / dt / 1e9, 2),
        "pct_hbm_peak": round(100 * gathered / dt / 1e9 / HBM_PEAK_GBS, 1),
    }


def bench_step(n_voxel: int, label: str, iters=30, trace_dir=None):
    from rodynrf_tpu.data import make_synthetic_scene
    from rodynrf_tpu.train import Trainer, parse_cmd

    T, H, W = 12, 270, 480
    args = parse_cmd(
        f"--expname perf --datadir none --dataset_name synthetic "
        f"--n_iters 100000 --batch_size 1024 --N_voxel_t {T} "
        f"--N_voxel_init {n_voxel} --N_voxel_final {n_voxel} "
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
    tr = Trainer(args, scene)
    for _ in range(3):
        m = tr.run_step()
    jax.block_until_ready(m["total_loss"])

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                m = tr.run_step()
            jax.block_until_ready(m["total_loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        m = tr.run_step()
    jax.block_until_ready(m["total_loss"])
    dt = (time.perf_counter() - t0) / iters

    # XLA's own cost model for the compiled step
    cost = {}
    try:
        lowered_cost = tr.step_fn.lower(
            tr.params, tr.opt_state, tr.aabb, tr.data,
            jnp.zeros(args.batch_size, jnp.int32), jnp.zeros(args.batch_size, jnp.int32),
            jax.random.PRNGKey(0),
            {"iteration": jnp.asarray(0, jnp.int32),
             "focal_fixed": jnp.asarray(tr.focal_fixed, jnp.float32),
             **{k: jnp.asarray(v, jnp.float32) for k, v in tr.schedule.scalars(0).items()}},
        ).compile().cost_analysis()
        if isinstance(lowered_cost, (list, tuple)):
            lowered_cost = lowered_cost[0]
        for k in ("flops", "bytes accessed"):
            if k in lowered_cost:
                cost[k] = float(lowered_cost[k])
    except Exception as e:  # cost analysis is best-effort across backends
        cost["error"] = str(e)

    out = {
        "label": label,
        "grid": list(tr.static_cfg.grid_size),
        "n_samples": tr.n_samples,
        "steps_per_sec": round(1.0 / dt, 2),
        "rays_per_sec": round(1024 / dt, 1),
        "step_ms": round(dt * 1e3, 3),
        "cost_analysis": cost,
    }
    if "bytes accessed" in cost:
        out["achieved_GBps_by_cost_model"] = round(cost["bytes accessed"] / dt / 1e9, 1)
        out["pct_hbm_peak_by_cost_model"] = round(
            100 * cost["bytes accessed"] / dt / 1e9 / HBM_PEAK_GBS, 1
        )
    if "flops" in cost:
        out["achieved_TFLOPs"] = round(cost["flops"] / dt / 1e12, 2)
    return out


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    results = {"device": str(dev)}

    # 1+3: full step at both schedules (trace only the 640^3 one)
    trace = os.path.join(HERE, "..", "perf_trace") if "--trace" in sys.argv else None
    results["step_300"] = bench_step(300 ** 3, "300^3 steady state")
    results["step_640"] = bench_step(640 ** 3, "640^3 no-poses schedule", trace_dir=trace)

    # 2: isolated plane gather at the 640^3 app-plane shapes.
    # grid ~[706, 786, 471]; the xy app plane [48, 786, 706] is the largest
    # texture (106 MB f32 — far beyond VMEM).
    n = 1024 * results["step_640"]["n_samples"]
    results["gather_640_app_xy_f32"] = bench_plane_gather(48, 786, 706, n)
    results["gather_640_app_xy_bf16"] = bench_plane_gather(48, 786, 706, n, dtype=jnp.bfloat16)
    results["gather_640_density_xy_f32"] = bench_plane_gather(16, 786, 706, n)
    # 300^3 steady-state shape for contrast (VMEM-resident regime)
    n300 = 1024 * results["step_300"]["n_samples"]
    results["gather_300_app_xy_f32"] = bench_plane_gather(48, 393, 330, n300)

    path = os.path.join(HERE, "perf_tpu.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
