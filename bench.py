#!/usr/bin/env python
"""Benchmark: steady-state training throughput in rays/sec/chip.

Protocol (BASELINE.md): one "ray" = one sampled pixel per iteration,
including ALL per-step field evaluations attributable to it (the full
multi-pass train step — 7 static+dynamic render passes with pose/focal
optimization enabled, the reference's heaviest configuration,
reference train.py:1032-2351).

Baseline (measured): golden/bench_reference.py times the UNMODIFIED
reference train.py reconstruction loop on this box (torch eager, CPU) at the
Nvidia recipe shapes (batch 1024, 128^3 grid, 115 samples/ray) and writes
golden/out/ref_bench.json. This script measures the same 128^3 config here
(plus the 300^3 steady-state config where >75% of the reference's 100k
iterations run) and reports vs_baseline = ours@128^3 / reference@128^3 —
a measured, same-workload ratio (cross-hardware: TPU vs this box's CPU;
run `bench.py --cpu` for the same-box CPU-vs-CPU ratio, written to
golden/out/ours_bench_cpu.json and folded into later runs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

CPU_MODE = "--cpu" in sys.argv
if CPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if CPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(HERE, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REF_BENCH = os.path.join(HERE, "golden", "out", "ref_bench.json")
OURS_CPU_BENCH = os.path.join(HERE, "golden", "out", "ours_bench_cpu.json")

# fallback only (used when golden/out/ref_bench.json is absent): estimated
# eager-PyTorch reference on A100 at the Nvidia config
REF_RAYS_PER_SEC_A100_ESTIMATE = 3500.0

T, H, W = 12, 270, 480
BATCH = 1024


def _args(n_voxel: int, bf16: bool = False, grad_accum: int = 0):
    from rodynrf_tpu.train import parse_cmd

    return parse_cmd(
        f"--bf16 {1 if bf16 else 0} "
        f"--grad_accum {grad_accum} "
        f"--expname bench --datadir none --dataset_name synthetic "
        f"--n_iters 100000 --batch_size {BATCH} --N_voxel_t {T} "
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


def measure_train(scene, n_voxel: int, warmup: int, iters: int, bf16: bool = False,
                  grad_accum: int = 0, compact: bool = False):
    """Honest step timing: enqueue the chain, then FETCH the last loss.

    On tunneled TPU attachments `block_until_ready` can return before
    execution (verified: a 4 GiB reduction "completed" in 34 µs); a value
    fetch is the only trustworthy sync. Step N's params depend on step N-1's,
    so fetching the final loss forces the whole chain; the single ~30 ms RPC
    round-trip is amortized over `iters`.
    """
    from rodynrf_tpu.train import Trainer

    trainer = Trainer(_args(n_voxel, bf16=bf16, grad_accum=grad_accum), scene)
    if compact:
        # train-time [R, K] occupancy compaction (--compact_train) against
        # the committed converged-scene mask — the operating point after the
        # first update_AlphaMask_list firing, where >95% of the reference's
        # 100k-iteration schedule runs (update list fires at ~2.5k iters).
        # Returns None when the mask artifact is absent.
        if not os.path.exists(ALPHA_MASK_NPZ):
            return None, None
        from rodynrf_tpu.fields.alpha_mask import load_alpha_npz

        trainer.alpha_mask = load_alpha_npz(ALPHA_MASK_NPZ)
        trainer._enable_train_compaction()
        if not trainer.compact_k:
            return None, None
    for _ in range(warmup):
        m = trainer.run_step()
    float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        m = trainer.run_step()
    assert np.isfinite(float(m["total_loss"]))  # forces execution of the chain
    dt = time.perf_counter() - t0
    return iters / dt, trainer


ALPHA_MASK_NPZ = os.path.join(
    HERE, "golden", "out_quality", "no_poses", "alpha_mask.npz"
)


def measure_render(trainer, scene, chunk=8192, reps=10, bf16=False, masked=False):
    """Render-path throughput (BASELINE.md metric (b)): eval-mode dual-field
    chunk renderer (reference renders eval at chunk 512, renderer.py:732).

    bf16=True measures the documented --bf16 eval mode (bf16 gather tables;
    ~bf16-quantization-level differences, tests/test_fused_vm.py).

    masked=True additionally loads the committed converged-scene occupancy
    mask (golden/out_quality/.../alpha_mask.npz, built by
    scripts/export_alpha.py from the QUALITY.md no_poses checkpoint) and
    runs the compacted early-out path — the production --compact_eval
    configuration (exact vs the superset-masked dense oracle,
    tests/test_render_compact.py). Returns None when the mask artifact is
    absent."""
    import dataclasses

    import jax.numpy as jnp

    from rodynrf_tpu.render.renderer import make_chunk_renderer

    alpha_mask = None
    if masked:
        if not os.path.exists(ALPHA_MASK_NPZ):
            return None
        from rodynrf_tpu.fields.alpha_mask import load_alpha_npz

        alpha_mask = load_alpha_npz(ALPHA_MASK_NPZ)

    s_cfg, d_cfg = trainer.static_cfg, trainer.dynamic_cfg
    if bf16:
        s_cfg = dataclasses.replace(s_cfg, grid_sample_dtype="bfloat16")
        d_cfg = dataclasses.replace(d_cfg, grid_sample_dtype="bfloat16")
    render_chunk = make_chunk_renderer(
        s_cfg, d_cfg, trainer.args.ray_type, trainer.n_samples,
        trainer.static_cfg.step_size(np.asarray(scene.scene_bbox)),
        alpha_mask=alpha_mask, compact=masked,
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
    packs = render_chunk.pack(params_r)
    out = render_chunk(params_r, packs, trainer.aabb, rays, ts)
    float(jnp.sum(out.rgb))
    # chain reps through a data dependence so one final fetch forces all of
    # them (see measure_train: block_until_ready is not a sync here)
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for _ in range(reps):
        out = render_chunk(params_r, packs, trainer.aabb, rays, ts + carry * 1e-30)
        carry = out.rgb[0, 0]
    assert np.isfinite(float(carry))
    return reps * chunk / (time.perf_counter() - t0)


def _load(path):
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return None


def main():
    from rodynrf_tpu.data import make_synthetic_scene

    scene = make_synthetic_scene(T=T, H=H, W=W)
    device = str(jax.devices()[0]).split(":")[0]
    ref = _load(REF_BENCH)

    if CPU_MODE:
        # same-box, same-workload CPU measurement (matches
        # golden/bench_reference.py: 128^3, batch 1024)
        warmup = int(os.environ.get("BENCH_WARMUP", 2))
        iters = int(os.environ.get("BENCH_ITERS", 8))
        sps, trainer = measure_train(scene, 128 ** 3, warmup, iters)
        rays = sps * BATCH
        out = {
            "impl": "rodynrf_tpu (jitted step)",
            "device": device,
            "iters_per_sec": round(sps, 4),
            "rays_per_sec": round(rays, 2),
            "batch_size": BATCH,
            "n_samples": trainer.n_samples,
            "grid": list(trainer.static_cfg.grid_size),
        }
        with open(OURS_CPU_BENCH, "w") as fh:
            json.dump(out, fh, indent=1)
        result = {
            "metric": "train_rays_per_sec_cpu",
            "value": round(rays, 1),
            "unit": "rays/s",
            "vs_baseline": round(rays / ref["rays_per_sec"], 3) if ref else None,
            "device": device,
            "baseline_note": (
                f"same-box CPU vs measured torch reference "
                f"({ref['rays_per_sec']} rays/s)" if ref else "no reference measurement"
            ),
        }
        print(json.dumps(result))
        return

    warmup = int(os.environ.get("BENCH_WARMUP", 5))
    iters = int(os.environ.get("BENCH_ITERS", 30))

    # Buffer-lifetime discipline (round-4 postmortem, VERDICT r4 item 1):
    # the f32-300^3 step alone peaks ~15 GB of HLO temps — a lingering
    # previous trainer's packed tables/opt state or a cached render
    # executable OOMs the 16 GB chip. Each config runs inside a function so
    # its trainer and jitted closures die on return, then gc + clear_caches
    # drops the executables (the persistent compile cache keeps recompiles
    # cheap). Same fix as scripts/perf_tpu.py:104-109, applied here.
    def _drop_buffers():
        import gc

        gc.collect()
        jax.clear_caches()
        gc.collect()

    def _config_300_bf16():
        # headline: 300^3 steady state (the schedule's final resolution,
        # where >75% of the reference's 100k iterations run) in the
        # PRODUCTION configuration — bf16 gather tables (--bf16 1 default)
        sps, trainer = measure_train(scene, 300 ** 3, warmup, iters, bf16=True)
        bf16_dense = measure_render(trainer, scene, bf16=True)
        f32_dense = measure_render(trainer, scene)
        # production eval configuration: converged-scene occupancy mask +
        # compacted early-out (--compact_eval 1, the default); falls back to
        # the dense number when the mask artifact is absent
        bf16_masked = measure_render(trainer, scene, bf16=True, masked=True)
        info = {"n_samples": trainer.n_samples,
                "grid": list(trainer.static_cfg.grid_size)}
        return sps, bf16_dense, f32_dense, bf16_masked, info

    def _config_sps(n_voxel, bf16, grad_accum=0):
        sps, _trainer = measure_train(
            scene, n_voxel, warmup, iters, bf16=bf16, grad_accum=grad_accum
        )
        return sps

    (sps_300_bf16, render_rays_bf16_dense, render_rays,
     render_rays_bf16_masked, info_300) = _config_300_bf16()
    render_rays_bf16 = (
        render_rays_bf16_masked
        if render_rays_bf16_masked is not None
        else render_rays_bf16_dense
    )
    _drop_buffers()
    # train-time occupancy compaction (--compact_train, [R,K] buckets +
    # flat-bucket field evals) at the same config: the post-first-mask
    # operating point (trainer probes K and the flat budget from the
    # committed converged-scene mask; 192.2 ms vs 424.7 ms dense, PERF.md §14)
    def _config_compact():
        sps, trainer = measure_train(scene, 300 ** 3, warmup, iters, bf16=True,
                                     compact=True)
        return sps, (trainer.compact_k if trainer is not None else None)

    sps_300_compact, compact_k = _config_compact()
    _drop_buffers()
    # f32 bit-parity mode (--bf16 0), for comparison. grad_accum=2: the f32
    # 300^3 step's program alone needs 15.40 GB of HBM at HEAD (measured:
    # OOM by 2.07 MB with NOTHING else resident) — two scan-accumulated
    # micro-batches bound live memory structurally with identical gradient
    # math (make_train_step docstring); recorded in the JSON below
    sps_300_f32 = _config_sps(300 ** 3, False, grad_accum=2)
    _drop_buffers()
    # anchor config: identical shapes to the measured reference run (f32,
    # like the torch reference)
    sps_128 = _config_sps(128 ** 3, False)
    _drop_buffers()

    rays_300 = sps_300_bf16 * BATCH
    rays_128 = sps_128 * BATCH

    ours_cpu = _load(OURS_CPU_BENCH)
    # lead with the A100-relative position (BASELINE.md north star): the
    # reference publishes no numbers, so the denominator is the 3.5k rays/s
    # eager-torch-on-A100 estimate used since round 1
    vs_baseline = rays_300 / REF_RAYS_PER_SEC_A100_ESTIMATE
    note = (
        "vs estimated PyTorch reference on A100 (3500 rays/s = measured "
        "68 rays/s same-workload CPU anchor x ~51 eager A100/CPU factor, "
        "uncertainty band [1.4k, 6.8k]; derivation: BASELINE.md v2)"
    )
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_300, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 3),
        "steps_per_sec": round(sps_300_bf16, 3),
        "rays_per_sec_compact": (
            round(sps_300_compact * BATCH, 1) if sps_300_compact else None
        ),
        "compact_k": compact_k,
        "rays_per_sec_f32": round(sps_300_f32 * BATCH, 1),
        "f32_grad_accum": 2,
        "render_rays_per_sec": round(render_rays, 1),
        "render_rays_per_sec_bf16": round(render_rays_bf16, 1),
        "render_rays_per_sec_bf16_dense": round(render_rays_bf16_dense, 1),
        "render_masked": render_rays_bf16_masked is not None,
        "batch_size": BATCH,
        "n_samples": info_300["n_samples"],
        "grid": info_300["grid"],
        "device": device,
        "anchor_rays_per_sec_128": round(rays_128, 1),
        "vs_ref_same_workload_cpu": (
            round(rays_128 / ref["rays_per_sec"], 2) if ref else None
        ),
        "ref_cpu_rays_per_sec": ref["rays_per_sec"] if ref else None,
        "ours_cpu_rays_per_sec": ours_cpu["rays_per_sec"] if ours_cpu else None,
        "cpu_same_box_speedup": (
            round(ours_cpu["rays_per_sec"] / ref["rays_per_sec"], 3)
            if (ref and ours_cpu) else None
        ),
        "baseline_note": note,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
