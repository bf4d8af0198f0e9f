#!/usr/bin/env python
"""TPU performance measurement: the numbers PERF.md quotes.

All timing is VALUE-FORCED (see PERF.md §0): this attachment's
`block_until_ready` returns before execution, so steps are chained through
data dependences and a scalar fetch forces the chain; microbenchmarks wrap
the op in a carry-dependent `lax.scan` and difference two chain lengths.

Measures:
  1. full train-step throughput at the 300^3 steady state (f32 and bf16)
     and the 640^3 no-poses schedule;
  2. the fused plane-sample primitive in isolation -> effective random-row
     bandwidth vs the HBM peak (roofline, PERF.md §6);
  3. the Pallas segment-sum kernel vs the XLA scatter it targets.

Writes perf_tpu.json next to this script.
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

HBM_PEAK_GBS = 819.0  # v5e


def chain_time(step, args, n_lo=3, n_hi=13):
    """Per-iteration device time via carry-dependent scan + value fetch."""

    def runner(n):
        @jax.jit
        def f(c0, *a):
            c, _ = jax.lax.scan(lambda c, _: (step(c, *a), None), c0, None, length=n)
            return c

        float(jnp.sum(f(jnp.float32(0), *args)))
        t0 = time.perf_counter()
        float(jnp.sum(f(jnp.float32(0), *args)))
        return time.perf_counter() - t0

    lo, hi = runner(n_lo), runner(n_hi)
    return (hi - lo) / (n_hi - n_lo)


def bench_step(n_voxel: int, label: str, iters=30, bf16=False, grad_accum=0):
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
        f"--optimize_poses 1 --optimize_focal_length 1 --use_disp 1 "
        f"--bf16 {int(bf16)} --grad_accum {grad_accum}"
    )
    scene = make_synthetic_scene(T=T, H=H, W=W)
    tr = Trainer(args, scene)
    for _ in range(3):
        m = tr.run_step()
    float(m["total_loss"])  # force warmup

    t0 = time.perf_counter()
    for _ in range(iters):
        m = tr.run_step()
    assert np.isfinite(float(m["total_loss"]))  # forces the chain
    dt = (time.perf_counter() - t0) / iters

    res = {
        "label": label,
        "bf16": bf16,
        "grad_accum": grad_accum,
        "grid": list(tr.static_cfg.grid_size),
        "n_samples": tr.n_samples,
        "remat": tr._remat_policy(),
        "steps_per_sec": round(1.0 / dt, 2),
        "rays_per_sec": round(1024 / dt, 1),
        "step_ms": round(dt * 1e3, 3),
    }
    # free this trainer's device buffers before the next config compiles:
    # the 300^3 f32 case alone peaks ~15.7 GB of HLO temps (PERF.md) — a
    # lingering previous trainer's params/opt/dataset OOMs it
    import gc

    del tr, m, args, scene
    gc.collect()
    return res


def bench_fused_gather(n_voxel_side=300):
    """Fused dynamic-field sample op in isolation (forward)."""
    from rodynrf_tpu.fields.static import init_vm
    from rodynrf_tpu.ops.fused_vm import pack_vm, sample_vm_fused

    gs = {300: (331, 368, 220), 640: (706, 786, 471)}[n_voxel_side]
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    grids = [
        init_vm(ks[0], [16, 4, 4], gs),
        init_vm(ks[1], [16, 4, 4], gs),
        init_vm(ks[2], [48, 12, 12], gs),
    ]
    N = 276480
    xyz = jax.random.uniform(ks[3], (N, 3), jnp.float32, -0.99, 0.99)
    out = {}
    for dt, lab in [(None, "f32"), (jnp.bfloat16, "bf16")]:
        packed = jax.tree_util.tree_map(
            jnp.asarray, pack_vm(grids, strides=(1, 2, 4), gather_dtype=dt)
        )

        def f(c, packed):
            outs = sample_vm_fused(packed, xyz + c * 1e-30)
            return c + sum(jnp.sum(o) for o in outs)

        per = chain_time(f, (packed,))
        rows = 9 * N
        row_bytes = 4 * 80 * (2 if dt is not None else 4)
        gbps = rows * row_bytes / per / 1e9
        out[lab] = {
            "ms": round(per * 1e3, 2),
            "rows": rows,
            "Midx_per_s": round(rows / per / 1e6, 1),
            "eff_random_row_GBps": round(gbps, 1),
            "pct_hbm_peak": round(100 * gbps / HBM_PEAK_GBS, 1),
        }
    return out


def bench_scatter_vs_pallas():
    from rodynrf_tpu.ops.pallas_segsum import segment_rows_sum

    H, W = 332, 369
    R = H * W
    key = jax.random.PRNGKey(0)
    p0 = jax.random.uniform(key, (1024, 2), jnp.float32, 0, 1)
    p1 = jax.random.uniform(jax.random.PRNGKey(1), (1024, 2), jnp.float32, 0, 1)
    t = jnp.linspace(0, 1, 270)
    pts = p0[:, None, :] + (p1 - p0)[:, None, :] * t[None, :, None]
    parts = []
    for s in (1, 2, 4):
        Ws, Hs = (W - 2) // s, (H - 2) // s
        xs = (pts[..., 0] * (Ws - 1)).astype(jnp.int32).reshape(-1)
        ys = (pts[..., 1] * (Hs - 1)).astype(jnp.int32).reshape(-1)
        parts.append(ys * W + xs)
    idx = jnp.concatenate(parts)
    N3 = idx.shape[0]
    upd = jax.random.normal(jax.random.PRNGKey(2), (N3, 320), jnp.bfloat16)

    def xla(c, upd, idx):
        i = idx + (c * 1e-30).astype(jnp.int32)
        return c + jnp.sum(
            jnp.zeros((R, 320), jnp.bfloat16).at[i].add(upd).astype(jnp.float32)
        )

    def pallas(c, upd, idx):
        i = idx + (c * 1e-30).astype(jnp.int32)
        return c + jnp.sum(segment_rows_sum(i, upd, R))

    return {
        "n_updates": int(N3),
        "xla_scatter_ms": round(chain_time(xla, (upd, idx)) * 1e3, 2),
        "pallas_segsum_ms": round(chain_time(pallas, (upd, idx)) * 1e3, 2),
        "note": "XLA scatter is the default backward; kernel kept as tested baseline (PERF.md §4)",
    }


def main():
    results = {"device": str(jax.devices()[0]), "method": "value-forced chained timing"}
    # grad_accum=2: the f32 300^3 step's program alone needs 15.75 GB of HBM
    # (AOT-measured: over by 2.07 MB with nothing else resident) — two
    # scan-accumulated micro-batches bound live memory structurally with
    # identical gradient math (same fix as bench.py's f32 config)
    results["step_300_f32"] = bench_step(
        300 ** 3, "300^3 steady state f32 (grad_accum=2)", grad_accum=2)
    print(json.dumps(results["step_300_f32"]), flush=True)
    results["step_300_bf16"] = bench_step(300 ** 3, "300^3 steady state bf16", bf16=True)
    print(json.dumps(results["step_300_bf16"]), flush=True)
    if "--full" in sys.argv:
        results["step_640"] = bench_step(640 ** 3, "640^3 no-poses schedule", iters=10, bf16=True)
        print(json.dumps(results["step_640"]), flush=True)
    results["fused_gather_300"] = bench_fused_gather(300)
    print(json.dumps(results["fused_gather_300"]), flush=True)
    results["scatter"] = bench_scatter_vs_pallas()
    print(json.dumps(results["scatter"]), flush=True)

    with open(os.path.join(HERE, "perf_tpu.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
