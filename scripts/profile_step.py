#!/usr/bin/env python
"""Per-HLO-op profile of the production train step (round-4 item 3 follow-on).

Captures a jax.profiler device trace of N production steps at the 300^3
steady state and converts it with xprof's `hlo_stats` tool into a ranked
per-op table: the measured answer to "where do the 420 ms actually go",
at HLO granularity (scatter/gather/fusion/convert slices), rather than the
pass-level splits of scripts/step_ablate.py.

Usage: python scripts/profile_step.py [n_voxel_exp=300] [steps=6] [--f32]
Writes scripts/profile_step.json (top ops by self time + category rollup).
Run on the TPU.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

OUT = os.path.join(REPO, "scripts", "profile_step.json")


def build_trainer(n_voxel_side: int, bf16: bool):
    from rodynrf_tpu.data import make_synthetic_scene
    from rodynrf_tpu.train import Trainer, parse_cmd

    T, H, W = 12, 270, 480
    args = parse_cmd(
        f"--expname profstep --datadir none --dataset_name synthetic "
        f"--n_iters 100000 --batch_size 1024 --N_voxel_t {T} "
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
        f"--bf16 {int(bf16)}"
    )
    scene = make_synthetic_scene(T=T, H=H, W=W)
    return Trainer(args, scene)


def parse_hlo_stats(xspace_paths):
    """xprof hlo_stats -> list of dicts (one per HLO op instance class)."""
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xspace_paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    obj = json.loads(data)
    # gviz table format: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    if isinstance(obj, dict) and "rows" in obj:
        cols = [c.get("label") or c.get("id") for c in obj["cols"]]
        rows = [
            {cols[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])}
            for r in obj["rows"]
        ]
        return rows
    return obj


def main():
    n_voxel_side = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 300
    steps = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 6
    bf16 = "--f32" not in sys.argv
    compact = "--compact" in sys.argv  # profile the --compact_train step
    global OUT
    if compact:
        OUT = os.path.join(REPO, "scripts", "profile_step_compact.json")

    tr = build_trainer(n_voxel_side, bf16)
    if compact:
        from rodynrf_tpu.fields.alpha_mask import load_alpha_npz

        tr.alpha_mask = load_alpha_npz(
            os.path.join(REPO, "golden", "out_quality", "no_poses", "alpha_mask.npz")
        )
        tr._enable_train_compaction()
        assert tr.compact_k, "compaction probe declined"
        print(f"compact K={tr.compact_k}", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        m = tr.run_step()
    float(m["total_loss"])
    print(f"warm {time.perf_counter()-t0:.1f}s", flush=True)

    tracedir = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tracedir)
    for _ in range(steps):
        m = tr.run_step()
    float(m["total_loss"])  # force the chain before stopping the trace
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", paths, flush=True)
    rows = parse_hlo_stats(paths)
    if not rows:
        print("NO HLO STATS — device trace not captured on this attachment")
        return

    def f(row, *names, default=0.0):
        for n in names:
            if n in row and row[n] is not None:
                try:
                    return float(row[n])
                except (TypeError, ValueError):
                    return row[n]
        return default

    # normalize: field names differ across xprof versions
    ops = []
    for r in rows:
        ops.append(
            {
                "name": f(r, "HLO op name", "HLO Op Name", "name", default=""),
                "category": f(r, "HLO op category", "HLO Op Category", "category", default=""),
                "fw_op": str(f(r, "Framework op name", default=""))[:120],
                "occurrences": f(r, "#Occurrences", "occurrences", default=0.0),
                "total_us": f(r, "Total time (us)", "Total Time (us)", default=0.0),
                "self_us": f(r, "Total self time (us)", "Total Self Time (us)", default=0.0),
                "bound_by": f(r, "Bound by", default=""),
                "mem_bw_GiBps": f(r, "Measured memory BW (GiB/s)", default=0.0),
                "dma_stall_pct": f(r, "%time stalled by DMA", default=0.0),
                "expr": str(f(r, "HLO op text", "HLO Op Expression", default=""))[:240],
            }
        )
    if all(o["self_us"] == 0.0 for o in ops):
        # fall back: some versions report only avg self time + occurrences
        for o, r in zip(ops, rows):
            avg = f(r, "Avg. self time (us)", "Avg Self Time (us)", default=0.0)
            o["self_us"] = avg * max(o["occurrences"], 1.0)

    ops.sort(key=lambda o: -o["self_us"])
    total_us = sum(o["self_us"] for o in ops)
    by_cat = {}
    for o in ops:
        c = o["category"] or "unknown"
        by_cat[c] = by_cat.get(c, 0.0) + o["self_us"]

    per_step = total_us / steps / 1e3
    print(f"\ndevice total {total_us/1e3:.1f} ms over {steps} steps = {per_step:.1f} ms/step")
    print("\n-- categories --")
    for c, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/steps/1e3:9.2f} ms/step  {100*us/total_us:5.1f}%  {c}")
    print("\n-- top 35 ops (self time) --")
    for o in ops[:35]:
        print(
            f"{o['self_us']/steps/1e3:9.3f} ms/step  {100*o['self_us']/total_us:5.1f}%  "
            f"x{int(o['occurrences'])}  [{o['category']}] {o['name']} "
            f"bound={o['bound_by']} bw={o['mem_bw_GiBps']:.0f}GiB/s {o['fw_op'][:60]}"
        )

    with open(OUT, "w") as fh:
        json.dump(
            {
                "device": str(jax.devices()[0]),
                "config": {"n_vox": n_voxel_side, "bf16": bf16, "steps": steps,
                           "compact_k": tr.compact_k if compact else 0},
                "device_ms_per_step": round(per_step, 2),
                "categories_ms_per_step": {
                    c: round(us / steps / 1e3, 3)
                    for c, us in sorted(by_cat.items(), key=lambda kv: -kv[1])
                },
                "top_ops": [
                    {
                        "ms_per_step": round(o["self_us"] / steps / 1e3, 3),
                        "pct": round(100 * o["self_us"] / total_us, 2),
                        "n": int(o["occurrences"]),
                        "category": o["category"],
                        "name": o["name"],
                        "bound_by": o["bound_by"],
                        "mem_bw_GiBps": round(o["mem_bw_GiBps"], 1),
                        "dma_stall_pct": round(o["dma_stall_pct"], 1),
                        "fw_op": o["fw_op"],
                        "expr": o["expr"],
                    }
                    for o in ops[:60]
                ],
            },
            fh,
            indent=1,
        )
    print(f"\nwrote {OUT}")


if __name__ == "__main__":
    main()
