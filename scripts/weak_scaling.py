#!/usr/bin/env python
"""Weak-scaling measurement on the virtual CPU mesh (VERDICT r1 item 7).

Fixed per-device batch; step time at 1 vs N virtual devices. On this box the
N virtual devices share one physical core, so wall-clock cannot speed up —
the point is to quantify the partitioning/collective OVERHEAD the data mesh
adds per step (the ICI all-reduce is simulated through host memory). On a
real pod slice the same program scales rays/s by N.

Usage: python scripts/weak_scaling.py [per_device_batch] [n_devices]
"""

import json
import os
import sys
import time

N_DEV = int(sys.argv[2]) if len(sys.argv) > 2 else 8
PER_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 64

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={N_DEV}"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def measure(n_devices: int, per_device_batch: int, iters=12, warmup=3):
    from rodynrf_tpu.testing import tiny_cmd, tiny_scene
    from rodynrf_tpu.train import Trainer, parse_cmd

    args = parse_cmd(
        tiny_cmd("ndc", 1, batch=per_device_batch * n_devices)
        + f" --n_devices {n_devices}"
    )
    tr = Trainer(args, tiny_scene())
    for _ in range(warmup):
        m = tr.run_step()
    jax.block_until_ready(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        m = tr.run_step()
    jax.block_until_ready(m["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    return {
        "n_devices": n_devices,
        "batch": per_device_batch * n_devices,
        "step_ms": round(dt * 1e3, 2),
        "rays_per_sec": round(per_device_batch * n_devices / dt, 1),
    }


def main():
    rows = [measure(1, PER_DEV), measure(N_DEV, PER_DEV)]
    overhead = rows[1]["step_ms"] / rows[0]["step_ms"]
    out = {
        "per_device_batch": PER_DEV,
        "rows": rows,
        "mesh_step_overhead_x": round(overhead, 2),
        "note": (
            f"{N_DEV} virtual devices share one physical core: ideal weak "
            f"scaling would be {N_DEV}x work in the same step time; the "
            f"measured ratio above is the partitioning overhead bound."
        ),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "scripts", "weak_scaling.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
