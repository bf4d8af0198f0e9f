"""Measure the ACTUAL reference implementation's training throughput on this
box's CPU — the measured anchor BASELINE.md demands for the perf claim.

Runs the unmodified /root/reference/train.py reconstruction loop (same shim
setup as run_reference.py) on the synthetic fixture with a benchmark config
(reference Nvidia recipe shapes: batch 1024, 128^3 initial grid, ~111
samples/ray) and times iterations via the main optimizer's step calls.
Writes golden/out/ref_bench.json:
    {"iters_per_sec": ..., "rays_per_sec": ..., "batch_size": ...,
     "n_samples": ..., "grid": [...], "device": "cpu", ...}

The companion ours-side CPU number comes from bench.py --cpu; bench.py folds
this file's numbers into its JSON line so BENCH_r{N}.json carries a measured
same-box ratio instead of the round-1 guess.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# reuse every shim/patch from the golden harness (imports reference train.py)
sys.path.insert(0, HERE)
import run_reference as rr  # noqa: E402  (applies patches at import)

import numpy as np  # noqa: E402
import torch  # noqa: E402

TIMES = []


def _install_timer():
    orig_step = torch.optim.Adam.step

    def step(self, *a, **k):
        if len(self.param_groups) > 2:  # the field optimizer: once per iter
            TIMES.append(time.perf_counter())
            if len(TIMES) >= N_ITERS_MEASURE:
                raise SystemExit(0)
        return orig_step(self, *a, **k)

    torch.optim.Adam.step = step


N_ITERS_MEASURE = 12


def main():
    os.makedirs(rr.OUT, exist_ok=True)
    fixture = os.path.join(rr.OUT, "fixture")
    if not os.path.exists(os.path.join(fixture, "images")):
        from fixture import write_reference_fixture

        write_reference_fixture(fixture)

    import opt

    batch = int(os.environ.get("BENCH_BATCH", 1024))
    n_vox = int(os.environ.get("BENCH_NVOXEL", 2097156))  # 128^3, Nvidia.txt
    args = opt.config_parser(
        [
            "--config", os.path.join(HERE, "tiny.txt"),
            "--datadir", fixture,
            "--basedir", os.path.join(rr.OUT, "ref_bench_log"),
            "--expname", "bench",
            "--batch_size", str(batch),
            "--N_voxel_init", str(n_vox),
            "--N_voxel_final", str(27000000),
            "--n_iters", str(N_ITERS_MEASURE + 10),
            "--upsamp_list", "1000000", "--upsamp_list", "1000001",
            "--upsamp_list", "1000002", "--upsamp_list", "1000003",
            "--n_lamb_sigma", "16", "--n_lamb_sigma", "4", "--n_lamb_sigma", "4",
            "--n_lamb_sh", "48", "--n_lamb_sh", "12", "--n_lamb_sh", "12",
            "--featureC", "128",
        ]
    )
    torch.set_default_dtype(torch.float32)
    torch.manual_seed(20211202)
    np.random.seed(20211202)
    torch.set_num_threads(os.cpu_count() or 1)

    _install_timer()
    try:
        rr.ref_train.reconstruction(args)
    except SystemExit:
        pass

    # median inter-iteration gap, skipping the first 2 (warm-up, iter-0 vis)
    gaps = np.diff(np.array(TIMES))[2:]
    it_per_s = 1.0 / float(np.median(gaps))
    # reso/samples the reference computed for this config
    from utils import N_to_reso, cal_n_samples

    aabb = torch.tensor([[-1.5, -1.67, -1.0], [1.5, 1.67, 1.0]])
    reso = N_to_reso(n_vox, aabb)
    n_samples = int(cal_n_samples(reso, 2.0))
    out = {
        "impl": "reference (facebookresearch/robust-dynrf, torch eager)",
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "iters_per_sec": round(it_per_s, 4),
        "rays_per_sec": round(it_per_s * batch, 2),
        "batch_size": batch,
        "n_samples": n_samples,
        "grid": reso,
        "n_timed_iters": len(gaps),
    }
    path = os.path.join(rr.OUT, "ref_bench.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
