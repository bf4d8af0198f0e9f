#!/usr/bin/env python
"""Step-level fwd/bwd/optimizer breakdown at the steady state (value-forced).

Times, per configuration: (a) loss forward only, (b) loss+grad, (c) the full
train step. (b)-(a) = backward; (c)-(b) = optimizer/update. Also ablates
cross-pass forward sharing (--share 0/1 both measured).

Chaining is done at the Python level: each call's scalar output feeds the
next call's (value-irrelevant) input, so fetching the last value forces the
whole chain while every variant compiles exactly ONCE (the old lax.scan
chains compiled 2 programs per variant and took >10 min cold).

Writes scripts/step_ablate.json. Usage: step_ablate.py [n_vox=300] [--f32]
"""
import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rodynrf_tpu.data import make_synthetic_scene
from rodynrf_tpu.train import Trainer, parse_cmd
from rodynrf_tpu.train.step import train_loss

T, H, W = 12, 270, 480
n_vox = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 300
bf16 = 0 if "--f32" in sys.argv else 1
N_CHAIN = int(os.environ.get("ABLATE_CHAIN", "12"))

args = parse_cmd(
    f"--expname abl --datadir none --dataset_name synthetic "
    f"--n_iters 100000 --batch_size 1024 --N_voxel_t {T} "
    f"--N_voxel_init {n_vox**3} --N_voxel_final {n_vox**3} "
    f"--upsamp_list 8000 --upsamp_list 12000 --upsamp_list 16000 --upsamp_list 22000 "
    f"--step_ratio 2.0 --ray_type ndc "
    f"--model_name TensorVMSplit_TimeEmbedding --shadingMode MLP_Fea_late_view "
    f"--shadingModeStatic MLP_Fea "
    f"--n_lamb_sigma 16 --n_lamb_sigma 4 --n_lamb_sigma 4 "
    f"--n_lamb_sh 48 --n_lamb_sh 12 --n_lamb_sh 12 "
    f"--fea2denseAct relu --view_pe 0 --fea_pe 0 "
    f"--TV_weight_density 1.0 --TV_weight_app 1.0 "
    f"--distortion_weight_dynamic 0.01 "
    f"--optimize_poses 1 --optimize_focal_length 1 --use_disp 1 --bf16 {bf16}"
)
scene = make_synthetic_scene(T=T, H=H, W=W)
tr = Trainer(args, scene)
S0 = tr._statics()
data, aabb = tr.data, tr.aabb

sc = {
    "iteration": jnp.asarray(5000, jnp.int32),
    "focal_fixed": jnp.asarray(tr.focal_fixed, jnp.float32),
    "lr_spatial": jnp.asarray(0.02, jnp.float32),
    "lr_network": jnp.asarray(1e-3, jnp.float32),
    "lr_pose": jnp.asarray(3e-3, jnp.float32),
    "lr_focal": jnp.asarray(1e-4, jnp.float32),
}
ray_idx = jnp.asarray(tr.sampler.nextids())
ray_idx_rand = jnp.asarray(tr.sampler2.nextids())
key = jax.random.PRNGKey(1)


def timed_chain(f):
    """f: scalar carry -> scalar. One compile; chain N calls, fetch once."""
    c = f(jnp.float32(0.0))
    float(c)  # compile + execute once (warm)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(N_CHAIN):
        c = f(c)
    float(c)
    return (time.perf_counter() - t0) / N_CHAIN * 1e3  # ms


def variants_for(S):
    ri = lambda c: ray_idx + (c * 0.0).astype(jnp.int32)

    @jax.jit
    def fwd_only(c):
        l, _ = train_loss(tr.params, S, aabb, data, ri(c), ray_idx_rand, key, sc)
        return l

    @jax.jit
    def fwd_bwd(c):
        (l, _), g = jax.value_and_grad(
            lambda p: train_loss(p, S, aabb, data, ri(c), ray_idx_rand, key, sc),
            has_aux=True,
        )(tr.params)
        leaves = jax.tree_util.tree_leaves(g)
        return l + sum(
            jnp.sum(x[..., :1].astype(jnp.float32)) for x in leaves if x.ndim
        )

    return fwd_only, fwd_bwd


JSON_PATH = os.path.join(REPO, "scripts", "step_ablate.json")
out = {}
if os.path.exists(JSON_PATH):
    with open(JSON_PATH) as fh:
        out = json.load(fh)
out["config"] = {
    "n_vox": n_vox, "bf16": bf16, "batch": 1024,
    "n_samples": int(S0.n_samples), "chain": N_CHAIN,
    "device": str(jax.devices()[0]),
}

# each XLA compile takes minutes on this 1-core box — run one variant per
# invocation (ABLATE_VARIANT), merging results into step_ablate.json
variant = os.environ.get("ABLATE_VARIANT", "share")
if variant in ("share", "noshare"):
    S = dataclasses.replace(S0, share_forward=(variant == "share"))
    fwd, fb = variants_for(S)
    t_f = timed_chain(fwd)
    print(variant, "fwd", round(t_f, 1), flush=True)
    t_fb = timed_chain(fb)
    out[variant] = {
        "fwd_ms": round(t_f, 1),
        "fwd_bwd_ms": round(t_fb, 1),
        "bwd_ms": round(t_fb - t_f, 1),
    }
    print(variant, out[variant], flush=True)
elif variant == "compact":
    # fwd/bwd split of the occupancy-compacted step (--compact_train,
    # PERF.md §14) against the committed converged-scene mask
    from rodynrf_tpu.fields.alpha_mask import load_alpha_npz

    tr.alpha_mask = load_alpha_npz(os.path.join(
        REPO, "golden", "out_quality", "no_poses", "alpha_mask.npz"))
    tr._enable_train_compaction()
    assert tr.compact_k, "probe declined to compact"
    data = tr.data  # now carries alpha_volume/alpha_aabb
    S = tr._statics()
    fwd, fb = variants_for(S)
    t_f = timed_chain(fwd)
    print("compact fwd", round(t_f, 1), flush=True)
    t_fb = timed_chain(fb)
    out["compact"] = {
        "K": int(tr.compact_k),
        "fwd_ms": round(t_f, 1),
        "fwd_bwd_ms": round(t_fb, 1),
        "bwd_ms": round(t_fb - t_f, 1),
    }
    print("compact", out["compact"], flush=True)
elif variant == "fullstep":
    # full step (production step_fn incl. optimizer; trainer default flags)
    for _ in range(3):
        m = tr.run_step()
    float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(N_CHAIN):
        m = tr.run_step()
    float(m["total_loss"])
    out["full_step_ms"] = round((time.perf_counter() - t0) / N_CHAIN * 1e3, 1)
    print("full_step", out["full_step_ms"], "ms", flush=True)

with open(JSON_PATH, "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps(out))
