#!/usr/bin/env python
"""Step-level fwd/bwd ablation at the 300^3 steady state (value-forced).

Times: (a) loss forward only, (b) loss+grad (no optimizer), (c) full step.
The gap (b)-(a) is the backward; (c)-(b) the optimizer/update.
"""
import os, sys, time
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax, jax.numpy as jnp, numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rodynrf_tpu.data import make_synthetic_scene
from rodynrf_tpu.train import Trainer, parse_cmd
from rodynrf_tpu.train.step import train_loss

T, H, W = 12, 270, 480
n_vox = int(sys.argv[1]) if len(sys.argv) > 1 else 300
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
    f"--optimize_poses 1 --optimize_focal_length 1 --use_disp 1 --bf16 1"
)
scene = make_synthetic_scene(T=T, H=H, W=W)
tr = Trainer(args, scene)
S = tr._statics()
data = tr.data
aabb = tr.aabb


# reconstruct the sc dict the trainer feeds (mirror trainer.run_step)


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

def chain(fn, n):
    @jax.jit
    def f(c0):
        def body(c, _):
            return c + fn(c), None
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return c
    v = float(f(jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(f(jnp.float32(0.0)))
    return time.perf_counter() - t0

def loss_only(c):
    l, m = train_loss(tr.params, S, aabb, data, ray_idx + (c*0).astype(jnp.int32), ray_idx_rand, key, sc)
    return l

def loss_grad(c):
    (l, m), g = jax.value_and_grad(
        lambda p: train_loss(p, S, aabb, data, ray_idx + (c*0).astype(jnp.int32), ray_idx_rand, key, sc),
        has_aux=True,
    )(tr.params)
    leaves = jax.tree_util.tree_leaves(g)
    return l + sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in leaves if hasattr(x, 'ndim') and x.ndim)

for name, fn in (("fwd_only", loss_only), ("fwd_bwd", loss_grad)):
    lo, hi = chain(fn, 2), chain(fn, 6)
    print(name, round((hi - lo) / 4 * 1e3, 1), "ms", flush=True)
