"""Single-step GRADIENT parity: compare every parameter gradient of the
reference's first training iteration against jax.grad of our train_loss at
the identical state/batch.

This catches classes of bugs trajectory comparison can miss early (wrong
stop_gradient topology, a loss term with matching value but wrong gradient).

Run `GOLDEN_GRAD_CHECK=1 python golden/run_reference.py` first (writes
golden/out/grads_ref.npz), then this script.
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from run_ours import inject_reference_init  # noqa: E402

from rodynrf_tpu.data.video_dataset import load_nvidia_scene
from rodynrf_tpu.train.checkpoints import dynamic_state_dict, static_state_dict
from rodynrf_tpu.train.config import config_parser
from rodynrf_tpu.train.step import train_loss
from rodynrf_tpu.train.trainer import Trainer


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "tiny.txt")
    args = config_parser(
        ["--config", cfg, "--datadir", os.path.join(HERE, "out", "fixture")]
    )
    args.golden_det = 1

    rec = np.load(os.path.join(HERE, "out", "ref_record.npz"))
    scene = load_nvidia_scene(
        args.datadir, downsample=args.downsample_train, use_disp=True,
        use_foreground_mask=args.use_foreground_mask, with_gt_poses=True,
        ray_type=args.ray_type,
    )
    trainer = Trainer(args, scene)
    inject_reference_init(trainer)

    S = trainer._statics()
    sc = {
        "iteration": jnp.asarray(0, jnp.int32),
        "focal_fixed": jnp.asarray(trainer.focal_fixed, jnp.float32),
    }
    grad_fn = jax.grad(
        lambda p: train_loss(
            p, S, trainer.aabb, trainer.data,
            jnp.asarray(rec["ray_idx"][0]), jnp.asarray(rec["ray_idx_rand"][0]),
            jax.random.PRNGKey(0), sc,
        )[0]
    )
    grads = grad_fn(trainer.params)

    ours = {}
    for k, v in static_state_dict(grads["static"], trainer.static_cfg).items():
        ours[f"static/{k}"] = v
    for k, v in dynamic_state_dict(grads["dynamic"], trainer.dynamic_cfg).items():
        ours[f"dynamic/{k}"] = v
    ours["pose"] = np.asarray(grads["pose"])
    ours["fov"] = np.asarray(grads["fov"])

    ref = np.load(os.path.join(HERE, "out", "grads_ref.npz"))
    print(f"{'param':55s} {'|ref|':>10s} {'max abs diff':>12s} {'rel':>9s}")
    worst = 0.0
    missing = []
    for name in sorted(ref.files):
        r = ref[name]
        if name not in ours:
            missing.append(name)
            continue
        o = ours[name]
        assert r.shape == o.shape, f"{name}: {r.shape} vs {o.shape}"
        scale = np.abs(r).max() + 1e-12
        diff = np.abs(r - o).max()
        rel = diff / scale
        worst = max(worst, rel)
        flag = "  <-- MISMATCH" if rel > 1e-3 else ""
        print(f"{name:55s} {np.abs(r).max():10.3e} {diff:12.3e} {rel:9.2e}{flag}")
    if missing:
        print("missing on our side:", missing)
    print(f"\nworst relative gradient error: {worst:.2e}")
    import json

    with open(os.path.join(HERE, "out", "grad_summary.json"), "w") as fh:
        json.dump(
            {"n_tensors": len(ref.files), "worst_rel_err": float(worst), "missing": missing},
            fh,
        )
    return worst


if __name__ == "__main__":
    main()
